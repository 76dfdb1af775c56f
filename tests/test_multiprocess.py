"""True multi-process (2 "hosts") jax.distributed training-step test.

SURVEY.md §4.5 notes the reference has NO multi-node testing; here the
multi-host path — jax.distributed bring-up, global mesh across processes,
per-host input sharding, gloo cross-host collectives in the sharded train
step — runs as two real OS processes on CPU."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_train_step():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, out

    losses = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("LOSS"):
                _, pid, val = line.split()
                losses[pid] = val
        assert "OK" in out, out
    assert len(losses) == 2
    # global-mean loss must be bit-identical across hosts
    assert losses["0"] == losses["1"], losses
