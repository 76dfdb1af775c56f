"""Worker for the true multi-process jax.distributed tests.

Run as: python tests/mp_worker.py <port> <process_id> <num_processes>
            [mode=train|serve] [out_npy]

train: each process owns 2 virtual CPU devices; together they form one
global mesh (data x model), exercising initialize_multihost,
global_batch_from_local (the split_dataset_by_node device-side counterpart)
and a cross-host sharded train step with gloo collectives — the multi-host
path SURVEY.md §2.4/§4 calls for, testable without TPU pods.

serve: the same global mesh runs a sharded BatchServer conversion
(tokenize -> generate -> vocode, dp x tp) — SURVEY §7 step 8's 2-host
serving scale-out.  The mesh is ALWAYS 4 devices (data 2 x model 2) split
across however many processes, so a 1-process run computes the same program
as a 2-process run; pid 0 dumps the allgathered output wav to <out_npy> for
cross-run equality checks, and every pid logs an audio-seconds/s throughput
proxy."""

import os
import sys
import time

port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
mode = sys.argv[4] if len(sys.argv) > 4 else "train"
out_npy = sys.argv[5] if len(sys.argv) > 5 else None

N_DEV_TOTAL = 4 if mode in ("serve", "stream") else 2 * nproc
ndev_local = N_DEV_TOTAL // nproc
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={ndev_local}"
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # tinymodels

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import jax.numpy as jnp
import numpy as np

from streamvoiceanon_tpu.config import ARVCConfig, DualARConfig
from streamvoiceanon_tpu.models import dual_ar
from streamvoiceanon_tpu.parallel import mesh as meshlib
from streamvoiceanon_tpu.train import step as trainstep


def main_train():
    meshlib.initialize_multihost(f"127.0.0.1:{port}", nproc, pid)
    assert len(jax.devices()) == 2 * nproc
    n_model = 2
    m = meshlib.make_mesh(n_data=len(jax.devices()) // n_model, n_model=n_model)

    dcfg = DualARConfig(
        vocab_size=128, n_layer=2, n_head=4, dim=64, intermediate_size=128,
        head_dim=16, max_seq_len=256, codebook_size=40, num_codebooks=8,
        n_fast_layer=1, fast_dim=64, fast_n_head=4, fast_head_dim=16,
        fast_intermediate_size=128,
    )
    cfg = ARVCConfig(decoder=dcfg, model_dim=64)
    key = jax.random.PRNGKey(0)  # same seed on every host -> identical params
    raw = {
        "embedding": jax.random.normal(key, (dcfg.vocab_size, dcfg.dim)) * 0.02,
        "context_in": {"w": jnp.zeros((cfg.context_dim, dcfg.dim)),
                       "b": jnp.zeros((dcfg.dim,))},
        "style_in": {"w": jnp.zeros((cfg.style_dim, dcfg.dim)),
                     "b": jnp.zeros((dcfg.dim,))},
        "model": dual_ar.prepare_params(dual_ar.random_params(key, dcfg)),
        "wait4start": jnp.zeros((8, dcfg.dim)),
        "wait4end": jnp.zeros((8, dcfg.dim)),
    }
    specs = jax.tree.map(lambda _: meshlib.P(), raw)
    specs["model"] = meshlib.dual_ar_param_specs(raw["model"])
    params = meshlib.shard_params(raw, m, specs)

    optimizer = trainstep.make_optimizer()
    state = trainstep.TrainState(params, optimizer.init(params), jnp.int32(0))

    # per-host local batch -> globally sharded (different data per host)
    T = 8
    B_local = m.shape["data"] // nproc  # data rows owned by this host
    rng = np.random.default_rng(100 + pid)
    local = {
        "content": rng.integers(1, 100, (B_local, T)).astype(np.int32),
        "base_target": rng.integers(1, 100, (B_local, T)).astype(np.int32),
        "target": rng.integers(0, 40, (B_local, dcfg.num_codebooks, T)).astype(np.int32),
        "x_lens": np.full((B_local,), T, np.int32),
        "style": rng.standard_normal((B_local, cfg.style_dim)).astype(np.float32),
        "timbre": rng.standard_normal((B_local, 32, cfg.context_dim)).astype(np.float32),
    }
    batch = meshlib.global_batch_from_local(local, m)

    with m:
        new_state, aux = trainstep.train_step(state, batch, cfg, optimizer, 2)
    jax.block_until_ready(new_state.params)
    loss = float(aux["loss"])
    assert np.isfinite(loss), loss
    # the loss is a global (cross-host) mean: all hosts must agree exactly
    print(f"LOSS {pid} {loss:.9f}", flush=True)
    print(f"OK {pid}", flush=True)


def main_serve():
    import tinymodels

    from streamvoiceanon_tpu.config import SamplingConfig
    from streamvoiceanon_tpu.parallel.serving import BatchServer

    meshlib.initialize_multihost(f"127.0.0.1:{port}", nproc, pid)
    assert len(jax.devices()) == N_DEV_TOTAL
    m = meshlib.make_mesh(n_data=2, n_model=2)

    cv = tinymodels.tiny_converter()  # same seed on every host
    SPF = 2048
    B, Ls, Tr = 4, 6, 4
    # the full GLOBAL batch is deterministic, so every host can build it and
    # upload only its addressable shards (stream-split counterpart)
    rng = np.random.default_rng(42)
    src = (rng.standard_normal((B, Ls * SPF)) * 0.1).astype(np.float32)
    ref = (rng.standard_normal(Tr * SPF) * 0.1).astype(np.float32)
    style = rng.standard_normal((B, 192)).astype(np.float32)
    timbre = rng.standard_normal((B, 32, 128)).astype(np.float32)
    ref_tokens = np.asarray(cv.content_tokens(jnp.asarray(ref)[None]))
    ref_codes = np.asarray(cv.audio_codes(jnp.asarray(ref)[None]))
    ref_tokens = np.repeat(ref_tokens, B, axis=0)
    ref_codes = np.repeat(ref_codes, B, axis=0)

    server = BatchServer(cv, mesh=m)
    kw = dict(sampling=SamplingConfig(greedy=True), delay=2,
              key=jax.random.PRNGKey(7))
    wav = server.convert(src, ref_tokens, ref_codes, style, timbre, **kw)
    assert wav.shape[0] == B, wav.shape

    # throughput proxy: audio-seconds/s per process over 3 timed calls
    t0 = time.perf_counter()
    n_timed = 3
    for _ in range(n_timed):
        wav = server.convert(src, ref_tokens, ref_codes, style, timbre, **kw)
    dt = (time.perf_counter() - t0) / n_timed
    audio_s = B * wav.shape[-1] / 44100.0
    print(f"THROUGHPUT {pid} {audio_s/dt:.3f} audio_s/s "
          f"({nproc} proc x {ndev_local} dev)", flush=True)

    if pid == 0 and out_npy:
        np.save(out_npy, wav)
    print(f"OK {pid}", flush=True)


def main_stream():
    """Cross-host STREAMING serving (SURVEY §7 step 8: per-stream state
    residency + chunk routing): S live StreamSessions are partitioned by a
    deterministic owner() route over the jax.distributed processes; each
    session's state lives on a device of the owning process and its chunks
    are only ever processed there.  Outputs are written per stream so the
    test can assert 2-process == 1-process, and a global-mesh psum verifies
    the cross-host collectives stay live alongside the host-local streams."""
    import tinymodels

    from streamvoiceanon_tpu.config import SamplingConfig, StreamConfig
    from streamvoiceanon_tpu.runtime.streaming import StreamSession

    meshlib.initialize_multihost(f"127.0.0.1:{port}", nproc, pid)
    assert len(jax.devices()) == N_DEV_TOTAL

    S, Ls, Tr = 4, 8, 4
    SPF = 2048

    def owner(sid: int) -> int:
        """Chunk router: which process holds stream sid's session state."""
        return sid * nproc // S

    cv = tinymodels.tiny_converter()  # same seed on every host
    scfg = StreamConfig(max_prompt_frames=8, max_seq_frames=10_000,
                        buffer_frames=4, decode_chunk_frames=1, delay=2)

    def stream_inputs(sid):
        rng = np.random.default_rng(1000 + sid)
        ref = (rng.standard_normal(Tr * SPF) * 0.1).astype(np.float32)
        src = (rng.standard_normal(Ls * SPF) * 0.1).astype(np.float32)
        style = rng.standard_normal((1, 192)).astype(np.float32)
        timbre = rng.standard_normal((1, 32, 128)).astype(np.float32)
        return ref, src, style, timbre

    mine = [sid for sid in range(S) if owner(sid) == pid]
    local_devs = jax.local_devices()
    sessions, srcs = {}, {}
    for i, sid in enumerate(mine):
        dev = local_devs[i % len(local_devs)]
        ref, src, style, timbre = stream_inputs(sid)
        with jax.default_device(dev):
            sessions[sid] = StreamSession(
                cv, scfg, key=jax.random.PRNGKey(sid),
                sampling=SamplingConfig(greedy=True),
                style=jnp.asarray(style), timbre=jnp.asarray(timbre),
                ref_tokens=cv.content_tokens(jnp.asarray(ref)[None]),
                ref_codes=cv.audio_codes(jnp.asarray(ref)[None]),
            )
        srcs[sid] = src

    # route chunks: time-major loop, each chunk delivered to the owner only
    outs = {sid: [] for sid in mine}
    t0 = time.perf_counter()
    for t in range(Ls):
        for sid in mine:
            outs[sid].append(
                sessions[sid].process_chunk(srcs[sid][t * SPF : (t + 1) * SPF])
            )
    dt = time.perf_counter() - t0
    audio_s = len(mine) * Ls * SPF / 44100.0
    print(f"THROUGHPUT {pid} {audio_s/dt:.3f} audio_s/s "
          f"({len(mine)} streams on {nproc} proc x {ndev_local} dev)",
          flush=True)

    for sid in mine:
        np.save(f"{out_npy}.s{sid}.npy", np.concatenate(outs[sid]))

    # cross-host collective alongside the host-local streams: psum of
    # per-process decoded-chunk counts over a global mesh must see them all
    from functools import partial

    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh

    gm = Mesh(np.asarray(jax.devices()), ("d",))
    counts = meshlib.global_batch_from_local(
        {"n": np.full((ndev_local,), len(mine) * Ls / ndev_local, np.float32)},
        Mesh(np.asarray(jax.devices()).reshape(-1, 1), ("data", "model")),
    )["n"]

    @partial(shard_map, mesh=gm, in_specs=meshlib.P("d"), out_specs=meshlib.P())
    def total(x):
        return jax.lax.psum(jnp.sum(x), "d")[None]

    tot = float(total(counts)[0])
    assert tot == S * Ls, (tot, S * Ls)
    print(f"OK {pid}", flush=True)


if __name__ == "__main__":
    if mode == "serve":
        main_serve()
    elif mode == "stream":
        main_stream()
    else:
        main_train()
