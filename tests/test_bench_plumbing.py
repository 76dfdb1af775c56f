"""bench.py robustness plumbing (VERDICT r2 next #1/#8): the outage-proof
backend acquisition, the explicit skip marker, the latency-budgeted headline
fields, and the roofline model.

Round-2 postmortem: BENCH_r02.json was rc=1/parsed=null because the first
jax backend touch HUNG during a relay outage — even jax.devices("cpu")
blocks, since backend discovery initializes every platform.  bench.py now
probes in subprocesses (timeout-able) and preps in a JAX_PLATFORMS=cpu
child; these tests pin that behavior without needing a TPU or an outage.
"""

import json
import os
import subprocess
import sys
import time

import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def test_import_does_not_arm_alarm():
    """Importing bench (benchmarks/, tests) must never schedule the deadline
    SIGALRM — it would kill a long-lived host process mid-run."""
    import signal

    remaining = signal.alarm(0)  # read + clear
    assert remaining == 0, "bench import armed a SIGALRM"


def test_update_best_realtime_fields():
    """`value` = the realtime-viable RTF (lowest period whose delivery
    latency fits the 46.44 ms frame budget — VERDICT r3 next #7);
    throughput_* carries the unconstrained best period separately."""
    bench._best = None
    results = {
        1: (0.030, 0.030),   # RTF 0.65 at 30 ms  -> realtime-viable
        8: (0.010, 0.100),   # RTF 0.22 at 100 ms -> fast but late
    }
    scan = {16: (0.006, 0.80)}  # RTF 0.13 at 800 ms group latency
    pipe = {"period_s": 0.004, "p50_latency_s": 0.033}  # live AND fast
    bench.update_best(results, scan)
    b = bench._best
    assert b["metric"] == "streaming_rtf_chunk1"
    # headline is the realtime-viable point (M=1 here), NOT group throughput
    assert b["value"] == round(0.030 / bench.FRAME_SECONDS, 4)
    assert b["throughput_rtf"] == round(0.006 / bench.FRAME_SECONDS, 4)
    assert "scan-dispatch group G=16" in b["throughput_mode"]
    assert b["realtime_rtf"] == round(0.030 / bench.FRAME_SECONDS, 4)
    assert b["realtime_latency_ms"] == 30.0
    assert "M=1" in b["realtime_mode"]
    # the pipelined engine is both the fastest AND latency-fit -> takes both
    bench.update_best(results, scan, pipe)
    b = bench._best
    assert b["value"] == round(0.004 / bench.FRAME_SECONDS, 4)
    assert "RealtimeEngine" in b["realtime_mode"]
    assert b["throughput_rtf"] == round(0.004 / bench.FRAME_SECONDS, 4)
    bench._best = None


def test_add_section_survives_update_best():
    bench._best = None
    bench._extras.clear()
    bench.add_section("device_floor", {"ms_per_chunk": 1.8})
    bench.update_best({1: (0.030, 0.030)})
    assert bench._best["device_floor"] == {"ms_per_chunk": 1.8}
    bench.add_section("refill", {"n_refills": 3})
    assert bench._best["refill"] == {"n_refills": 3}
    bench._best = None
    bench._extras.clear()


def test_update_best_no_realtime_mode():
    bench._best = None
    bench.update_best({8: (0.010, 0.100)})
    b = bench._best
    assert b["realtime_rtf"] is None
    assert b["realtime_mode"].startswith("none")
    bench._best = None


def test_probe_gives_up_within_budget(monkeypatch):
    """With no usable accelerator (probe children see JAX_PLATFORMS=cpu from
    the test env), probe_tpu must poll and return False once the budget
    drops to the reserve — not hang, not raise."""
    monkeypatch.setattr(bench, "T_START", time.time())
    monkeypatch.setattr(bench, "DEADLINE_S", 45.0)
    monkeypatch.setattr(bench, "RESERVE_S", 10.0)
    t0 = time.time()
    ok = bench.probe_tpu(probe_timeout=30.0, sleep_s=2.0)
    assert ok is False
    assert time.time() - t0 < 60.0


def test_probe_budget_already_spent(monkeypatch):
    monkeypatch.setattr(bench, "T_START", time.time() - 1000.0)
    monkeypatch.setattr(bench, "DEADLINE_S", 100.0)
    t0 = time.time()
    assert bench.probe_tpu() is False
    assert time.time() - t0 < 2.0


@pytest.mark.slow
def test_skip_marker_emitted_when_backend_unavailable():
    """End to end: bench.py run with no accelerator must exit rc=0 and print
    ONE parseable JSON line with an explicit skipped marker (VERDICT r2
    next #1) — never an empty artifact."""
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               BENCH_DEADLINE_S="70", BENCH_RESERVE_S="45")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=180)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, r.stdout
    parsed = json.loads(lines[0])
    assert parsed["metric"] == "streaming_rtf_chunk1"
    assert parsed["value"] is None
    assert "skipped" in parsed
    assert "unavailable" in parsed["skipped"]


# ---------------------------------------------------------------------------
# roofline model
# ---------------------------------------------------------------------------


def _tiny_trees():
    from streamvoiceanon_tpu.utils import randparams as rp
    from streamvoiceanon_tpu.utils.tiny import tiny_config

    cfg = tiny_config()
    tok = rp.tokenizer_params_np(cfg.tokenizer, 1, dtype=jnp.bfloat16)
    voc = rp.vocoder_params_np(cfg.vocoder, 2, dtype=jnp.bfloat16)
    arvc = rp.arvc_params_np(cfg.arvc, 3, jnp.bfloat16)
    return cfg, tok, arvc, voc


def test_roofline_bytes_exact_and_stages_positive():
    from streamvoiceanon_tpu.utils.roofline import (
        chunk_roofline, device_peaks, tree_bytes,
    )

    cfg, tok, arvc, voc = _tiny_trees()

    class Dev:
        device_kind = "TPU v5e"

    rf = chunk_roofline(cfg, tok, arvc, voc, compute_s=1e-3,
                        peaks=device_peaks(Dev()))
    assert set(rf["stages"]) == {"encode", "lm_slow", "lm_fast", "vocode"}
    for s in rf["stages"].values():
        assert s["flops"] > 0 and s["hbm_bytes"] > 0
    # weight-byte exactness: lm_slow = slow stack + final norm + output head
    m = arvc["model"]
    want = tree_bytes({k: m[k] for k in ("layers", "norm", "output")})
    assert rf["stages"]["lm_slow"]["hbm_bytes"] == want
    # batch-1 streaming is bandwidth-bound on every TPU generation
    assert rf["bound"] == "hbm-bandwidth"
    assert rf["pct_peak_bw"] > 0 and rf["mfu_pct"] >= 0
    assert rf["bw_floor_ms"] > 0


def test_roofline_fast_loop_xla_vs_pallas_reads():
    """XLA codebook scan re-streams the fast weights 8x; the VMEM-resident
    Pallas decoder streams them once — the model must reflect the flag."""
    from streamvoiceanon_tpu.config import replace
    from streamvoiceanon_tpu.utils.roofline import fast_stage

    cfg, tok, arvc, voc = _tiny_trees()
    base = fast_stage(cfg, arvc)["weight_bytes"]
    cfg_pl = replace(cfg, arvc=replace(cfg.arvc, decoder=replace(
        cfg.arvc.decoder, use_pallas_fast_decode=True)))
    pl = fast_stage(cfg_pl, arvc)["weight_bytes"]
    assert base == cfg.arvc.decoder.num_codebooks * pl


def test_roofline_state_traffic_counts_kv():
    from streamvoiceanon_tpu.models import dual_ar
    from streamvoiceanon_tpu.utils.roofline import slow_stage, tree_bytes

    cfg, tok, arvc, voc = _tiny_trees()
    st = dual_ar.init_state(cfg.arvc.decoder, cache_dtype=jnp.bfloat16)
    got = slow_stage(cfg, arvc, st)
    assert got["state_bytes"] == tree_bytes(st.k_cache) + tree_bytes(st.v_cache)


def test_device_peaks_table():
    from streamvoiceanon_tpu.utils.roofline import device_peaks

    class D:
        def __init__(self, kind):
            self.device_kind = kind

    v5e = device_peaks(D("TPU v5e"))
    assert v5e and v5e["hbm_bytes_s"] == 819e9
    v5p = device_peaks(D("TPU v5p"))
    assert v5p and v5p["hbm_bytes_s"] == 2765e9
    assert device_peaks(D("weird accelerator")) is None
