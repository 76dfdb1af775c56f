"""Per-stage timing + profiler tracing (SURVEY.md §5 tracing subsystem)."""

import pytest
import jax.numpy as jnp
import numpy as np

from streamvoiceanon_tpu.utils.profiling import StageTimers, trace


def test_stage_timers_accumulate_and_report():
    t = StageTimers()
    for _ in range(5):
        with t.stage("host"):
            pass
        t.timed("matmul", lambda x: x @ x, jnp.ones((32, 32)))
    s = t.summary()
    assert s["matmul"]["n"] == 5 and s["host"]["n"] == 5
    assert s["matmul"]["p50_ms"] >= 0
    rep = t.report()
    assert "matmul" in rep and "p95" in rep
    # 5 calls each "processing" 2 s of audio
    aps = t.audio_seconds_per_second("matmul", 2.0)
    assert aps > 0


@pytest.mark.slow
def test_trace_noop_and_real(tmp_path):
    with trace(None):
        pass
    with trace(str(tmp_path / "prof")):
        x = jnp.arange(128.0)
        np.asarray(x * 2)
    # profiler wrote something
    assert any((tmp_path / "prof").rglob("*"))
