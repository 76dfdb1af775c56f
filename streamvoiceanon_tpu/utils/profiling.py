"""Per-stage timing + profiler tracing.

The reference instruments its runtime with ad-hoc CUDA-event timers around
the encoder / AR / vocoder stages (evaluations/infer_arvc.py:498-596) and
wall-clock in the GUI callback (real-time-gui.py:1326-1359), printing each
measurement.  The TPU-native equivalent here: a `StageTimers` accumulator
(device work is fenced with `jax.block_until_ready`, percentiles reported
instead of prints) and a `trace()` context manager over `jax.profiler` for
full XLA timelines viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import numpy as np

import jax


class StageTimers:
    """Accumulates wall-time samples per stage name.

    `stage()` is a plain host-side timer (async jitted work only counts its
    dispatch); use `timed()` for device stages — it blocks on the outputs so
    the sample includes device execution::

        timers = StageTimers()
        with timers.stage("host_refill"):
            schedule_refill(...)
        tokens = timers.timed("encode", encode_fn, wav_chunk)
    """

    def __init__(self):
        self.samples: Dict[str, list] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[name].append(time.perf_counter() - t0)

    def timed(self, name: str, fn, *args, **kwargs):
        """Runs `fn`, blocks on its outputs (device fence), records the
        wall time, returns the outputs."""
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        out = jax.block_until_ready(out)
        self.samples[name].append(time.perf_counter() - t0)
        return out

    def summary(self) -> Dict[str, Dict[str, float]]:
        """{stage: {n, p50_ms, p95_ms, mean_ms, total_s}}."""
        out = {}
        for name, xs in self.samples.items():
            a = np.asarray(xs)
            out[name] = {
                "n": len(a),
                "p50_ms": float(np.median(a) * 1e3),
                "p95_ms": float(np.percentile(a, 95) * 1e3),
                "mean_ms": float(a.mean() * 1e3),
                "total_s": float(a.sum()),
            }
        return out

    def report(self) -> str:
        lines = []
        for name, s in sorted(self.summary().items()):
            lines.append(
                f"{name:24s} n={s['n']:5d} p50={s['p50_ms']:8.2f}ms "
                f"p95={s['p95_ms']:8.2f}ms total={s['total_s']:7.2f}s"
            )
        return "\n".join(lines)

    def audio_seconds_per_second(self, stage: str, seconds_per_call: float) -> float:
        """Throughput metric (SURVEY.md §5: report audio-seconds/s)."""
        s = self.summary().get(stage)
        if not s or s["total_s"] == 0:
            return 0.0
        return s["n"] * seconds_per_call / s["total_s"]


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace (XLA timeline) when `log_dir` is set; no-op
    otherwise.  View with TensorBoard's profile plugin or Perfetto."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
