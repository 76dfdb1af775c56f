"""Concurrent-stream serving benchmark: N live streams in one batched
session (BASELINE config 5 single-chip slice).  Reports streams sustainable
in real time and audio-seconds/s.

Two modes: the default grouped-fetch loop (one device-concat fetch per
--group chunks), and --engine, which drives the pipelined MultiStreamEngine
(per-stream SPSC rings, dispatch thread + ordered adaptive batched fetcher
pool — the architecture bench.py's `multistream` phase measures)."""

import argparse
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

FRAME_SECONDS = 2048 / 44100


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--chunks", type=int, default=64)
    ap.add_argument("--engine", action="store_true",
                    help="drive the pipelined MultiStreamEngine instead of "
                         "the grouped-fetch loop")
    ap.add_argument("--tpu-opt", action="store_true",
                    help="use config.tpu_optimized flat state layouts: the "
                         "batched tokenizer runs the circular absolute-rope "
                         "ring step (no per-token full-ring rewrite, which "
                         "scales with batch); the B=1-only kernels fall back "
                         "to XLA on the same layouts")
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    from bench import build_converter
    from streamvoiceanon_tpu.config import SamplingConfig, tpu_optimized
    from streamvoiceanon_tpu.runtime.streaming import StreamSession

    print(f"devices: {jax.devices()}", file=sys.stderr)
    cv = build_converter(jax.random.PRNGKey(0))
    if args.tpu_opt:
        from dataclasses import replace as _drep
        cv = _drep(cv, cfg=tpu_optimized(cv.cfg))
    B = args.streams
    rng = np.random.default_rng(0)
    spf = cv.cfg.samples_per_frame
    ref = (rng.standard_normal((1, 48 * spf)) * 0.1).astype(np.float32)
    ref_tokens = jnp.repeat(cv.content_tokens(jnp.asarray(ref)), B, 0)
    ref_codes = jnp.repeat(cv.audio_codes(jnp.asarray(ref)), B, 0)
    style = jnp.asarray(rng.standard_normal((B, 192)).astype(np.float32), jnp.bfloat16)
    timbre = jnp.asarray(rng.standard_normal((B, 32, 128)).astype(np.float32), jnp.bfloat16)

    sess = StreamSession(
        cv, cv.cfg.stream, key=jax.random.PRNGKey(1), sampling=SamplingConfig(),
        style=style, timbre=timbre, ref_tokens=ref_tokens, ref_codes=ref_codes,
        batch=B,
    )
    src = (rng.standard_normal((B, 80 * spf)) * 0.1).astype(np.float32)
    t0 = time.time()
    for i in range(cv.cfg.stream.delay + 2):
        sess.process_chunk(src[:, i * spf : (i + 1) * spf])
    print(f"warm-up: {time.time()-t0:.1f}s", file=sys.stderr)

    if args.engine:
        from streamvoiceanon_tpu.runtime.realtime import MultiStreamEngine

        eng = MultiStreamEngine(sess, ring_seconds=8.0)
        eng.warm_up()
        eng.start()
        n = args.chunks
        t0 = time.perf_counter()
        try:
            for i in range(n):
                j = (i + 5) % 78
                for s in range(B):
                    eng.push_input(s, src[s, j * spf : (j + 1) * spf])
            deadline = time.perf_counter() + max(30.0, n * 0.2)
            while (eng.ticks_processed < n
                   and time.perf_counter() < deadline):
                time.sleep(0.002)
        finally:
            wall = time.perf_counter() - t0
            eng.stop()
        done = eng.ticks_processed
        period = wall / max(done, 1)
        audio_per_s = B * FRAME_SECONDS / period
        print(
            f"streams={B} (engine): {done}/{n} ticks, chunk "
            f"period={period*1e3:.2f}ms -> "
            f"{'REALTIME OK' if period < FRAME_SECONDS else 'NOT realtime'}, "
            f"{audio_per_s:.1f} audio-s/s, "
            f"max_fetch_batch={eng.max_fetch_batch}, missed={sum(eng.missed)}"
        )
        return

    cat = jax.jit(lambda xs: jnp.concatenate(xs, axis=-1))
    group = []
    t0 = time.perf_counter()
    n = args.chunks
    for i in range(n):
        j = (i + 5) % 78
        wav = sess.process_chunk_async(src[:, j * spf : (j + 1) * spf])
        group.append(wav)
        if len(group) == args.group:
            np.asarray(cat(group))
            group = []
    if group:
        np.asarray(cat(group))
    wall = time.perf_counter() - t0
    period = wall / n
    audio_per_s = B * FRAME_SECONDS / period
    print(
        f"streams={B}: chunk period={period*1e3:.2f}ms "
        f"(real-time needs <{FRAME_SECONDS*1e3:.1f}ms) -> "
        f"{'REALTIME OK' if period < FRAME_SECONDS else 'NOT realtime'}, "
        f"{audio_per_s:.1f} audio-s/s"
    )


if __name__ == "__main__":
    main()
