"""Offline conversion throughput benchmark: audio-seconds/s/chip.

Runs batched offline conversion (parallel/serving.BatchServer) at full model
size with random weights and reports audio-seconds processed per wall second
— the scaling metric of BASELINE.md.  Run on N devices to measure scaling
efficiency (on CPU: XLA_FLAGS=--xla_force_host_platform_device_count=N).
"""

import argparse
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=None,
                    help="single batch size (legacy; prefer --batches)")
    ap.add_argument("--batches", default="8,32,64,128",
                    help="comma-separated batch sizes swept in ONE process "
                         "(one clean window, shared compile cache)")
    ap.add_argument("--frames", type=int, default=64, help="frames per utterance")
    ap.add_argument("--n-model", type=int, default=1)
    ap.add_argument("--cache-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="decode KV-cache precision (bf16 = the live "
                         "serving precision, accuracy-gated)")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    from bench import build_converter
    from streamvoiceanon_tpu.config import SamplingConfig
    from streamvoiceanon_tpu.parallel.serving import BatchServer

    print(f"devices: {jax.devices()}", file=sys.stderr)
    cv = build_converter(jax.random.PRNGKey(0))
    server = BatchServer(cv, n_model=args.n_model)

    rng = np.random.default_rng(0)
    spf = cv.cfg.samples_per_frame
    T = args.frames
    n_dev = len(jax.devices())
    ref_wav = (rng.standard_normal((1, 32 * spf)) * 0.1).astype(np.float32)
    ref_tokens1 = np.asarray(cv.content_tokens(jnp.asarray(ref_wav)))
    ref_codes1 = np.asarray(cv.audio_codes(jnp.asarray(ref_wav)))
    sampling = SamplingConfig()

    batches = ([args.batch] if args.batch is not None
               else [int(b) for b in args.batches.split(",")])
    rows = []
    for B in batches:
        src = (rng.standard_normal((B, T * spf)) * 0.1).astype(np.float32)
        ref_tokens = ref_tokens1.repeat(B, 0)
        ref_codes = ref_codes1.repeat(B, 0)
        style = rng.standard_normal((B, 192)).astype(np.float32)
        timbre = rng.standard_normal((B, 32, 128)).astype(np.float32)

        kw = dict(sampling=sampling, delay=2,
                  cache_dtype=jnp.dtype(args.cache_dtype))
        # warm-up/compile
        t0 = time.time()
        server.convert(src, ref_tokens, ref_codes, style, timbre, **kw)
        print(f"B={B}: compile+first batch: {time.time()-t0:.1f}s",
              file=sys.stderr)

        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            server.convert(src, ref_tokens, ref_codes, style, timbre, **kw)
            times.append(time.perf_counter() - t0)
        p50 = float(np.median(times))
        audio_s = B * T * spf / 44100.0
        thr = audio_s / p50
        row = {"batch": B, "frames": T, "cache_dtype": args.cache_dtype,
               "p50_s": round(p50, 3),
               "spread_s": [round(min(times), 3), round(max(times), 3)],
               "n": args.iters,
               "audio_s_per_s": round(thr, 1),
               "per_chip": round(thr / n_dev, 1)}
        rows.append(row)
        print(
            f"batch={B} frames={T} p50={p50:.2f}s "
            f"[{min(times):.2f},{max(times):.2f}]  "
            f"throughput={thr:.2f} audio-s/s  per-chip={thr/n_dev:.2f}",
            file=sys.stderr,
        )
    print(json.dumps({"rows": rows, "n_devices": n_dev}))


if __name__ == "__main__":
    main()
