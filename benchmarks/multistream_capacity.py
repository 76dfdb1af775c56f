"""Device-capacity scan for batched multi-stream serving, standalone.

Replicates bench.py phase 5m's capacity methodology for arbitrary batch
sizes: ONE StreamSession at the msf=128 serving geometry with the LM KV
cache right-sized (with_cache_rows), fanned out to B streams
(StreamSession.fanout), then K per-chunk ticks chained in a single
lax.scan dispatch with a null dispatch+fetch subtracted — the
audio-s/s/chip a local-PJRT deployment of batch B sustains, net of the
sandbox relay transport.

Usage: python benchmarks/multistream_capacity.py [--streams 8,16,32,64]
       [--ticks 48] [--cache-rows 384] [--iters 3]
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

FRAME_SECONDS = 2048 / 44100


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", default="8,16,32,64")
    ap.add_argument("--ticks", type=int, default=48)
    ap.add_argument("--cache-rows", type=int, default=384)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--msf", type=int, default=128)
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    from dataclasses import replace as _rep

    from bench import build_converter
    from streamvoiceanon_tpu.config import SamplingConfig, tpu_optimized
    from streamvoiceanon_tpu.runtime.streaming import (
        StreamSession, _decode_vocode_inc, _encode_inc,
    )
    from streamvoiceanon_tpu.utils.jitopts import scoped_vmem_jit

    print(f"devices: {jax.devices()}", file=sys.stderr)
    cv = build_converter(jax.random.PRNGKey(0))
    cv = _rep(cv, cfg=tpu_optimized(cv.cfg))
    rng = np.random.default_rng(0)
    spf = cv.cfg.samples_per_frame
    ref = (rng.standard_normal((1, 48 * spf)) * 0.1).astype(np.float32)
    sess = StreamSession(
        cv, _rep(cv.cfg.stream, max_seq_frames=args.msf),
        key=jax.random.PRNGKey(1), sampling=SamplingConfig(),
        style=jnp.asarray(rng.standard_normal((1, 192)), jnp.bfloat16),
        timbre=jnp.asarray(rng.standard_normal((1, 32, 128)), jnp.bfloat16),
        ref_tokens=cv.content_tokens(jnp.asarray(ref)),
        ref_codes=cv.audio_codes(jnp.asarray(ref)),
    )
    src1 = (rng.standard_normal((1, 8 * spf)) * 0.1).astype(np.float32)
    t0 = time.time()
    for i in range(cv.cfg.stream.delay + 2):
        sess.process_chunk(src1[:, i * spf:(i + 1) * spf])
    print(f"warm-up: {time.time() - t0:.1f}s", file=sys.stderr)
    sess = sess.with_cache_rows(args.cache_rows)

    K = args.ticks
    rows = []
    for B in [int(b) for b in args.streams.split(",")]:
        t0 = time.time()
        sess_b = sess.fanout(B)
        cfg_b, cv_b = sess_b.cfg, sess_b.cv
        print(f"B={B}: fanout {time.time() - t0:.1f}s", file=sys.stderr)

        def scan_ticks(tok_p, arvc_p, voc_p, fstate, chunks, key):
            def body(carry, chunk):
                fs2, kk = carry
                ts, rg, toks = _encode_inc(
                    tok_p, cfg_b, fs2.tok, fs2.tok_ring, chunk,
                    sess_b._mel_consts)
                kk, sub = jax.random.split(kk)
                lm, cr, vc, wav, _k = _decode_vocode_inc(
                    arvc_p, voc_p, cfg_b, fs2.lm, fs2.code_ring, fs2.voc,
                    toks, sess_b.sampling, sub)
                fs2 = fs2._replace(tok=ts, tok_ring=rg, lm=lm,
                                   code_ring=cr, voc=vc)
                return (fs2, kk), wav[:, :8]

            (_, _), wavs = jax.lax.scan(body, (fstate, key), chunks)
            return wavs

        ms_scan = scoped_vmem_jit(scan_ticks)
        chunks = jnp.asarray(
            rng.standard_normal((K, B, spf)) * 0.1, jnp.float32)
        argsb = (cv_b.tokenizer_params, cv_b.arvc_params, cv_b.vocoder_params,
                 sess_b.fstate, chunks, jax.random.PRNGKey(13))
        t0 = time.time()
        try:
            np.asarray(ms_scan(*argsb))
        except Exception as e:  # noqa: BLE001
            print(f"B={B}: FAILED ({type(e).__name__}: {str(e)[:200]})",
                  file=sys.stderr)
            continue
        print(f"B={B}: scan compile+first {time.time() - t0:.1f}s",
              file=sys.stderr)
        nullp = jax.jit(lambda xs: jnp.sum(xs) * 1.0)
        np.asarray(nullp(chunks))
        fl, nl = [], []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            np.asarray(ms_scan(*argsb))
            fl.append((time.perf_counter() - t0) / K)
            t0 = time.perf_counter()
            np.asarray(nullp(chunks))
            nl.append((time.perf_counter() - t0) / K)
        tick_s = max(float(np.median(fl) - np.median(nl)), 1e-6)
        row = {
            "streams": B,
            "tick_compute_ms": round(tick_s * 1e3, 3),
            "audio_s_per_s": round(B * FRAME_SECONDS / tick_s, 1),
            "n": args.iters,
            "tick_ms_spread": [
                round((min(fl) - np.median(nl)) * 1e3, 3),
                round((max(fl) - np.median(nl)) * 1e3, 3)],
            "method": (f"lax.scan x{K} at batch {B}, one dispatch; "
                       f"null subtracted; cache_rows={args.cache_rows}"),
        }
        rows.append(row)
        print(json.dumps(row), file=sys.stderr)
        del chunks
    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
