"""Isolate the on-chip cost of the periodic prompt refill (VERDICT r4 #1).

The streaming LM refills its cache every (max_seq_frames - buffer_frames)
frames (runtime/streaming.py:441-466, reference infer_arvc.py:547-564).
bench.py's refill-inclusive phase measures the stall as seen by a live
stream; this probe decomposes it:

  plain      — steady-state chunk (dispatch + sync fetch), the baseline
  refill_dis — _refill_incremental() dispatch + block on the new LM state
  refill_chk — a chunk that crosses the refill boundary (refill + chunk)

Run on an OTHERWISE-IDLE machine: host-side CPU contention inflates the
axon relay's per-dispatch costs by 10-60x and poisons the numbers.
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--dsp-dtype", default="bfloat16")
    ap.add_argument("--state-dtype", default="float32")
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    from streamvoiceanon_tpu.config import (
        PipelineConfig, SamplingConfig, tpu_optimized,
    )
    from streamvoiceanon_tpu.runtime.pipeline import VoiceConverter
    from streamvoiceanon_tpu.runtime.streaming import StreamSession
    from streamvoiceanon_tpu.utils import randparams as rp

    from dataclasses import replace

    tpu = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    on_tpu = tpu.platform != "cpu"
    print(f"devices: {tpu}", file=sys.stderr)

    cfg = PipelineConfig()
    cfg_tpu = tpu_optimized(cfg) if on_tpu else cfg
    spf = cfg.samples_per_frame
    rng = np.random.default_rng(0)
    dsp_dtype = jnp.float32 if args.dsp_dtype == "float32" else jnp.bfloat16
    state_dtype = jnp.float32 if args.state_dtype == "float32" else jnp.bfloat16
    tok_np = rp.tokenizer_params_np(cfg.tokenizer, 1, dtype=dsp_dtype)
    voc_np = rp.vocoder_params_np(cfg.vocoder, 2, dtype=dsp_dtype)
    arvc_np = rp.arvc_params_np(cfg.arvc, 3, jnp.bfloat16)

    ref_wav = (rng.standard_normal(64 * spf) * 0.1).astype(np.float32)
    src = (rng.standard_normal(64 * spf) * 0.1).astype(np.float32)
    with jax.default_device(cpu):
        cv_cpu = VoiceConverter(
            cfg=cfg, tokenizer_params=jax.device_put(tok_np, cpu),
            vocoder_params=jax.device_put(voc_np, cpu),
            arvc_params=jax.device_put(arvc_np, cpu))
        ref = jax.device_put(jnp.asarray(ref_wav)[None], cpu)
        sess = StreamSession(
            cv_cpu, cfg.stream, key=jax.random.PRNGKey(1),
            sampling=SamplingConfig(),
            style=jax.device_put(jnp.asarray(
                rng.standard_normal((1, 192)), jnp.bfloat16), cpu),
            timbre=jax.device_put(jnp.asarray(
                rng.standard_normal((1, 32, 128)), jnp.bfloat16), cpu),
            ref_tokens=cv_cpu.content_tokens(ref),
            ref_codes=cv_cpu.audio_codes(ref),
            state_dtype=state_dtype)
        for i in range(cfg.stream.delay + 3):
            sess.process_chunk(src[i * spf:(i + 1) * spf])
    print("CPU prep done", file=sys.stderr)

    if on_tpu:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cc")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    cv = VoiceConverter(
        cfg=cfg_tpu, tokenizer_params=jax.device_put(tok_np, tpu),
        vocoder_params=jax.device_put(voc_np, tpu),
        arvc_params=jax.device_put(arvc_np, tpu))
    sess = sess.transfer(cv, tpu)
    jax.block_until_ready(sess.fstate)
    if sess._base_lm is not None:
        jax.block_until_ready(sess._base_lm)

    def chunk(i):
        return src[(i % 60) * spf:((i % 60) + 1) * spf]

    # warm the per-chunk + refill programs (compile here, not in the timing)
    t0 = time.time()
    for i in range(3):
        np.asarray(sess.process_chunk_async(chunk(i)))
    print(f"chunk programs warm: {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    sess.warm_refill_programs()
    print(f"refill programs warm: {time.time()-t0:.1f}s", file=sys.stderr)

    # ---- plain steady-state chunks -----------------------------------------
    plain = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        np.asarray(sess.process_chunk_async(chunk(i)))
        plain.append(time.perf_counter() - t0)
    print(f"plain chunk: {[f'{t*1e3:.1f}' for t in plain]} ms")

    # ---- refill dispatch alone ---------------------------------------------
    rd = []
    for i in range(args.iters):
        saved = (sess.fstate, sess._lm_pos_host)
        t0 = time.perf_counter()
        sess._refill_incremental()
        jax.block_until_ready(sess.fstate.lm)
        rd.append(time.perf_counter() - t0)
        sess.fstate, sess._lm_pos_host = saved
    print(f"refill dispatch+block: {[f'{t*1e3:.1f}' for t in rd]} ms")

    # ---- chunks across real boundaries (small max_seq_frames) --------------
    sess.scfg = replace(sess.scfg, max_seq_frames=128)
    periods, refills = [], []
    for i in range(96):
        pos0 = sess._lm_pos_host
        t0 = time.perf_counter()
        np.asarray(sess.process_chunk_async(chunk(i)))
        dt = time.perf_counter() - t0
        (refills if sess._lm_pos_host < pos0 else periods).append(dt)
    periods = np.asarray(periods)
    print(f"stream: p50={np.percentile(periods,50)*1e3:.1f}ms "
          f"(n={len(periods)}); refill chunks: "
          f"{[f'{t*1e3:.0f}' for t in refills]} ms")


if __name__ == "__main__":
    main()
