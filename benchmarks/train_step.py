"""On-chip training-step benchmark for the dual-AR VC model (full geometry).

Measures what the reference's training loop (trainers/arvc_trainer.py:335-410)
costs per optimizer step on one TPU chip: full-size LM forward+backward +
MuonAdamW update over synthetic frozen-feature batches (the real trainer's
content tokens / codec targets / speaker embeddings are produced by frozen
models and are NOT part of the step being measured there either — they are
precomputed features from the trainer's perspective).

Reports per (batch, frames): step time (median + spread), frames/s,
audio-seconds/s, and MFU against the chip's bf16 peak, for f32 and bf16
master params.

Usage:  python benchmarks/train_step.py [--batches 4,8,16] [--frames 256]
        [--steps 5] [--dtypes float32,bfloat16] [--optimizer muon|adamw]
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


def param_count(tree) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(tree)))


def step_flops(cfg, params, B: int, T: int, delay: int) -> float:
    """Dense-transformer estimate: 6 x matmul-params x tokens (fwd+bwd),
    slow and fast stacks counted at their own token counts.  Embedding
    gathers and the loss excluded (<2% here)."""
    d = cfg.decoder
    slow_tokens = B * (2 * T + 33 + 2 * delay + 2)  # interleaved + spk prefix
    fast_tokens = B * T * (d.num_codebooks + 1)
    model = params["model"]
    slow_p = param_count({k: v for k, v in model.items()
                          if not k.startswith("fast_")})
    fast_p = param_count({k: v for k, v in model.items()
                          if k.startswith("fast_")})
    return 6.0 * (slow_p * slow_tokens + fast_p * fast_tokens)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="4,8,16")
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--dtypes", default="float32,bfloat16")
    ap.add_argument("--optimizer", default="muon", choices=["muon", "adamw"])
    ap.add_argument("--delay", type=int, default=2)
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    from streamvoiceanon_tpu.config import PipelineConfig
    from streamvoiceanon_tpu.train import muon as muon_mod
    from streamvoiceanon_tpu.train.step import TrainState, make_optimizer, train_step
    from streamvoiceanon_tpu.utils import randparams as rp
    from streamvoiceanon_tpu.utils.roofline import device_peaks

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    peaks = device_peaks(dev)
    peak_flops = peaks["bf16_flops"] if peaks else None
    cfg = PipelineConfig()
    T = args.frames
    nq = cfg.arvc.decoder.num_codebooks
    rows = []

    for dt_name in args.dtypes.split(","):
        dtype = jnp.dtype(dt_name)
        params_np = rp.arvc_params_np(cfg.arvc, 3, dtype)
        params = jax.device_put(params_np, dev)
        n_params = param_count(params)
        if args.optimizer == "muon":
            opt = muon_mod.muon_adamw(lr=1e-4)
        else:
            opt = make_optimizer()
        for B in [int(b) for b in args.batches.split(",")]:
            rng = np.random.default_rng(0)
            batch = {
                "content": jnp.asarray(
                    rng.integers(0, cfg.arvc.decoder.vocab_size, (B, T)),
                    jnp.int32),
                "base_target": jnp.asarray(
                    rng.integers(0, cfg.arvc.decoder.vocab_size, (B, T)),
                    jnp.int32),
                "target": jnp.asarray(
                    rng.integers(0, cfg.arvc.decoder.codebook_size, (B, nq, T)),
                    jnp.int32),
                "x_lens": jnp.full((B,), T, jnp.int32),
                "style": jnp.asarray(rng.standard_normal((B, 192)), dtype),
                "timbre": jnp.asarray(rng.standard_normal((B, 32, 128)), dtype),
            }
            batch = jax.device_put(batch, dev)
            state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
            # sync point that the relay cannot ack early: HOST-FETCH the
            # loss and a slice of an updated param leaf — both data-depend
            # on the full fwd+bwd+optimizer chain.  (block_until_ready on
            # relay-held arrays returns immediately on this transport,
            # yielding sub-ms phantom step times.)
            def _sync(state, aux):
                leaf = jax.tree.leaves(state.params)[0]
                return float(aux["loss"]), np.asarray(leaf.ravel()[:8])

            t0 = time.time()
            try:
                state, aux = train_step(state, batch, cfg.arvc, opt, args.delay)
                _sync(state, aux)
            except Exception as e:  # noqa: BLE001
                print(f"B={B} {dt_name}: FAILED ({type(e).__name__}: "
                      f"{str(e)[:160]})", file=sys.stderr)
                params = jax.device_put(params_np, dev)  # donated buffer gone
                continue
            compile_s = time.time() - t0
            # time WHOLE K-step chains ending in a fetch: each step's input
            # depends on the previous update, so the chain cannot pipeline
            # past itself; per-step = total / K.  Repeat for spread.
            K = args.steps
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(K):
                    state, aux = train_step(state, batch, cfg.arvc, opt,
                                            args.delay)
                _sync(state, aux)
                times.append((time.perf_counter() - t0) / K)
            step_s = float(np.median(times))
            flops = step_flops(cfg.arvc, state.params, B, T, args.delay)
            mfu = (flops / step_s / peak_flops * 100.0) if peak_flops else None
            row = {
                "param_dtype": dt_name,
                "optimizer": args.optimizer,
                "batch": B,
                "frames": T,
                "step_ms": round(step_s * 1e3, 1),
                "step_ms_spread": [round(min(times) * 1e3, 1),
                                   round(max(times) * 1e3, 1)],
                "n_steps": args.steps,
                "protocol": "median of 3 K-step chains, fetch-synced",
                "frames_per_s": round(B * T / step_s, 0),
                "audio_s_per_s": round(B * T * FRAME_SECONDS / step_s, 1),
                "model_flops_per_step": flops,
                "mfu_pct": None if mfu is None else round(mfu, 1),
                "compile_s": round(compile_s, 1),
                "loss": float(aux["loss"]),
                "grad_norm": float(aux["grad_norm"]),
                "n_params": n_params,
            }
            rows.append(row)
            print(json.dumps(row), file=sys.stderr)
            # re-put params: train_step donates the state, and the next B
            # must start from the same initial params
            params = jax.device_put(params_np, dev)
            state = None

    print(json.dumps({"device": str(dev), "rows": rows,
                      "peak_bf16_tflops":
                          None if not peak_flops else peak_flops / 1e12}))


if __name__ == "__main__":
    main()
