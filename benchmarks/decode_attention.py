"""Per-frame LM decode device time: XLA attention path vs the fused Pallas
decode-attention kernel (config.DualARConfig.use_pallas_decode).

Measures the full decode_frame (2-token slow step + 8-step codebook loop +
sampling) at deployed geometry, with K frames chained under one jit via
lax.scan so the axon relay's per-dispatch overhead (~25 ms) amortizes out.

Honest-measurement notes (BENCH.md "decode attention"): at head_dim 64 / MHA
the XLA path is near the HBM-bandwidth floor; the kernel's full-block cache
writeback plus the 128-lane padded cache layout doubles cache traffic, so the
kernel is expected to WIN only if Mosaic's fused pass beats XLA's
DUS+softmax scheduling.  This script decides the default.
"""

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from streamvoiceanon_tpu import config as C
from streamvoiceanon_tpu.models import dual_ar


def build(use_pallas: bool, dtype):
    cfg = C.replace(C.ARVCConfig().decoder, use_pallas_decode=use_pallas)
    params = dual_ar.prepare_params(
        jax.tree.map(lambda x: x.astype(dtype),
                     dual_ar.random_params(jax.random.PRNGKey(0), cfg))
    )
    return cfg, params


def timed(cfg, params, frames: int, iters: int, start_pos: int, dtype):
    samp = C.SamplingConfig()

    @jax.jit
    def run(params, state, key, emb):
        def body(carry, k):
            st, e = carry
            st, tok, codes = dual_ar.decode_frame(params, cfg, st, e, k, samp)
            return (st, e), tok

        (state, _), toks = jax.lax.scan(
            body, (state, emb), jax.random.split(key, frames))
        return state, toks

    state = dual_ar.init_state(cfg, batch=1, cache_dtype=jnp.bfloat16)
    state = state._replace(pos=jnp.int32(start_pos))
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 2, cfg.dim), dtype)

    params = jax.device_put(params)
    t0 = time.time()
    s2, toks = run(params, state, jax.random.PRNGKey(2), emb)
    np.asarray(toks)  # host transfer: the axon relay executes lazily, so
    compile_s = time.time() - t0  # block_until_ready alone does not force

    best = float("inf")
    for i in range(iters):
        t0 = time.time()
        _, toks = run(params, state, jax.random.PRNGKey(3 + i), emb)
        np.asarray(toks)
        best = min(best, time.time() - t0)
    return compile_s, best / frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--start-pos", type=int, default=512)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}",
          file=sys.stderr)
    for use_pallas in (False, True):
        cfg, params = build(use_pallas, dtype)
        compile_s, per_frame = timed(
            cfg, params, args.frames, args.iters, args.start_pos, dtype)
        name = "pallas" if use_pallas else "xla"
        print(f"{name:7s} compile={compile_s:6.1f}s  "
              f"per-frame={per_frame * 1e3:7.3f} ms "
              f"(pos={args.start_pos}, {args.frames} frames chained)")


if __name__ == "__main__":
    main()
