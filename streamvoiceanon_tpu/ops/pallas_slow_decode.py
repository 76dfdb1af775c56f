"""Pallas TPU kernel: grid-pipelined slow-transformer decode step.

The dual-AR LM's slow stack processes 2 tokens per frame through 12 layers
(reference modules/dual_ar_stream.py:1168-1219).  As a lax.scan in XLA the
step is HBM-latency-bound: ~184 MB of layer weights plus ~75 MB of KV cache
stream per frame against a ~0.3 ms bandwidth floor, yet the measured step is
~0.9 ms — per-op scheduling gaps, not bandwidth, dominate (unrolling the scan
makes it WORSE, see BENCH.md).

This kernel runs the whole 12-layer step in ONE pallas_call with the layer
index as the grid dimension: Mosaic's grid pipeline double-buffers layer
l+1's weight and cache blocks behind layer l's compute, so the step runs at
the streaming floor.  Design points:

* activations stay a flat (2, dim) row pair the whole time — per-head
  attention math uses constant one-hot "segment" matmuls (the same trick as
  ops/pallas_fast_decode.py), so the KV cache is stored FLAT as (L, S,
  n_head*head_dim) rows (config.DualARConfig.use_pallas_slow_decode changes
  the DecodeState layout; XLA prefill writes the same flat rows);
* the cache blocks are read-only inputs: the 2 fresh K/V rows are returned
  as (L, 2, dim) outputs and folded into the cache by ONE
  dynamic_update_slice outside (in-place on the donated streaming state), so
  the kernel never pays the full-cache writeback that sank the per-head
  decode-attention kernel (BENCH.md round-2);
* attention over the past runs against the cache block with rows `< pos`
  masked in f32; the 2 fresh tokens contribute via a separate tiny score
  path, and both parts share one max/denominator so the softmax is exact;
* RoPE uses the pair-rotation-matrix formulation (bit-exact vs
  ops/rope.apply_rope in f32) with cos/sin rows for (pos, pos+1) sliced
  outside the kernel;
* the final-norm + output-head matmul + exact full-vocab nucleus sampling
  of the semantic token run in the LAST grid step (same bisection-threshold
  + pre-generated-Gumbel-race sampler as ops/pallas_fast_decode.py), so the
  per-frame XLA glue shrinks to the cache fold + the fast kernel.  The
  in-kernel sampler is the reference's exact filter (top_k_window=0
  semantics, dual_ar_stream.py:1099-1132).

Scope: batch 1, MHA (n_local_heads == n_head) — the streaming hot path.
Everything else falls back to the XLA scan.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from streamvoiceanon_tpu.ops.pallas_common import (  # shared kernel helpers
    NEG_INF as _NEG_INF,
    SMEM as _SMEM,
    VMEM as _MEM,
    dot as _dot,
    dotf as _dotf,
    pltpu,
    rms as _rms,
)

from streamvoiceanon_tpu.ops.rope import precompute_freqs_cis



def _slow_step_kernel(
    pos_ref,  # (1,) SMEM int32
    x_ref,  # (2, dim) weight dtype
    cos_ref,  # (2, dim) f32 — rows for pos, pos+1, pair-expanded + head-tiled
    sin_ref,  # (2, dim) f32
    wqkv_ref,  # (1, dim, 3*dim)
    wo_ref,  # (1, dim, dim)
    w1_ref,  # (1, dim, inter)
    w3_ref,  # (1, dim, inter)
    w2_ref,  # (1, inter, dim)
    anorm_ref,  # (L, dim) — whole table resident (tiny); row l read per step
    fnorm_ref,  # (L, dim)
    kc_ref,  # (1, S, dim) cache dtype — read-only past
    vc_ref,  # (1, S, dim)
    onorm_ref,  # (1, dim) — final norm, resident (constant index map)
    wout_ref,  # (dim, V) — output head, resident
    gum_ref,  # (1, V) f32 — pre-generated Gumbel race row
    xo_ref,  # out: (2, dim) weight dtype
    kr_ref,  # out: (1, 2, dim) cache dtype — fresh K rows (roped)
    vr_ref,  # out: (1, 2, dim)
    tok_ref,  # out: (1, 1) int32 — sampled semantic token
    xs_ref,  # scratch: (2, dim) weight dtype — activation carried over layers
    *,
    n_layer: int,
    dim: int,
    n_head: int,
    head_dim: int,
    norm_eps: float,
    temperature: float,
    top_p: float,
    greedy: bool,
):
    f32 = jnp.float32
    l = pl.program_id(0)
    pos = pos_ref[0]
    S = kc_ref.shape[1]
    inv_scale = 1.0 / np.sqrt(head_dim)

    @pl.when(l == 0)
    def _init():
        xs_ref[...] = x_ref[...]

    h = xs_ref[...]  # (2, dim)
    wd = h.dtype
    cd = kc_ref.dtype

    # constant one-hot head-segment matrices
    d0 = jax.lax.broadcasted_iota(jnp.int32, (dim, n_head), 0)
    h1 = jax.lax.broadcasted_iota(jnp.int32, (dim, n_head), 1)
    seg = (d0 // head_dim == h1).astype(f32)  # (dim, n_head)
    segT = jnp.transpose(seg)  # (n_head, dim)

    # dynamic-row norm reads as one-hot matmuls: Mosaic cannot prove a
    # traced sublane index is tile-aligned, but a (1, L) @ (L, dim) dot is
    # layout-trivial and exact (one-hot)
    lrow = jax.lax.broadcasted_iota(jnp.int32, (1, n_layer), 1)
    lhot = (lrow == l).astype(anorm_ref.dtype)
    anorm = _dot(lhot, anorm_ref[...])  # (1, dim)
    fnorm = _dot(lhot, fnorm_ref[...])

    # pair rotation rp[2i] = -x[2i+1], rp[2i+1] = x[2i]
    rj = jax.lax.broadcasted_iota(jnp.int32, (dim, dim), 0)
    rc = jax.lax.broadcasted_iota(jnp.int32, (dim, dim), 1)
    rot = ((rj % 2 == 0) & (rc == rj + 1)).astype(f32) - (
        (rj % 2 == 1) & (rc == rj - 1)
    ).astype(f32)

    # --- attention ---
    hn = _rms(h, anorm, norm_eps)
    qkv = _dot(hn, wqkv_ref[0])  # (2, 3*dim)
    q32 = qkv[:, :dim].astype(f32)
    k32 = qkv[:, dim : 2 * dim].astype(f32)
    v = qkv[:, 2 * dim :]
    cos = cos_ref[...]
    sin = sin_ref[...]
    qr = (q32 * cos + _dotf(q32, rot) * sin).astype(wd)  # rope, wd-rounded
    kr = (k32 * cos + _dotf(k32, rot) * sin).astype(wd)
    kr_ref[0] = kr.astype(cd)
    vr_ref[0] = v.astype(cd)

    kc = kc_ref[0]  # (S, dim)
    vc = vc_ref[0]
    srow = jax.lax.broadcasted_iota(jnp.int32, (S, n_head), 0)
    old_valid = srow < pos
    kr_c = kr.astype(cd)  # score path sees cache-dtype K, like the XLA read
    v32 = v.astype(f32)
    jrow = jax.lax.broadcasted_iota(jnp.int32, (2, n_head), 0)

    outs = []
    for t in range(2):
        qt = qr[t : t + 1].astype(cd)  # (1, dim)
        # per-head scores via elementwise product + one-hot segment reduce:
        # s[s_, h] = sum_d k[s_, d] q[d] seg[d, h]  (the fast kernel's trick)
        s_old = _dotf((kc * qt).astype(f32), seg) * inv_scale  # (S, n_head)
        s_old = jnp.where(old_valid, s_old, _NEG_INF)
        # fresh-token scores: rows j in {0, 1}, causal j <= t
        s_new = _dotf((kr_c * qt).astype(f32), seg) * inv_scale  # (2, n_head)
        s_new = jnp.where(jrow <= t, s_new, _NEG_INF)

        m = jnp.maximum(
            jnp.max(s_old, axis=0, keepdims=True),
            jnp.max(s_new, axis=0, keepdims=True),
        )  # (1, n_head)
        eo = jnp.where(old_valid, jnp.exp(s_old - m), 0.0)  # (S, n_head)
        en = jnp.where(jrow <= t, jnp.exp(s_new - m), 0.0)  # (2, n_head)
        denom = jnp.sum(eo, axis=0, keepdims=True) + jnp.sum(
            en, axis=0, keepdims=True
        )  # (1, n_head)

        wexp = _dotf(eo, segT)  # (S, dim)
        attn = jnp.sum(wexp * vc.astype(f32), axis=0, keepdims=True)
        attn = attn + jnp.sum(_dotf(en, segT) * v32, axis=0, keepdims=True)
        attn = attn / _dotf(denom, segT)  # (1, dim)
        outs.append(attn)

    out = jnp.concatenate(outs, axis=0).astype(wd)  # (2, dim)
    h = h + _dot(out, wo_ref[0])

    # --- SwiGLU FFN ---
    fn = _rms(h, fnorm, norm_eps)
    a = _dot(fn, w1_ref[0]).astype(f32)
    silu = a / (1.0 + jnp.exp(-a))
    gate = silu.astype(wd) * _dot(fn, w3_ref[0])
    h = h + _dot(gate.astype(wd), w2_ref[0])

    xs_ref[...] = h

    @pl.when(l == n_layer - 1)
    def _fin():
        xo_ref[...] = h
        # --- final norm + output head + exact nucleus sampling -------------
        V = wout_ref.shape[-1]
        y = _rms(h[1:2], onorm_ref[...], norm_eps)
        logits = _dot(y, wout_ref[...]).astype(f32)  # (1, V), wd-rounded
        col = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)
        if greedy:
            race = logits
        elif top_p < 1.0:
            # reference filter (dual_ar_stream.py:1099-1132): keep the
            # smallest descending-prob prefix with cum-prob <= top_p, found
            # by 40-step bisection on the probability threshold
            m = jnp.max(logits)
            e = jnp.exp(logits - m)
            probs = e / jnp.sum(e)

            def bis(_, lohi):
                lo, hi = lohi
                mid = (lo + hi) * 0.5
                kept = jnp.sum(jnp.where(probs > mid, probs, 0.0)) <= top_p
                return (jnp.where(kept, lo, mid), jnp.where(kept, mid, hi))

            lo, _ = jax.lax.fori_loop(
                0, 40, bis, (jnp.float32(0.0), jnp.float32(1.0))
            )
            filtered = jnp.where(probs > lo, logits, _NEG_INF)
            race = filtered / max(temperature, 1e-5) + gum_ref[...]
        else:
            race = logits / max(temperature, 1e-5) + gum_ref[...]
        best = jnp.max(race)
        # keepdims: Mosaic cannot lower rank-0 stores to VMEM ("Cannot store
        # scalars to VMEM", seen on the real chip) — store a (1, 1) block
        tok_ref[...] = jnp.min(
            jnp.where(race == best, col, V), axis=1, keepdims=True
        ).astype(jnp.int32)


@functools.lru_cache(maxsize=8)
def _expanded_tables(max_seq: int, head_dim: int, n_head: int, rope_base: float):
    """Full-length pair-expanded, head-tiled cos/sin tables (max_seq, dim)."""
    fc = precompute_freqs_cis(max_seq, head_dim, rope_base)  # (S, hd//2, 2)
    cos = np.tile(np.repeat(fc[..., 0], 2, axis=-1), (1, n_head))
    sin = np.tile(np.repeat(fc[..., 1], 2, axis=-1), (1, n_head))
    return cos.astype(np.float32), sin.astype(np.float32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_head", "head_dim", "max_seq_len", "rope_base", "norm_eps",
        "temperature", "top_p", "greedy", "interpret",
    ),
)
def slow_decode_step(
    layers: Dict,  # stacked: wqkv/wo/w1/w3/w2 (L, ...), norms (L, dim)
    x2: jax.Array,  # (2, dim) — the frame's [audio_emb, cond_emb] pair, B=1
    k_cache: jax.Array,  # (L, S, dim) flat cache, rows < pos valid
    v_cache: jax.Array,  # (L, S, dim)
    pos: jax.Array,  # scalar int32 — first cache slot these 2 tokens occupy
    out_norm: jax.Array,  # (dim,) final norm weight
    out_head: jax.Array,  # (dim, vocab) output-head weight
    key: jax.Array,  # PRNG key for the semantic-token Gumbel race
    *,
    n_head: int,
    head_dim: int,
    max_seq_len: int,
    rope_base: float = 10000.0,
    norm_eps: float = 1e-5,
    temperature: float = 0.7,
    top_p: float = 0.7,
    greedy: bool = False,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Returns (x_out (2, dim), k_rows (L, 2, dim), v_rows (L, 2, dim),
    semantic (1,) int32).

    Drop-in for models/dual_ar._run_layers + _token_logits + sample_token
    (top_k_window=0 exact semantics) on the 2-token decode step with a flat
    (L, S, n_head*head_dim) cache; the caller folds k_rows/v_rows into the
    cache at `pos` with one dynamic_update_slice."""
    L, dim, three_dim = layers["wqkv"]["w"].shape
    inter = layers["w1"]["w"].shape[-1]
    S = k_cache.shape[1]
    vocab = out_head.shape[-1]
    cd = k_cache.dtype
    wd = layers["wqkv"]["w"].dtype

    cos_np, sin_np = _expanded_tables(max_seq_len, head_dim, n_head, rope_base)
    cos2 = jax.lax.dynamic_slice_in_dim(jnp.asarray(cos_np), pos, 2, axis=0)
    sin2 = jax.lax.dynamic_slice_in_dim(jnp.asarray(sin_np), pos, 2, axis=0)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    # same key usage as decode_frame's XLA path:
    # vmap(sample_token)(split(k_sem, 1), logits) -> gumbel(split(k_sem,1)[0])
    gum = (
        jnp.zeros((1, vocab), jnp.float32)
        if greedy
        else jax.random.gumbel(
            jax.random.split(key, 1)[0], (1, vocab), jnp.float32
        )
    )

    kernel = functools.partial(
        _slow_step_kernel,
        n_layer=L, dim=dim, n_head=n_head, head_dim=head_dim, norm_eps=norm_eps,
        temperature=temperature, top_p=top_p, greedy=greedy,
    )

    compiled = not interpret and pltpu is not None

    def spec(shape, index_map):
        if compiled:
            return pl.BlockSpec(shape, index_map, memory_space=_MEM)
        return pl.BlockSpec(shape, index_map)

    in_specs = [
        pl.BlockSpec(memory_space=_SMEM) if compiled else pl.BlockSpec(memory_space=None),
        spec((2, dim), lambda l: (0, 0)),
        spec((2, dim), lambda l: (0, 0)),
        spec((2, dim), lambda l: (0, 0)),
        spec((1, dim, three_dim), lambda l: (l, 0, 0)),
        spec((1, dim, dim), lambda l: (l, 0, 0)),
        spec((1, dim, inter), lambda l: (l, 0, 0)),
        spec((1, dim, inter), lambda l: (l, 0, 0)),
        spec((1, inter, dim), lambda l: (l, 0, 0)),
        spec((L, dim), lambda l: (0, 0)),
        spec((L, dim), lambda l: (0, 0)),
        spec((1, S, dim), lambda l: (l, 0, 0)),
        spec((1, S, dim), lambda l: (l, 0, 0)),
        spec((1, dim), lambda l: (0, 0)),
        spec((dim, vocab), lambda l: (0, 0)),
        spec((1, vocab), lambda l: (0, 0)),
    ]
    out_specs = (
        spec((2, dim), lambda l: (0, 0)),
        spec((1, 2, dim), lambda l: (l, 0, 0)),
        spec((1, 2, dim), lambda l: (l, 0, 0)),
        spec((1, 1), lambda l: (0, 0)),
    )
    kwargs = {}
    if compiled:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024,
        )
    if pltpu is None:  # pragma: no cover — interpret-only environments
        raise RuntimeError("pallas tpu module unavailable")

    x_out, k_rows, v_rows, tok = pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((2, dim), wd),
            jax.ShapeDtypeStruct((L, 2, dim), cd),
            jax.ShapeDtypeStruct((L, 2, dim), cd),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((2, dim), wd)],
        interpret=interpret,
        **kwargs,
    )(
        pos_arr,
        x2.astype(wd),
        cos2,
        sin2,
        layers["wqkv"]["w"],
        layers["wo"]["w"],
        layers["w1"]["w"],
        layers["w3"]["w"],
        layers["w2"]["w"],
        layers["attention_norm"]["w"],
        layers["ffn_norm"]["w"],
        k_cache,
        v_cache,
        out_norm[None, :].astype(wd),
        out_head.astype(wd),
        gum,
    )
    return x_out, k_rows, v_rows, tok[0]
