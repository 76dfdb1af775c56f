"""Pallas TPU kernel: grid-pipelined windowed-transformer streaming step.

The content tokenizer's window-limited transformer (reference
modules/vqgan/windowed_transformer.py:275-354) processes ONE new token per
2048-sample chunk through 8 layers against a 512-slot rotated-frame KV ring
(models/tokenizer_stream.py).  As a lax.scan in XLA the step measures
~0.44 ms on chip (stage_floor `enc_wt`) against a ~0.1 ms weight+ring
streaming floor — per-op scheduling latency, the same disease as the LM slow
step (BENCH.md).

Same cure as ops/pallas_slow_decode.py: run all layers in ONE pallas_call
with the layer index as the grid dimension so Mosaic double-buffers layer
l+1's weight and ring blocks behind layer l's compute.  Differences from the
LM kernel:

* the rotated-frame ring is REWRITTEN whole every step (every cached key is
  rotated by one negative position step and shifted one slot), so the ring
  blocks are genuine in+out per layer — the rotation is computed in-kernel
  as `k*cos + (k@rot)*sin` with the constant pair-swap matrix, and the shift
  as a static sublane slice;
* the fresh key/query sit at relative position 0, so neither is roped;
* layer-scale vectors (attn_scale/ffn_scale, windowed_transformer.py:53-54)
  multiply both residual branches — read per layer via one-hot row matmuls
  like the norm tables.

The ring is stored FLAT as (L, B, W, n_head*head_dim) rows
(`WindowedTransformerConfig.use_pallas_stream` changes the RingState layout);
per-head score/output math uses the constant one-hot segment matmuls.

Scope: batch 1, dw_conv off (the deployed tokenizer config) — otherwise the
caller falls back to the XLA scan on the same flat layout.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu resolves on TPU-capable builds; interpret mode works anywhere
    from jax.experimental.pallas import tpu as pltpu

    _MEM = pltpu.VMEM
    _SMEM = pltpu.SMEM
except Exception:  # pragma: no cover
    pltpu = None
    _MEM = None
    _SMEM = None

_NEG_INF = float(-jnp.inf)


def _rms(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return y.astype(x.dtype) * w


def _dot(a: jax.Array, b: jax.Array) -> jax.Array:
    out = jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return out.astype(a.dtype)


def _dotf(a: jax.Array, b: jax.Array) -> jax.Array:
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _roll_lanes(x: jax.Array, shift: int) -> jax.Array:
    """Static roll along the lane (last) axis; Mosaic lowers this natively."""
    return jnp.roll(x, shift, axis=1)


def _wt_step_kernel(
    count_ref,  # (1,) SMEM int32 — tokens seen BEFORE this one
    x_ref,  # (1, dim) weight dtype
    cosu_ref,  # (1, dim) f32 — unit -1-step rotation, pair-expanded+head-tiled
    sinu_ref,  # (1, dim) f32
    wqkv_ref,  # (1, dim, 3*dim)
    wo_ref,  # (1, dim, dim)
    w1_ref,  # (1, dim, inter)
    w3_ref,  # (1, dim, inter)
    w2_ref,  # (1, inter, dim)
    anorm_ref,  # (L, dim)
    fnorm_ref,  # (L, dim)
    ascale_ref,  # (L, dim)
    fscale_ref,  # (L, dim)
    kin_ref,  # (1, W, dim) ring dtype
    vin_ref,  # (1, W, dim)
    xo_ref,  # out: (1, dim)
    kout_ref,  # out: (1, W, dim)
    vout_ref,  # out: (1, W, dim)
    xs_ref,  # scratch: (1, dim) — activation carried across layers
    *,
    n_layer: int,
    dim: int,
    n_head: int,
    head_dim: int,
    norm_eps: float,
):
    f32 = jnp.float32
    l = pl.program_id(0)
    count = count_ref[0]
    W = kin_ref.shape[1]
    inv_scale = 1.0 / np.sqrt(head_dim)

    @pl.when(l == 0)
    def _init():
        xs_ref[...] = x_ref[...]

    h = xs_ref[...]  # (1, dim)
    wd = h.dtype
    rd = kin_ref.dtype

    # constant one-hot head-segment matrices
    d0 = jax.lax.broadcasted_iota(jnp.int32, (dim, n_head), 0)
    h1 = jax.lax.broadcasted_iota(jnp.int32, (dim, n_head), 1)
    seg = (d0 // head_dim == h1).astype(f32)  # (dim, n_head)
    segT = jnp.transpose(seg)

    # per-layer norm/scale rows via one-hot matmuls (Mosaic cannot prove a
    # traced sublane index tile-aligned; a (1, L) @ (L, dim) dot is exact)
    lrow = jax.lax.broadcasted_iota(jnp.int32, (1, n_layer), 1)
    lhot = (lrow == l).astype(anorm_ref.dtype)
    anorm = _dot(lhot, anorm_ref[...])  # (1, dim)
    fnorm = _dot(lhot, fnorm_ref[...])
    ascale = _dot(lhot, ascale_ref[...])
    fscale = _dot(lhot, fscale_ref[...])

    # --- attention (tokenizer_stream.transformer_stream_step) ---
    hn = _rms(h, anorm, norm_eps)
    qkv = _dot(hn, wqkv_ref[0])  # (1, 3*dim)
    q = qkv[:, :dim]  # relative position 0 — un-roped
    k_new = qkv[:, dim : 2 * dim]
    v_new = qkv[:, 2 * dim :]

    # rotate every cached key one step into the past, shift one slot, append.
    # The rotate-partner rp[2i] = x[2i+1], rp[2i+1] = x[2i] is two lane rolls
    # + a parity select (elementwise — a (W, dim) @ (dim, dim) pair-swap
    # matmul here measured ~15% of the whole kernel); the partner's sign is
    # folded into the sin row by the wrapper (negative on even lanes).
    kin = kin_ref[0].astype(f32)  # (W, dim)
    cosu = cosu_ref[...]
    sinu = sinu_ref[...]  # sign-folded: -sin on even lanes, +sin on odd
    lane = jax.lax.broadcasted_iota(jnp.int32, (W, dim), 1)
    partner = jnp.where(
        lane % 2 == 0,
        _roll_lanes(kin, -1),
        _roll_lanes(kin, 1),
    )
    krot = kin * cosu + partner * sinu
    k_ring = jnp.concatenate(
        [krot[1:].astype(rd), k_new.astype(rd)], axis=0
    )  # (W, dim)
    v_ring = jnp.concatenate([vin_ref[0][1:], v_new.astype(rd)], axis=0)
    kout_ref[0] = k_ring
    vout_ref[0] = v_ring

    # slot w holds age W-1-w; ages beyond count are empty
    srow = jax.lax.broadcasted_iota(jnp.int32, (W, n_head), 0)
    valid = (W - 1 - srow) <= jnp.minimum(count, W - 1)
    qt = q.astype(rd)
    s = _dotf((k_ring * qt).astype(f32), seg) * inv_scale  # (W, n_head)
    s = jnp.where(valid, s, _NEG_INF)
    m = jnp.max(s, axis=0, keepdims=True)  # (1, n_head)
    e = jnp.where(valid, jnp.exp(s - m), 0.0)
    denom = jnp.sum(e, axis=0, keepdims=True)
    wexp = _dotf(e, segT)  # (W, dim)
    attn = jnp.sum(wexp * v_ring.astype(f32), axis=0, keepdims=True)
    attn = (attn / _dotf(denom, segT)).astype(wd)  # (1, dim)
    h = h + ascale * _dot(attn, wo_ref[0])

    # --- SwiGLU FFN with layer scale ---
    fn = _rms(h, fnorm, norm_eps)
    a = _dot(fn, w1_ref[0]).astype(f32)
    silu = a / (1.0 + jnp.exp(-a))
    gate = silu.astype(wd) * _dot(fn, w3_ref[0])
    h = h + fscale * _dot(gate.astype(wd), w2_ref[0])

    xs_ref[...] = h

    @pl.when(l == n_layer - 1)
    def _fin():
        xo_ref[...] = h


@functools.lru_cache(maxsize=8)
def _unit_rows(head_dim: int, n_head: int, rope_base: float):
    """Unit -1-step rotation cos/sin rows, pair-expanded + head-tiled.

    The sin row carries the rotate-partner's sign (negative on even lanes):
    rotated = x * cos + partner(x) * sin with partner[2i] = x[2i+1],
    partner[2i+1] = x[2i]."""
    freqs = 1.0 / (
        rope_base ** (np.arange(0, head_dim, 2)[: head_dim // 2] / head_dim)
    )
    cos = np.tile(np.repeat(np.cos(-freqs), 2), n_head)[None]
    sign = np.tile(np.array([-1.0, 1.0]), head_dim // 2)
    sin = np.tile(np.repeat(np.sin(-freqs), 2) * sign, n_head)[None]
    return cos.astype(np.float32), sin.astype(np.float32)


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "head_dim", "rope_base", "norm_eps", "interpret"),
)
def wt_stream_step(
    layers: Dict,  # stacked: wqkv/wo/w1/w3/w2 (L, ...), norms+scales (L, dim)
    x1: jax.Array,  # (1, dim) — the new token's features, B=1
    k_ring: jax.Array,  # (L, W, dim) flat rotated-frame ring
    v_ring: jax.Array,  # (L, W, dim)
    count: jax.Array,  # scalar int32 — tokens seen before this one
    *,
    n_head: int,
    head_dim: int,
    rope_base: float = 10000.0,
    norm_eps: float = 1e-5,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (x_out (1, dim), k_ring' (L, W, dim), v_ring' (L, W, dim)).

    Drop-in for one models/tokenizer_stream.transformer_stream_step layer
    scan (minus the final norm, applied by the caller) on the flat ring
    layout."""
    L, dim, three_dim = layers["wqkv"]["w"].shape
    inter = layers["w1"]["w"].shape[-1]
    W = k_ring.shape[1]
    rd = k_ring.dtype
    wd = layers["wqkv"]["w"].dtype

    cos_np, sin_np = _unit_rows(head_dim, n_head, rope_base)
    count_arr = jnp.asarray(count, jnp.int32).reshape(1)

    kernel = functools.partial(
        _wt_step_kernel,
        n_layer=L, dim=dim, n_head=n_head, head_dim=head_dim, norm_eps=norm_eps,
    )

    compiled = not interpret and pltpu is not None
    if pltpu is None:  # pragma: no cover — interpret-only environments
        raise RuntimeError("pallas tpu module unavailable")

    def spec(shape, index_map):
        if compiled:
            return pl.BlockSpec(shape, index_map, memory_space=_MEM)
        return pl.BlockSpec(shape, index_map)

    in_specs = [
        pl.BlockSpec(memory_space=_SMEM) if compiled else pl.BlockSpec(memory_space=None),
        spec((1, dim), lambda l: (0, 0)),
        spec((1, dim), lambda l: (0, 0)),
        spec((1, dim), lambda l: (0, 0)),
        spec((1, dim, three_dim), lambda l: (l, 0, 0)),
        spec((1, dim, dim), lambda l: (l, 0, 0)),
        spec((1, dim, inter), lambda l: (l, 0, 0)),
        spec((1, dim, inter), lambda l: (l, 0, 0)),
        spec((1, inter, dim), lambda l: (l, 0, 0)),
        spec((L, dim), lambda l: (0, 0)),
        spec((L, dim), lambda l: (0, 0)),
        spec((L, dim), lambda l: (0, 0)),
        spec((L, dim), lambda l: (0, 0)),
        spec((1, W, dim), lambda l: (l, 0, 0)),
        spec((1, W, dim), lambda l: (l, 0, 0)),
    ]
    out_specs = (
        spec((1, dim), lambda l: (0, 0)),
        spec((1, W, dim), lambda l: (l, 0, 0)),
        spec((1, W, dim), lambda l: (l, 0, 0)),
    )
    kwargs = {}
    if compiled:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024,
        )

    x_out, k_out, v_out = pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((1, dim), wd),
            jax.ShapeDtypeStruct((L, W, dim), rd),
            jax.ShapeDtypeStruct((L, W, dim), rd),
        ),
        scratch_shapes=[pltpu.VMEM((1, dim), wd)],
        interpret=interpret,
        **kwargs,
    )(
        count_arr,
        x1.astype(wd),
        jnp.asarray(cos_np),
        jnp.asarray(sin_np),
        layers["wqkv"]["w"],
        layers["wo"]["w"],
        layers["w1"]["w"],
        layers["w3"]["w"],
        layers["w2"]["w"],
        layers["attention_norm"]["w"],
        layers["ffn_norm"]["w"],
        layers["attn_scale"],
        layers["ffn_scale"],
        k_ring,
        v_ring,
    )
    return x_out, k_out, v_out
