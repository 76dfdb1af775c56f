"""Pallas TPU kernel: grid-pipelined windowed-transformer streaming step.

The content tokenizer's window-limited transformer (reference
modules/vqgan/windowed_transformer.py:275-354) processes ONE new token per
2048-sample chunk through 8 layers against a 512-slot KV ring
(models/tokenizer_stream.py).  As a lax.scan in XLA the step measures
~0.45 ms on chip (stage_floor `enc_wt`) against a ~0.2 ms weight+ring
streaming floor — per-op scheduling latency, the same disease as the LM slow
step (BENCH.md).

Same cure as ops/pallas_slow_decode.py — run all layers in ONE pallas_call
with the layer index as the grid dimension so Mosaic double-buffers layer
l+1's weight and ring blocks behind layer l's compute — plus one structural
change that the rotated-frame XLA design cannot make: the ring is
READ-ONLY.  The XLA path keeps every cached key rotated to the query frame,
which rewrites the whole ring every token (rotate + shift).  Here keys are
stored roped at an ABSOLUTE position and slots are written circularly
(slot = token mod W), so the per-token ring traffic drops from
read+rewrite to read-only + one fresh row:

* key/query positions use `p(t) = W + (t mod R)`; RoPE scores depend only on
  position differences, so as long as no wrap separates a query from an
  in-window key the scores equal the offline ones exactly;
* every R tokens (`t mod R == 0`) the wrapper re-bases the ring ONCE:
  every stored key is rotated by -R positions (an elementwise multiply by a
  constant angle, under lax.cond, outside the kernel).  In-window keys were
  written with ages < W <= R, so exactly one rebase can separate them from
  the current query and relative distances stay exact — the stream runs
  forever, like the rotated-frame design, at 1/R of its rotation cost;
* the kernel returns the fresh K/V rows (L, 1, dim); the caller folds them
  in with one dynamic_update_slice at the circular slot;
* attention masks slots by `slot <= min(count, W-1)` (softmax is
  permutation-invariant, so circular slot order needs no unshuffling);
* per-head score/mix math uses the constant one-hot segment matmuls and the
  one-hot norm/scale row reads of the sibling kernels (see docs/KERNELS.md);
  RoPE on the fresh (1, dim) rows is two lane rolls + a parity select.

The ring is stored FLAT as (L, B, W, n_head*head_dim) rows
(`WindowedTransformerConfig.use_pallas_stream` changes the RingState
layout); batch > 1 / dw_conv fall back to an XLA implementation of the SAME
circular design (`circular_stream_step_xla` below), so the layout has one
semantic everywhere.  `models/tokenizer_stream.convert_ring_layout`
migrates live state to/from the rotated-frame layout (per-slot rotation by
the angle difference + slot permutation).
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


# rebase period: positions live in [W, W + R); the rope table is W + R rows.
# One rebase per R tokens (~3.5k chunks = ~166 s of audio at W=512).
_TABLE = 4096


def _partner(x: jax.Array) -> jax.Array:
    """Rotate-partner rp[2i] = x[2i+1], rp[2i+1] = x[2i] on the lane axis."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(
        lane % 2 == 0,
        jnp.roll(x, -1, axis=x.ndim - 1),
        jnp.roll(x, 1, axis=x.ndim - 1),
    )


@functools.lru_cache(maxsize=8)
def _signed_tables(n_rows: int, head_dim: int, n_head: int, rope_base: float):
    """(n_rows, dim) cos/sin rows, pair-expanded + head-tiled; the sin row
    carries the rotate-partner sign (negative on even lanes), so
    rope(x, p) = x * cos[p] + partner(x) * sin[p]."""
    freqs = 1.0 / (
        rope_base ** (np.arange(0, head_dim, 2)[: head_dim // 2] / head_dim)
    )
    ang = np.arange(n_rows)[:, None] * freqs[None, :]  # (n_rows, hd//2)
    sign = np.tile(np.array([-1.0, 1.0]), head_dim // 2)
    cos = np.tile(np.repeat(np.cos(ang), 2, axis=-1), (1, n_head))
    sin = np.tile(np.repeat(np.sin(ang), 2, axis=-1) * sign[None, : head_dim],
                  (1, n_head))
    return cos.astype(np.float32), sin.astype(np.float32)


def _rope_rows(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Apply rope rows (broadcast over leading axes) in f32, keep x dtype."""
    xf = x.astype(jnp.float32)
    return (xf * cos + _partner(xf) * sin).astype(x.dtype)


def _wt_step_kernel(
    count_ref,  # (1,) SMEM int32 — tokens seen BEFORE this one
    x_ref,  # (1, dim) weight dtype
    cosq_ref,  # (1, dim) f32 — rope row for the current position
    sinq_ref,  # (1, dim) f32 (partner-signed)
    wqkv_ref,  # (1, dim, 3*dim)
    wo_ref,  # (1, dim, dim)
    w1_ref,  # (1, dim, inter)
    w3_ref,  # (1, dim, inter)
    w2_ref,  # (1, inter, dim)
    anorm_ref,  # (L, dim)
    fnorm_ref,  # (L, dim)
    ascale_ref,  # (L, dim)
    fscale_ref,  # (L, dim)
    kin_ref,  # (1, W, dim) ring dtype — READ-ONLY circular ring
    vin_ref,  # (1, W, dim)
    xo_ref,  # out: (1, dim)
    kr_ref,  # out: (1, 1, dim) — fresh roped K row
    vr_ref,  # out: (1, 1, dim)
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
    slot = count % W

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

    # per-layer norm/scale rows via one-hot matmuls
    lrow = jax.lax.broadcasted_iota(jnp.int32, (1, n_layer), 1)
    lhot = (lrow == l).astype(anorm_ref.dtype)
    anorm = _dot(lhot, anorm_ref[...])  # (1, dim)
    fnorm = _dot(lhot, fnorm_ref[...])
    ascale = _dot(lhot, ascale_ref[...])
    fscale = _dot(lhot, fscale_ref[...])

    # --- attention ---
    hn = _rms(h, anorm, norm_eps)
    qkv = _dot(hn, wqkv_ref[0])  # (1, 3*dim)
    cosq = cosq_ref[...]
    sinq = sinq_ref[...]
    q32 = qkv[:, :dim].astype(f32)
    k32 = qkv[:, dim : 2 * dim].astype(f32)
    qr = (q32 * cosq + _partner(q32) * sinq).astype(wd)
    kr = (k32 * cosq + _partner(k32) * sinq).astype(wd)
    v_new = qkv[:, 2 * dim :]
    kr_ref[0] = kr.astype(rd)
    vr_ref[0] = v_new.astype(rd)

    kin = kin_ref[0]  # (W, dim) — stale row at `slot` excluded via fresh path
    vin = vin_ref[0]
    srow = jax.lax.broadcasted_iota(jnp.int32, (W, n_head), 0)
    # circular validity: slots 0..count-1 written (all of 0..W-1 once
    # count >= W); the fresh token contributes via the separate tiny path
    old_valid = (srow < jnp.minimum(count, W)) & (srow != slot)

    qt = qr.astype(rd)
    s_old = _dotf((kin * qt).astype(f32), seg) * inv_scale  # (W, n_head)
    s_old = jnp.where(old_valid, s_old, _NEG_INF)
    s_new = _dotf(
        (kr.astype(rd) * qt).astype(f32), seg
    ) * inv_scale  # (1, n_head)

    m = jnp.maximum(jnp.max(s_old, axis=0, keepdims=True), s_new)
    eo = jnp.where(old_valid, jnp.exp(s_old - m), 0.0)  # (W, n_head)
    en = jnp.exp(s_new - m)  # (1, n_head)
    denom = jnp.sum(eo, axis=0, keepdims=True) + en
    wexp = _dotf(eo, segT)  # (W, dim)
    attn = jnp.sum(wexp * vin.astype(f32), axis=0, keepdims=True)
    attn = attn + _dotf(en, segT) * v_new.astype(f32)
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


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_head", "head_dim", "rope_base", "norm_eps", "table_rows", "interpret",
    ),
)
def wt_stream_step(
    layers: Dict,  # stacked: wqkv/wo/w1/w3/w2 (L, ...), norms+scales (L, dim)
    x1: jax.Array,  # (1, dim) — the new token's features, B=1
    k_ring: jax.Array,  # (L, W, dim) circular absolute-rope ring (read-only)
    v_ring: jax.Array,  # (L, W, dim)
    count: jax.Array,  # scalar int32 — tokens seen before this one
    *,
    n_head: int,
    head_dim: int,
    rope_base: float = 10000.0,
    norm_eps: float = 1e-5,
    table_rows: int = _TABLE,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (x_out (1, dim), k_ring' (L, W, dim), v_ring' (L, W, dim)),
    with the final layer norm NOT applied (caller's job) and the fresh rows
    already folded into the ring at the circular slot.

    The caller must apply `maybe_rebase_ring` BEFORE this step."""
    L, dim, three_dim = layers["wqkv"]["w"].shape
    inter = layers["w1"]["w"].shape[-1]
    W = k_ring.shape[1]
    rd = k_ring.dtype
    wd = layers["wqkv"]["w"].dtype
    R = table_rows - W

    cos_np, sin_np = _signed_tables(table_rows, head_dim, n_head, rope_base)
    p = W + (count % R)
    cosq = jax.lax.dynamic_slice_in_dim(jnp.asarray(cos_np), p, 1, axis=0)
    sinq = jax.lax.dynamic_slice_in_dim(jnp.asarray(sin_np), p, 1, axis=0)
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
        spec((1, 1, dim), lambda l: (l, 0, 0)),
        spec((1, 1, dim), lambda l: (l, 0, 0)),
    )
    kwargs = {}
    if compiled:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024,
        )

    x_out, k_row, v_row = pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((1, dim), wd),
            jax.ShapeDtypeStruct((L, 1, dim), rd),
            jax.ShapeDtypeStruct((L, 1, dim), rd),
        ),
        scratch_shapes=[pltpu.VMEM((1, dim), wd)],
        interpret=interpret,
        **kwargs,
    )(
        count_arr,
        x1.astype(wd),
        cosq,
        sinq,
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
    slot = (count % W).astype(jnp.int32)
    k_ring = jax.lax.dynamic_update_slice(
        k_ring, k_row.astype(k_ring.dtype), (0, slot, 0)
    )
    v_ring = jax.lax.dynamic_update_slice(
        v_ring, v_row.astype(v_ring.dtype), (0, slot, 0)
    )
    return x_out, k_ring, v_ring


def maybe_rebase_ring(
    k_ring: jax.Array,  # (..., W, dim) circular absolute-rope keys
    count: jax.Array,
    *,
    head_dim: int,
    n_head: int,
    rope_base: float = 10000.0,
    table_rows: int = _TABLE,
) -> jax.Array:
    """Every R tokens, rotate every stored key by -R positions so effective
    positions stay inside the rope table.  Cheap (one elementwise multiply,
    taken once per R ≈ 3.5k chunks); exactness argued in the module
    docstring."""
    W = k_ring.shape[-2]
    R = table_rows - W
    cos_np, sin_np = _signed_tables(table_rows, head_dim, n_head, rope_base)
    # rotation by -R = conjugate of row R: cos(Rθ), -sin(Rθ)
    cosr = jnp.asarray(cos_np[R])[None]
    sinr = jnp.asarray(-sin_np[R])[None]

    def rot(r):
        return _rope_rows(r, cosr, sinr)

    return jax.lax.cond(
        (count % R == 0) & (count > 0), rot, lambda r: r, k_ring
    )


def circular_stream_step_xla(
    layers: Dict,
    x: jax.Array,  # (B, 1, dim)
    k_ring: jax.Array,  # (L, B, W, dim)
    v_ring: jax.Array,
    count: jax.Array,
    *,
    n_head: int,
    head_dim: int,
    rope_base: float = 10000.0,
    norm_eps: float = 1e-5,
    table_rows: int = _TABLE,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """XLA fallback with the SAME circular absolute-rope semantics (batched /
    dw_conv-free path).  Caller applies maybe_rebase_ring first, like the
    kernel path."""
    from streamvoiceanon_tpu.ops.norm import rms_norm

    L, B, W, dim = k_ring.shape
    R = table_rows - W
    cos_np, sin_np = _signed_tables(table_rows, head_dim, n_head, rope_base)
    p = W + (count % R)
    cosq = jax.lax.dynamic_slice_in_dim(jnp.asarray(cos_np), p, 1, axis=0)
    sinq = jax.lax.dynamic_slice_in_dim(jnp.asarray(sin_np), p, 1, axis=0)
    slot = (count % W).astype(jnp.int32)
    srow = jnp.arange(W)
    old_valid = (srow < jnp.minimum(count, W)) & (srow != slot)

    def layer(h, inp):
        lp, kr_l, vr_l = inp
        hn = rms_norm(h, lp["attention_norm"]["w"], norm_eps)
        qkv = hn @ lp["wqkv"]["w"]  # (B, 1, 3*dim)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        qr = _rope_rows(q[:, 0], cosq, sinq)  # (B, dim)
        kn = _rope_rows(k[:, 0], cosq, sinq)
        kr_l = jax.lax.dynamic_update_slice(
            kr_l, kn[:, None].astype(kr_l.dtype), (0, slot, 0))
        vr_l = jax.lax.dynamic_update_slice(
            vr_l, v[:, 0][:, None].astype(vr_l.dtype), (0, slot, 0))
        kh = jnp.swapaxes(kr_l.reshape(B, W, n_head, head_dim), 1, 2)
        vh = jnp.swapaxes(vr_l.reshape(B, W, n_head, head_dim), 1, 2)
        qh = qr.reshape(B, n_head, 1, head_dim)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", qh, kh.astype(h.dtype),
            preferred_element_type=jnp.float32,
        ) / np.sqrt(head_dim)
        valid = old_valid | (srow == slot)  # fresh key attends
        scores = jnp.where(valid[None, None, None, :], scores, -jnp.inf)
        w = jax.nn.softmax(scores, axis=-1).astype(h.dtype)
        out = jnp.einsum("bhqk,bhkd->bqhd", w, vh.astype(h.dtype))
        out = out.reshape(B, 1, n_head * head_dim)
        h = h + lp["attn_scale"] * (out @ lp["wo"]["w"])
        fn = rms_norm(h, lp["ffn_norm"]["w"], norm_eps)
        f = (jax.nn.silu(fn @ lp["w1"]["w"]) * (fn @ lp["w3"]["w"])) @ lp["w2"]["w"]
        h = h + lp["ffn_scale"] * f
        return h, (kr_l, vr_l)

    h, rings = jax.lax.scan(
        lambda c, i: layer(c, i), x, (layers, k_ring, v_ring)
    )
    return h, rings[0], rings[1]
