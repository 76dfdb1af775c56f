"""Pallas TPU kernel: fused KV-cache decode attention.

The LM frame decode writes 2 new K/V rows into a (H, S, D) cache and attends
the 2 query tokens over the valid prefix.  In pure XLA this is a
dynamic_update_slice + masked softmax over the whole cache with fresh output
buffers; this kernel fuses update+attend in ONE pass per head with the cache
aliased in-place (`input_output_aliases`), so the caches never get copied.

Layout: grid over heads; per head the cache block (S, D) lives in VMEM
(2048 x 64 bf16 = 256 KB), queries/new-KV are tiny.  Masking uses
broadcasted_iota against the scalar position (SMEM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds; interpret mode works anywhere
    from jax.experimental.pallas import tpu as pltpu

    _MEM = pltpu.VMEM
    _SMEM = pltpu.SMEM
except Exception:  # pragma: no cover
    pltpu = None
    _MEM = None
    _SMEM = None


def _kernel(pos_ref, q_ref, kn_ref, vn_ref, kc_ref, vc_ref, o_ref, kc_out, vc_out):
    """One head: write T new kv rows at pos, attend T queries over cache.

    Refs: pos (1,) SMEM; q/kn/vn (T, D); kc/vc (S, D) aliased to kc_out/vc_out.
    """
    pos = pos_ref[0]
    T = q_ref.shape[0]
    S = kc_ref.shape[0]
    D = q_ref.shape[1]

    # cache update as masked full-block writes: Mosaic cannot prove tile
    # alignment for a dynamic-row vector store (pos is any even number), so
    # select the T new rows in with broadcasted row-index compares instead.
    rows = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    k_new = kc_ref[...]
    v_new = vc_ref[...]
    for t in range(T):
        sel = rows == pos + t
        k_new = jnp.where(sel, kn_ref[t, :][None, :].astype(k_new.dtype), k_new)
        v_new = jnp.where(sel, vn_ref[t, :][None, :].astype(v_new.dtype), v_new)
    kc_out[...] = k_new
    vc_out[...] = v_new

    k = k_new.astype(jnp.float32)
    v = v_new.astype(jnp.float32)
    q = q_ref[...].astype(jnp.float32)

    # q arrives pre-scaled by 1/sqrt(true_head_dim) (wrapper), so padding the
    # head dim does not distort the softmax temperature
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (T, S)
    col = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (T, S), 0)
    mask = col <= pos + row
    scores = jnp.where(mask, scores, -jnp.inf)
    w = jax.nn.softmax(scores, axis=-1)
    out = jax.lax.dot_general(
        w, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention(
    q: jax.Array,  # (H, T, D)
    k_new: jax.Array,  # (H, T, D)
    v_new: jax.Array,  # (H, T, D)
    k_cache: jax.Array,  # (H, S, D)
    v_cache: jax.Array,  # (H, S, D)
    pos: jax.Array,  # scalar int32 — first cache slot to write
    *,
    interpret: bool = False,
):
    """Returns (out (H, T, D), k_cache', v_cache') with caches updated
    in place (donated/aliased)."""
    H, T, D = q.shape
    S = k_cache.shape[1]
    q = (q.astype(jnp.float32) / np.sqrt(D)).astype(q.dtype)
    if D % 128 != 0:
        # Mosaic requires 128-lane-aligned blocks; zero-pad the head dim
        # (zeros are inert in both dot products).  Production integration
        # keeps caches pre-padded to avoid the per-call pad/slice.
        pad = 128 - D % 128
        padw = ((0, 0), (0, 0), (0, pad))
        out, kc, vc = _call_kernel(
            jnp.pad(q, padw), jnp.pad(k_new, padw), jnp.pad(v_new, padw),
            jnp.pad(k_cache, padw), jnp.pad(v_cache, padw), pos, interpret,
        )
        return out[..., :D], kc[..., :D], vc[..., :D]
    return _call_kernel(q, k_new, v_new, k_cache, v_cache, pos, interpret)


@functools.partial(jax.jit, static_argnames=("true_head_dim", "interpret"))
def decode_attention_prepadded(
    q: jax.Array,  # (H, T, D) — true head dim
    k_new: jax.Array,  # (H, T, D)
    v_new: jax.Array,  # (H, T, D)
    k_cache: jax.Array,  # (H, S, Dp) — pre-padded to a 128-lane multiple
    v_cache: jax.Array,  # (H, S, Dp)
    pos: jax.Array,  # scalar int32 — first cache slot to write
    *,
    true_head_dim: int,
    interpret: bool = False,
):
    """decode_attention for caches stored pre-padded to the Mosaic lane width
    (config.DualARConfig.cache_head_dim).  Only the tiny per-step tensors are
    padded per call; the big caches keep their padded layout end to end.
    Returns (out (H, T, true_head_dim), k_cache', v_cache')."""
    H, T, D = q.shape
    Dp = k_cache.shape[-1]
    q = (q.astype(jnp.float32) / np.sqrt(true_head_dim)).astype(q.dtype)
    if Dp != D:
        padw = ((0, 0), (0, 0), (0, Dp - D))
        q, k_new, v_new = (jnp.pad(a, padw) for a in (q, k_new, v_new))
    out, kc, vc = _call_kernel(q, k_new, v_new, k_cache, v_cache, pos, interpret)
    return out[..., :D], kc, vc


def _call_kernel(q, k_new, v_new, k_cache, v_cache, pos, interpret):
    H, T, D = q.shape
    S = k_cache.shape[1]
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    kwargs = {}
    if not interpret and pltpu is not None:
        in_specs = [
            pl.BlockSpec(memory_space=_SMEM),
            pl.BlockSpec((1, T, D), lambda h: (h, 0, 0), memory_space=_MEM),
            pl.BlockSpec((1, T, D), lambda h: (h, 0, 0), memory_space=_MEM),
            pl.BlockSpec((1, T, D), lambda h: (h, 0, 0), memory_space=_MEM),
            pl.BlockSpec((1, S, D), lambda h: (h, 0, 0), memory_space=_MEM),
            pl.BlockSpec((1, S, D), lambda h: (h, 0, 0), memory_space=_MEM),
        ]
        out_specs = (
            pl.BlockSpec((1, T, D), lambda h: (h, 0, 0), memory_space=_MEM),
            pl.BlockSpec((1, S, D), lambda h: (h, 0, 0), memory_space=_MEM),
            pl.BlockSpec((1, S, D), lambda h: (h, 0, 0), memory_space=_MEM),
        )
    else:
        in_specs = [
            pl.BlockSpec(memory_space=None),
            pl.BlockSpec((1, T, D), lambda h: (h, 0, 0)),
            pl.BlockSpec((1, T, D), lambda h: (h, 0, 0)),
            pl.BlockSpec((1, T, D), lambda h: (h, 0, 0)),
            pl.BlockSpec((1, S, D), lambda h: (h, 0, 0)),
            pl.BlockSpec((1, S, D), lambda h: (h, 0, 0)),
        ]
        out_specs = (
            pl.BlockSpec((1, T, D), lambda h: (h, 0, 0)),
            pl.BlockSpec((1, S, D), lambda h: (h, 0, 0)),
            pl.BlockSpec((1, S, D), lambda h: (h, 0, 0)),
        )

    def kernel3d(pos_ref, q_ref, kn_ref, vn_ref, kc_ref, vc_ref,
                 o_ref, kc_out, vc_out):
        _kernel(
            pos_ref, q_ref.at[0], kn_ref.at[0], vn_ref.at[0], kc_ref.at[0],
            vc_ref.at[0], o_ref.at[0], kc_out.at[0], vc_out.at[0],
        )

    out, kc, vc = pl.pallas_call(
        kernel3d,
        grid=(H,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((H, T, D), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ),
        input_output_aliases={4: 1, 5: 2},  # k_cache->kc_out, v_cache->vc_out
        interpret=interpret,
        **kwargs,
    )(pos_arr, q, k_new, v_new, k_cache, v_cache)
    return out, kc, vc
