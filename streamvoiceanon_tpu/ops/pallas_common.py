"""Shared helpers for the Pallas TPU kernel suite (docs/KERNELS.md).

One definition of the f32-accumulate dot helpers, the row-wise norms, and
the pltpu import fallback, so the five kernels cannot drift apart.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

try:  # pltpu resolves on TPU-capable builds; interpret mode works anywhere
    from jax.experimental.pallas import tpu as pltpu

    VMEM = pltpu.VMEM
    SMEM = pltpu.SMEM
except Exception:  # pragma: no cover
    pltpu = None
    VMEM = None
    SMEM = None

NEG_INF = float(-jnp.inf)


def dot(a: jax.Array, b: jax.Array) -> jax.Array:
    """Matmul with f32 accumulation, result rounded to the operand dtype
    (mirrors XLA's bf16 x bf16 -> bf16 dot on the scan paths)."""
    out = jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return out.astype(a.dtype)


def dotf(a: jax.Array, b: jax.Array) -> jax.Array:
    """Matmul with an f32 result (score/softmax/bias algebra)."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def rms(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    """ops/norm.rms_norm on rows (f32 internal, cast to x.dtype)."""
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return y.astype(x.dtype) * w


def splice_rows(buf: jax.Array, updates) -> jax.Array:
    """Rebuild `buf` (R, C) with `updates` = [(static_row_offset, rows)]
    spliced in at their offsets.

    Static-shape slice+concatenate form of dynamic_update_slice, which
    Mosaic cannot lower inside a TPU kernel ("Unimplemented primitive …
    dynamic_update_slice"); all offsets must be Python ints."""
    pieces, cur = [], 0
    for off, rows in sorted(updates, key=lambda u: u[0]):
        if off > cur:
            pieces.append(buf[cur:off])
        pieces.append(rows.astype(buf.dtype))
        cur = off + rows.shape[0]
    if cur < buf.shape[0]:
        pieces.append(buf[cur:])
    return jnp.concatenate(pieces, axis=0) if len(pieces) > 1 else pieces[0]
