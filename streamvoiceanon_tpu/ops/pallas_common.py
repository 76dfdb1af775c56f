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
