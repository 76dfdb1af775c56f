"""Rotary position embeddings.

Matches reference dual_ar_stream.py:993-1016 / windowed_transformer.py:356-380:
freqs are precomputed in fp32, *stored in bfloat16* (the reference casts the
cos/sin cache to bf16), and applied in fp32 on interleaved (even, odd) pairs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def precompute_freqs_cis(
    seq_len: int, n_elem: int, base: float = 10000.0, bf16_quantize: bool = True
) -> np.ndarray:
    """Returns (seq_len, n_elem // 2, 2) float32 [cos, sin] cache.

    When `bf16_quantize`, values are rounded through bfloat16 first to match
    the reference cache dtype bit-for-bit (dual_ar_stream.py:1001)."""
    freqs = 1.0 / (
        base ** (np.arange(0, n_elem, 2)[: n_elem // 2].astype(np.float64) / n_elem)
    )
    t = np.arange(seq_len, dtype=np.float64)
    ang = np.outer(t, freqs)
    cache = np.stack([np.cos(ang), np.sin(ang)], axis=-1).astype(np.float32)
    if bf16_quantize:
        cache = cache.astype(jnp.bfloat16).astype(np.float32)
    return cache


def apply_rope(x: jax.Array, freqs_cis: jax.Array) -> jax.Array:
    """Rotate interleaved (even, odd) feature pairs.

    x: (B, T, H, D); freqs_cis: (T, D//2, 2).  Computes in fp32 and casts back
    to x.dtype (reference apply_rotary_emb, dual_ar_stream.py:1004-1016).
    """
    xf = x.astype(jnp.float32)
    xs = xf.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    cos = freqs_cis[None, :, None, :, 0].astype(jnp.float32)  # (1, T, 1, D//2)
    sin = freqs_cis[None, :, None, :, 1].astype(jnp.float32)
    x0, x1 = xs[..., 0], xs[..., 1]
    out = jnp.stack([x0 * cos - x1 * sin, x1 * cos + x0 * sin], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)
