"""Lookup-free (binary spherical) and finite scalar quantizers.

Functional re-implementations of the two quantizer families the reference
uses (behavior-matched, independently written):

* LFQ / BSQ — content tokenizer, 13-bit binary spherical quantization
  (reference modules/vqgan/modules/bsq.py:128-496; GroupedResidualBSQ
  :498-569).  Indices are the sign pattern of a 13-d projection; codes are
  l2-normalized ±1 vectors projected back out.
* FSQ / ResidualFSQ / GroupedResidualFSQ — vocoder codec, 8 groups x
  levels (8,5,5,5) => 8 codebooks of 1000 (reference
  modules/vqgan/modules/fsq.py:19-116 and
  modules/bicodec_speaker_encoder/fsq/{finite_scalar_quantization,residual_fsq}.py).

Everything is shape-static and jit-friendly; params are plain dict pytrees.
The codebook decode paths are pure gathers/matmuls (MXU/VPU-friendly); no
Python loops over time.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _linear(p: Dict, x: jax.Array) -> jax.Array:
    y = x @ p["w"]
    if "b" in p and p["b"] is not None:
        y = y + p["b"]
    return y


def linear_init(key, d_in, d_out, bias=True, dtype=jnp.float32) -> Dict:
    kw, _ = jax.random.split(key)
    w = jax.random.normal(kw, (d_in, d_out), dtype) * 0.02
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


# ---------------------------------------------------------------------------
# LFQ (binary spherical quantization)
# ---------------------------------------------------------------------------


def lfq_init(key, dim: int, codebook_bits: int, dtype=jnp.float32) -> Dict:
    k1, k2 = jax.random.split(key)
    return {
        "project_in": linear_init(k1, dim, codebook_bits, dtype=dtype),
        "project_out": linear_init(k2, codebook_bits, dim, dtype=dtype),
    }


def lfq_encode(params: Dict, x: jax.Array, codebook_bits: int) -> jax.Array:
    """x: (B, T, dim) -> int32 indices (B, T).

    Index bit d (MSB first) is 1 iff projection dim d is positive
    (bsq.py:362-369: quantize by sign, indices = sum(bits * 2^(B-1-d)))."""
    h = _linear(params["project_in"], x).astype(jnp.float32)
    mask = jnp.asarray(
        np.power(2, np.arange(codebook_bits - 1, -1, -1)), jnp.int32
    )
    bits = (h > 0).astype(jnp.int32)
    return jnp.sum(bits * mask, axis=-1)


def lfq_indices_to_codes(
    params: Dict, indices: jax.Array, codebook_bits: int
) -> jax.Array:
    """indices (B, T) -> codes (B, T, dim): ±1 bits, l2-normalized, projected
    out (bsq.py:261-301; spherical=True, codebook_scale=1)."""
    mask = jnp.asarray(
        np.power(2, np.arange(codebook_bits - 1, -1, -1)), jnp.int32
    )
    bits = ((indices[..., None] & mask) != 0).astype(jnp.float32)
    codes = bits * 2.0 - 1.0
    codes = codes / jnp.sqrt(jnp.float32(codebook_bits))  # l2norm of ±1 vector
    return _linear(params["project_out"], codes)


def lfq_quantize(params: Dict, x: jax.Array, codebook_bits: int) -> Tuple[jax.Array, jax.Array]:
    """Eval-mode forward: returns (quantized_out (B,T,dim), indices (B,T))."""
    h = _linear(params["project_in"], x).astype(jnp.float32)
    mask = jnp.asarray(
        np.power(2, np.arange(codebook_bits - 1, -1, -1)), jnp.int32
    )
    bits = (h > 0).astype(jnp.int32)
    indices = jnp.sum(bits * mask, axis=-1)
    q = jnp.where(h > 0, 1.0, -1.0) / jnp.sqrt(jnp.float32(codebook_bits))
    return _linear(params["project_out"], q), indices


def lfq_soft_entropy_loss(
    h: jax.Array, tau: float = 1.0, gamma: float = 1.0,
    axis_name: str | None = None,
) -> jax.Array:
    """BSQ soft entropy aux loss (bsq.py:94-124).  h: (N, L) pre-sign latents
    (already l2-normalized in the reference call path).

    Under data parallelism pass `axis_name` (inside shard_map/pmap): the
    codebook-usage distribution is pmean'd across devices before the
    diversity entropy term, matching the reference's all_reduce of avg_prob
    (bsq.py:37-43,427-431).  The per-sample term stays local — its global
    mean emerges from the data-parallel gradient average, as in DDP."""
    L = h.shape[-1]
    corners = jnp.asarray([-1.0, 1.0]) / jnp.sqrt(jnp.float32(L))
    prob = jax.nn.sigmoid(2.0 * tau * corners[None, None, :] * h[..., None])
    ent_per_dim = -jnp.sum(prob * jnp.log(jnp.clip(prob, min=1e-20)), axis=-1)
    term1 = jnp.mean(ent_per_dim)
    expected = jnp.mean(prob.reshape(-1, L, 2), axis=0)
    if axis_name is not None:
        expected = jax.lax.pmean(expected, axis_name)
    term2 = jnp.mean(-jnp.sum(expected * jnp.log(jnp.clip(expected, min=1e-20)), axis=-1))
    return term1 - gamma * term2


# ---------------------------------------------------------------------------
# FSQ
# ---------------------------------------------------------------------------


def _fsq_consts(levels: Sequence[int]):
    lv = np.asarray(levels, np.int32)
    basis = np.concatenate([[1], np.cumprod(lv[:-1])]).astype(np.int32)
    half_width = lv // 2
    return lv, basis, half_width


def fsq_bound(z: jax.Array, levels: Sequence[int], eps: float = 1e-3) -> jax.Array:
    lv = jnp.asarray(levels, jnp.float32)
    half_l = (lv - 1.0) * (1.0 + eps) / 2.0
    offset = jnp.where(jnp.asarray(levels) % 2 == 0, 0.5, 0.0)
    shift = jnp.arctanh(offset / half_l)
    return jnp.tanh(z + shift) * half_l - offset


def fsq_quantize(z: jax.Array, levels: Sequence[int]) -> jax.Array:
    """Round-to-grid, renormalized to [-1, 1] (finite_scalar_quantization.py:133-137)."""
    _, _, half_width = _fsq_consts(levels)
    q = jnp.round(fsq_bound(z.astype(jnp.float32), levels))
    return q / jnp.asarray(half_width, jnp.float32)


def fsq_codes_to_indices(codes: jax.Array, levels: Sequence[int]) -> jax.Array:
    lv, basis, half_width = _fsq_consts(levels)
    zint = codes * jnp.asarray(half_width, jnp.float32) + jnp.asarray(
        half_width, jnp.float32
    )
    return jnp.sum(zint * jnp.asarray(basis, jnp.float32), axis=-1).astype(jnp.int32)


def fsq_indices_to_codes(indices: jax.Array, levels: Sequence[int]) -> jax.Array:
    lv, basis, half_width = _fsq_consts(levels)
    level_idx = (indices[..., None] // jnp.asarray(basis)) % jnp.asarray(lv)
    hw = jnp.asarray(half_width, jnp.float32)
    return (level_idx.astype(jnp.float32) - hw) / hw


# ---------------------------------------------------------------------------
# ResidualFSQ (with in/out projections), and grouped wrapper
# ---------------------------------------------------------------------------


def residual_fsq_init(
    key, dim: int, levels: Sequence[int], num_quantizers: int, dtype=jnp.float32
) -> Dict:
    codebook_dim = len(levels)
    p = {}
    if codebook_dim != dim:
        k1, k2 = jax.random.split(key)
        p["project_in"] = linear_init(k1, dim, codebook_dim, dtype=dtype)
        p["project_out"] = linear_init(k2, codebook_dim, dim, dtype=dtype)
    return p


def _rfsq_scales(levels: Sequence[int], num_quantizers: int) -> np.ndarray:
    lv = np.asarray(levels, np.float64)
    return np.stack(
        [(lv - 1.0) ** (-float(i)) for i in range(num_quantizers)]
    ).astype(np.float32)


def residual_fsq_encode(
    params: Dict, x: jax.Array, levels: Sequence[int], num_quantizers: int
) -> Tuple[jax.Array, jax.Array]:
    """x: (B, T, dim) -> (quantized_out (B,T,dim), indices (B,T,Q)).

    Residual quantization loop (residual_fsq.py:158-239): each layer quantizes
    residual / scale_i on the FSQ grid, scales back, subtracts."""
    h = _linear(params["project_in"], x) if "project_in" in params else x
    h = h.astype(jnp.float32)
    scales = _rfsq_scales(levels, num_quantizers)
    residual = h
    quantized_out = jnp.zeros_like(h)
    idx_list = []
    for i in range(num_quantizers):
        s = jnp.asarray(scales[i])
        codes = fsq_quantize(residual / s, levels)
        idx_list.append(fsq_codes_to_indices(codes, levels))
        q = codes * s
        residual = residual - q
        quantized_out = quantized_out + q
    out = (
        _linear(params["project_out"], quantized_out)
        if "project_out" in params
        else quantized_out
    )
    return out, jnp.stack(idx_list, axis=-1)


def residual_fsq_decode(
    params: Dict, indices: jax.Array, levels: Sequence[int], num_quantizers: int
) -> jax.Array:
    """indices (B, T, Q) -> (B, T, dim) (residual_fsq.py:153-156)."""
    scales = _rfsq_scales(levels, num_quantizers)
    total = 0.0
    for i in range(num_quantizers):
        codes = fsq_indices_to_codes(indices[..., i], levels)
        total = total + codes * jnp.asarray(scales[i])
    return _linear(params["project_out"], total) if "project_out" in params else total


def grouped_residual_fsq_init(
    key, dim: int, groups: int, levels: Sequence[int], num_quantizers: int, dtype=jnp.float32
) -> Dict:
    keys = jax.random.split(key, groups)
    return {
        f"group_{g}": residual_fsq_init(
            keys[g], dim // groups, levels, num_quantizers, dtype
        )
        for g in range(groups)
    }


def grouped_residual_fsq_encode(
    params: Dict,
    x: jax.Array,
    groups: int,
    levels: Sequence[int],
    num_quantizers: int,
) -> Tuple[jax.Array, jax.Array]:
    """x: (B, T, dim) -> (quantized (B,T,dim), indices (B, T, groups*Q)).

    The flattened codebook axis matches the reference's
    `rearrange(indices, 'g b l r -> b (g r) l')` layout (fsq.py:106-110) up to
    the trailing-time transpose handled by callers."""
    chunks = jnp.split(x, groups, axis=-1)
    outs, idxs = [], []
    for g in range(groups):
        o, i = residual_fsq_encode(
            params[f"group_{g}"], chunks[g], levels, num_quantizers
        )
        outs.append(o)
        idxs.append(i)
    return jnp.concatenate(outs, axis=-1), jnp.concatenate(idxs, axis=-1)


def grouped_residual_fsq_decode(
    params: Dict,
    indices: jax.Array,
    groups: int,
    levels: Sequence[int],
    num_quantizers: int,
) -> jax.Array:
    """indices (B, T, groups*Q) -> (B, T, dim)."""
    per = jnp.split(indices, groups, axis=-1)
    outs = [
        residual_fsq_decode(params[f"group_{g}"], per[g], levels, num_quantizers)
        for g in range(groups)
    ]
    return jnp.concatenate(outs, axis=-1)
