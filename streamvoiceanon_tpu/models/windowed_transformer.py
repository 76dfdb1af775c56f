"""Window-limited causal transformer (tokenizer pre/post module).

Behavior matches reference modules/vqgan/windowed_transformer.py:69-354:
RMSNorm -> attention (RoPE, window-limited causal mask) with LayerScale,
RMSNorm -> SwiGLU FFN with LayerScale, final RMSNorm.  Channels-last
(B, T, C); attention runs in fp32 softmax with 1/sqrt(head_dim) scale.

The streaming runtime re-encodes a sliding window (as the reference does —
infer_arvc.py:506-518 — its KV cache is unused in streaming), so this module
only needs the full-sequence form plus static masks.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from streamvoiceanon_tpu.config import WindowedTransformerConfig
from streamvoiceanon_tpu.ops.conv import conv1d
from streamvoiceanon_tpu.ops.norm import rms_norm
from streamvoiceanon_tpu.ops.rope import apply_rope, precompute_freqs_cis
from streamvoiceanon_tpu.ops.quantizers import linear_init


@functools.lru_cache(maxsize=8)
def window_limited_mask(length: int, window_size: Optional[int]) -> np.ndarray:
    """Causal mask additionally limited to `window_size` past positions
    (windowed_transformer.py:291-317).  True = attend."""
    row = np.arange(length)[:, None]
    col = np.arange(length)[None, :]
    mask = col <= row
    if window_size is not None:
        mask &= col >= np.maximum(row - window_size + 1, 0)
    return mask


def block_init(key, cfg: WindowedTransformerConfig, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(key, 9)
    d, h = cfg.dim, cfg.intermediate_size
    kv = cfg.n_head * cfg.head_dim
    p = {
        "wqkv": {"w": jax.random.normal(ks[0], (d, 3 * kv), dtype) * 0.02},
        "wo": {"w": jax.random.normal(ks[1], (cfg.n_head * cfg.head_dim, d), dtype) * 0.02},
        "attention_norm": {"w": jnp.ones((d,), dtype)},
        "ffn_norm": {"w": jnp.ones((d,), dtype)},
        "w1": {"w": jax.random.normal(ks[2], (d, h), dtype) * 0.02},
        "w3": {"w": jax.random.normal(ks[3], (d, h), dtype) * 0.02},
        "w2": {"w": jax.random.normal(ks[4], (h, d), dtype) * 0.02},
        "attn_scale": jnp.full((d,), cfg.layer_scale_init, dtype),
        "ffn_scale": jnp.full((d,), cfg.layer_scale_init, dtype),
    }
    if cfg.dw_conv:
        k = cfg.conv_kernel_size
        p["lconv"] = {
            "pre_norm": {"w": jnp.ones((d,), dtype)},
            "conv_norm": {"w": jnp.ones((d,), dtype)},
            "w_start": {"w": jax.random.normal(ks[5], (d, 2 * d), dtype) * 0.02},
            "dw": {"w": jax.random.normal(ks[6], (k, 1, d), dtype) * 0.02},
            "w_end": {"w": jax.random.normal(ks[7], (d, d), dtype) * 0.02},
            "scale": jnp.full((d,), cfg.layer_scale_init, dtype),
        }
    return p


def init(key, cfg: WindowedTransformerConfig, dtype=jnp.float32) -> Dict:
    keys = jax.random.split(key, cfg.n_layer)
    return {
        "layers": [block_init(k, cfg, dtype) for k in keys],
        "final_norm": {"w": jnp.ones((cfg.dim,), dtype)},
    }


def attention(
    p: Dict,
    cfg: WindowedTransformerConfig,
    x: jax.Array,
    freqs: jax.Array,
    mask: jax.Array,
) -> jax.Array:
    B, T, _ = x.shape
    H, D = cfg.n_head, cfg.head_dim
    qkv = x @ p["wqkv"]["w"] + p["wqkv"].get("b", 0.0)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = apply_rope(q.reshape(B, T, H, D), freqs)
    k = apply_rope(k.reshape(B, T, H, D), freqs)
    v = v.reshape(B, T, H, D)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.float32(D))
    scores = jnp.where(mask[None, None], scores, -jnp.inf)
    w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, T, H * D)
    return out @ p["wo"]["w"]


def lconv_apply(p: Dict, cfg: WindowedTransformerConfig, x: jax.Array) -> jax.Array:
    """Depthwise-conv (LConv1d) branch: RMS -> GLU -> causal depthwise conv
    -> RMS -> silu -> linear, LayerScale residual
    (windowed_transformer.py:197-234)."""
    y = rms_norm(x, p["pre_norm"]["w"], cfg.norm_eps)
    y = y @ p["w_start"]["w"]
    a, b = jnp.split(y, 2, axis=-1)
    y = a * jax.nn.sigmoid(b)  # F.glu(dim=-1)
    k = p["dw"]["w"].shape[0]
    y = jnp.pad(y, ((0, 0), (k - 1, 0), (0, 0)))  # manual causal left pad
    y = conv1d(y, p["dw"]["w"], groups=cfg.dim)
    y = rms_norm(y, p["conv_norm"]["w"], cfg.norm_eps)
    y = jax.nn.silu(y) @ p["w_end"]["w"]
    return x + p["scale"] * y


def block_apply(
    p: Dict, cfg: WindowedTransformerConfig, x: jax.Array, freqs: jax.Array, mask: jax.Array
) -> jax.Array:
    h = x + p["attn_scale"] * attention(
        p, cfg, rms_norm(x, p["attention_norm"]["w"], cfg.norm_eps), freqs, mask
    )
    if "lconv" in p:
        h = lconv_apply(p["lconv"], cfg, h)
    ff = rms_norm(h, p["ffn_norm"]["w"], cfg.norm_eps)
    ff = (jax.nn.silu(ff @ p["w1"]["w"]) * (ff @ p["w3"]["w"])) @ p["w2"]["w"]
    return h + p["ffn_scale"] * ff


def apply(params: Dict, cfg: WindowedTransformerConfig, x: jax.Array) -> jax.Array:
    """x: (B, T, dim) -> (B, T, dim), full-sequence window-limited causal."""
    T = x.shape[1]
    freqs = jnp.asarray(precompute_freqs_cis(T, cfg.head_dim, cfg.rope_base))
    mask = jnp.asarray(window_limited_mask(T, cfg.window_size))
    for lp in params["layers"]:
        x = block_apply(lp, cfg, x, freqs, mask)
    return rms_norm(x, params["final_norm"]["w"], cfg.norm_eps)
