"""Causal ConvNeXt encoder (channels-last, functional).

Behavior matches the reference ConvNeXtBlock/ConvNeXtEncoder
(modules/vqgan/modules/firefly.py:375-517): causal depthwise conv (k=7),
LayerNorm over channels, pointwise MLP with exact GELU, LayerScale gamma,
residual; stem = causal conv + LN, stage transitions = LN + 1x1 conv.

All sequence tensors are (B, T, C).  Dropout/DropPath are inference no-ops
(drop_path_rate only matters in training, where it is applied stochastically
per sample by the trainer).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from streamvoiceanon_tpu.config import ConvNeXtConfig
from streamvoiceanon_tpu.ops import conv as convops
from streamvoiceanon_tpu.ops.norm import layer_norm
from streamvoiceanon_tpu.ops.quantizers import linear_init


def _conv_init(key, k, cin, cout, groups=1, std=0.02, dtype=jnp.float32):
    w = jax.random.truncated_normal(key, -2, 2, (k, cin // groups, cout), dtype) * std
    return {"w": w, "b": jnp.zeros((cout,), dtype)}


def convnext_block_init(key, dim: int, mlp_ratio: float = 4.0,
                        layer_scale_init: float = 1e-6, kernel_size: int = 7,
                        dtype=jnp.float32) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    hidden = int(mlp_ratio * dim)
    return {
        "dwconv": _conv_init(k1, kernel_size, dim, dim, groups=dim, dtype=dtype),
        "norm": {"w": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)},
        "pwconv1": linear_init(k2, dim, hidden, dtype=dtype),
        "pwconv2": linear_init(k3, hidden, dim, dtype=dtype),
        "gamma": jnp.full((dim,), layer_scale_init, dtype),
    }


def convnext_block_apply(p: Dict, x: jax.Array, *, apply_residual: bool = True) -> jax.Array:
    """x: (B, T, C) -> (B, T, C) (firefly.py:421-440)."""
    h = convops.causal_conv1d(x, p["dwconv"]["w"], p["dwconv"]["b"],
                              groups=x.shape[-1])
    h = layer_norm(h, p["norm"]["w"], p["norm"]["b"], eps=1e-6)
    h = h @ p["pwconv1"]["w"] + p["pwconv1"]["b"]
    h = jax.nn.gelu(h, approximate=False)
    h = h @ p["pwconv2"]["w"] + p["pwconv2"]["b"]
    if p.get("gamma") is not None:
        h = h * p["gamma"]
    return x + h if apply_residual else h


def convnext_block_init_stream(p: Dict, batch: int, dtype=jnp.float32) -> convops.ConvState:
    """Streaming state (dwconv input tail) for one block."""
    k, _, dim = p["dwconv"]["w"].shape
    return convops.causal_conv1d_init_state(batch, dim, k, dtype=dtype)


def convnext_block_apply_stream(
    p: Dict, state: convops.ConvState, x: jax.Array
):
    """Streaming form of convnext_block_apply (pointwise ops are stateless;
    only the depthwise conv carries a tail)."""
    state, h = convops.causal_conv1d_stream(
        state, x, p["dwconv"]["w"], p["dwconv"]["b"], groups=x.shape[-1]
    )
    h = layer_norm(h, p["norm"]["w"], p["norm"]["b"], eps=1e-6)
    h = h @ p["pwconv1"]["w"] + p["pwconv1"]["b"]
    h = jax.nn.gelu(h, approximate=False)
    h = h @ p["pwconv2"]["w"] + p["pwconv2"]["b"]
    if p.get("gamma") is not None:
        h = h * p["gamma"]
    return state, x + h


def convnext_encoder_init(key, cfg: ConvNeXtConfig, dtype=jnp.float32) -> Dict:
    keys = jax.random.split(key, 64)
    ki = iter(keys)
    params: Dict = {}
    params["stem_conv"] = _conv_init(next(ki), 7, cfg.input_channels, cfg.dims[0], dtype=dtype)
    params["stem_norm"] = {"w": jnp.ones((cfg.dims[0],), dtype), "b": jnp.zeros((cfg.dims[0],), dtype)}
    for i in range(len(cfg.depths) - 1):
        params[f"mid_norm_{i}"] = {"w": jnp.ones((cfg.dims[i],), dtype), "b": jnp.zeros((cfg.dims[i],), dtype)}
        params[f"mid_conv_{i}"] = _conv_init(next(ki), 1, cfg.dims[i], cfg.dims[i + 1], dtype=dtype)
    for i, depth in enumerate(cfg.depths):
        params[f"stage_{i}"] = [
            convnext_block_init(next(ki), cfg.dims[i],
                                layer_scale_init=cfg.layer_scale_init_value,
                                kernel_size=cfg.kernel_size, dtype=dtype)
            for _ in range(depth)
        ]
    params["final_norm"] = {"w": jnp.ones((cfg.dims[-1],), dtype), "b": jnp.zeros((cfg.dims[-1],), dtype)}
    if cfg.gin_channels > 0:
        params["g_in"] = _conv_init(next(ki), 1, cfg.gin_channels, cfg.input_channels, dtype=dtype)
    return params


def convnext_encoder_apply(
    p: Dict, cfg: ConvNeXtConfig, x: jax.Array, g: Optional[jax.Array] = None
) -> jax.Array:
    """x: (B, T, C_in) -> (B, T, dims[-1]) (firefly.py:506-517).

    `g` is an optional (B, 1, gin_channels) global conditioning vector added
    to the input through a 1x1 conv (firefly.py:498,511-512)."""
    if g is not None and "g_in" in p:
        x = x + (g @ p["g_in"]["w"][0] + p["g_in"]["b"])
    for i in range(len(cfg.depths)):
        if i == 0:
            x = convops.causal_conv1d(x, p["stem_conv"]["w"], p["stem_conv"]["b"])
            x = layer_norm(x, p["stem_norm"]["w"], p["stem_norm"]["b"], eps=1e-6)
        else:
            x = layer_norm(x, p[f"mid_norm_{i-1}"]["w"], p[f"mid_norm_{i-1}"]["b"], eps=1e-6)
            x = x @ p[f"mid_conv_{i-1}"]["w"][0] + p[f"mid_conv_{i-1}"]["b"]
        for blk in p[f"stage_{i}"]:
            x = convnext_block_apply(blk, x)
    return layer_norm(x, p["final_norm"]["w"], p["final_norm"]["b"], eps=1e-6)
