"""Causal HiFiGAN generator head (channels-last, functional).

Behavior matches reference modules/vqgan/modules/firefly.py:149-301:
conv_pre (causal k=13) -> [silu -> FishTransConv up -> ParallelBlock] per
stage -> silu -> conv_post -> tanh.  ParallelBlock averages three ResBlocks
(k = 3, 7, 11); each ResBlock is 3x (silu -> dilated causal conv -> silu ->
dilated causal conv) with residual, dilations (1, 3, 5) on *both* convs
(firefly.py:140-190 — note convs2 is dilated too, unlike classic HiFiGAN).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from streamvoiceanon_tpu.config import HiFiGANConfig
from streamvoiceanon_tpu.ops import conv as convops


def _conv_init(key, k, cin, cout, std=0.02, dtype=jnp.float32):
    w = jax.random.truncated_normal(key, -2, 2, (k, cin, cout), dtype) * std
    return {"w": w, "b": jnp.zeros((cout,), dtype)}


def resblock_init(key, channels: int, kernel: int, dilations, dtype=jnp.float32) -> Dict:
    keys = jax.random.split(key, 2 * len(dilations))
    return {
        "convs1": [
            _conv_init(keys[2 * i], kernel, channels, channels, dtype=dtype)
            for i in range(len(dilations))
        ],
        "convs2": [
            _conv_init(keys[2 * i + 1], kernel, channels, channels, dtype=dtype)
            for i in range(len(dilations))
        ],
    }


def resblock_apply(p: Dict, x: jax.Array, dilations) -> jax.Array:
    for c1, c2, d in zip(p["convs1"], p["convs2"], dilations):
        h = jax.nn.silu(x)
        h = convops.causal_conv1d(h, c1["w"], c1["b"], dilation=d)
        h = jax.nn.silu(h)
        h = convops.causal_conv1d(h, c2["w"], c2["b"], dilation=d)
        x = x + h
    return x


def hifigan_init(key, cfg: HiFiGANConfig, dtype=jnp.float32) -> Dict:
    keys = jax.random.split(key, 64)
    ki = iter(keys)
    p: Dict = {
        "conv_pre": _conv_init(
            next(ki), cfg.pre_conv_kernel_size, cfg.num_mels,
            cfg.upsample_initial_channel, dtype=dtype,
        )
    }
    ch = cfg.upsample_initial_channel
    p["ups"] = []
    p["resblocks"] = []
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        cin = cfg.upsample_initial_channel // (2**i)
        cout = cfg.upsample_initial_channel // (2 ** (i + 1))
        p["ups"].append(_conv_init(next(ki), k, cin, cout, dtype=dtype))
        p["resblocks"].append(
            [
                resblock_init(next(ki), cout, rk, rd, dtype=dtype)
                for rk, rd in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
            ]
        )
        ch = cout
    p["conv_post"] = _conv_init(next(ki), cfg.post_conv_kernel_size, ch, 1, dtype=dtype)
    return p


def hifigan_init_stream(p: Dict, cfg: HiFiGANConfig, batch: int = 1,
                        dtype=jnp.float32) -> Dict:
    """Streaming state: input tails for every conv / transposed conv.

    With cfg.use_pallas_stream (and the supported k == 2*stride upsample
    geometry) the state is the fused kernel's PackedHeadState instead."""
    if cfg.use_pallas_stream and batch == 1 and all(
        k == 2 * s for k, s in zip(cfg.upsample_kernel_sizes, cfg.upsample_rates)
    ):
        from streamvoiceanon_tpu.ops.pallas_hifigan import init_packed_state

        return init_packed_state(cfg, batch, dtype)

    def cs(conv_p, dilation=1):
        k, cin, _ = conv_p["w"].shape
        return convops.causal_conv1d_init_state(batch, cin, k, dilation=dilation,
                                                dtype=dtype)

    state: Dict = {"conv_pre": cs(p["conv_pre"]), "ups": [], "res": []}
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        cin = p["ups"][i]["w"].shape[1]
        state["ups"].append(
            convops.fish_trans_conv1d_init_state(batch, cin, k, u, dtype=dtype)
        )
        blocks = []
        for rb, rd in zip(p["resblocks"][i], cfg.resblock_dilation_sizes):
            blocks.append(
                {
                    "convs1": [cs(c, d) for c, d in zip(rb["convs1"], rd)],
                    "convs2": [cs(c, d) for c, d in zip(rb["convs2"], rd)],
                }
            )
        state["res"].append(blocks)
    state["conv_post"] = cs(p["conv_post"])
    return state


def resblock_apply_stream(p: Dict, state: Dict, x: jax.Array, dilations):
    new1, new2 = [], []
    for c1, c2, s1, s2, d in zip(p["convs1"], p["convs2"], state["convs1"],
                                 state["convs2"], dilations):
        h = jax.nn.silu(x)
        s1, h = convops.causal_conv1d_stream(s1, h, c1["w"], c1["b"], dilation=d)
        h = jax.nn.silu(h)
        s2, h = convops.causal_conv1d_stream(s2, h, c2["w"], c2["b"], dilation=d)
        x = x + h
        new1.append(s1)
        new2.append(s2)
    return {"convs1": new1, "convs2": new2}, x


def hifigan_apply_stream(p: Dict, cfg: HiFiGANConfig, state, x: jax.Array,
                         packed_w=None):
    """Streaming form: (state, (B, T, num_mels)) -> (state', (B, T * hop)).
    Exactly prefix-consistent with hifigan_apply (causal convs only).

    PackedHeadState routes through the fused Pallas kernel at batch 1
    (pass `packed_w` = ops.pallas_hifigan.packed_weights(p, cfg), prepared
    outside jit, to avoid re-packing weights in-program); batched input
    unpacks to this XLA path and repacks."""
    from streamvoiceanon_tpu.ops import pallas_hifigan as ph

    if isinstance(state, ph.PackedHeadState):
        if x.shape[0] == 1:
            from streamvoiceanon_tpu.models.dual_ar import _pallas_interpret

            pw = packed_w if packed_w is not None else ph.packed_weights(p, cfg)
            return ph.head_stream_step(pw, state, x, cfg,
                                       interpret=_pallas_interpret())
        d = ph.unpack_head_state(state, cfg)
        nd, wav = hifigan_apply_stream(p, cfg, d, x)
        return ph.pack_head_state(nd, cfg), wav

    new_state: Dict = {"ups": [], "res": []}
    new_state["conv_pre"], x = convops.causal_conv1d_stream(
        state["conv_pre"], x, p["conv_pre"]["w"], p["conv_pre"]["b"]
    )
    for i, stride in enumerate(cfg.upsample_rates):
        x = jax.nn.silu(x)
        us, x = convops.fish_trans_conv1d_stream(
            state["ups"][i], x, p["ups"][i]["w"], p["ups"][i]["b"], stride=stride
        )
        new_state["ups"].append(us)
        branches = []
        bstates = []
        for rb, rs, rd in zip(p["resblocks"][i], state["res"][i],
                              cfg.resblock_dilation_sizes):
            ns, y = resblock_apply_stream(rb, rs, x, rd)
            branches.append(y)
            bstates.append(ns)
        x = sum(branches) / len(branches)
        new_state["res"].append(bstates)
    x = jax.nn.silu(x)
    new_state["conv_post"], x = convops.causal_conv1d_stream(
        state["conv_post"], x, p["conv_post"]["w"], p["conv_post"]["b"]
    )
    return new_state, jnp.tanh(x)[..., 0]


def hifigan_apply(p: Dict, cfg: HiFiGANConfig, x: jax.Array) -> jax.Array:
    """x: (B, T, num_mels) -> waveform (B, T * hop_length) in [-1, 1]."""
    x = convops.causal_conv1d(x, p["conv_pre"]["w"], p["conv_pre"]["b"])
    for i, stride in enumerate(cfg.upsample_rates):
        x = jax.nn.silu(x)
        x = convops.fish_trans_conv1d(x, p["ups"][i]["w"], p["ups"][i]["b"], stride=stride)
        branches = [
            resblock_apply(rb, x, rd)
            for rb, rd in zip(p["resblocks"][i], cfg.resblock_dilation_sizes)
        ]
        x = sum(branches) / len(branches)
    x = jax.nn.silu(x)
    x = convops.causal_conv1d(x, p["conv_post"]["w"], p["conv_post"]["b"])
    return jnp.tanh(x)[..., 0]
