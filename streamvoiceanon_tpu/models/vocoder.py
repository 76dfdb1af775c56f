"""Firefly codec (fish-speech 1.5 style): the acoustic tokenizer + vocoder.

encode: wav @44.1 kHz -> log-mel(160) -> ConvNeXt backbone -> downsample x4
        -> grouped-residual FSQ -> 8 codebooks of 1000 per 46.4 ms frame
decode: codes -> FSQ output -> upsample x4 -> HiFiGAN -> wav

Behavior matches reference modules/vqgan/modules/firefly.py:520-607 (encode
:561-574, decode :576-595) and fsq.py:19-116; everything is channels-last and
shape-static.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from streamvoiceanon_tpu.config import VocoderConfig
from streamvoiceanon_tpu.models import convnext, hifigan
from streamvoiceanon_tpu.ops import conv as convops
from streamvoiceanon_tpu.ops import quantizers, stft


def init(key, cfg: VocoderConfig, dtype=jnp.float32) -> Dict:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    nf = cfg.quantizer.downsample_factor
    dims = cfg.quantizer.input_dim
    down, up = [], []
    dkeys = jax.random.split(k3, len(nf))
    ukeys = jax.random.split(k4, len(nf))
    for i, f in enumerate(nf):
        down.append(
            {
                "conv": convnext._conv_init(dkeys[i], f, dims, dims, dtype=dtype),
                "block": convnext.convnext_block_init(dkeys[i], dims, dtype=dtype),
            }
        )
        up.append(
            {
                "conv": convnext._conv_init(ukeys[i], f, dims, dims, dtype=dtype),
                "block": convnext.convnext_block_init(ukeys[i], dims, dtype=dtype),
            }
        )
    return {
        "backbone": convnext.convnext_encoder_init(k1, cfg.backbone, dtype),
        "head": hifigan.hifigan_init(k2, cfg.head, dtype),
        "downsample": down,
        "upsample": up,
        "fsq": quantizers.grouped_residual_fsq_init(
            k5,
            cfg.quantizer.input_dim,
            cfg.quantizer.n_groups,
            cfg.quantizer.levels,
            cfg.quantizer.n_codebooks,
            dtype,
        ),
    }


def _downsample(p: Dict, x: jax.Array, factors) -> jax.Array:
    for stage, f in zip(p, factors):
        x = convops.causal_conv1d(x, stage["conv"]["w"], stage["conv"]["b"], stride=f)
        x = convnext.convnext_block_apply(stage["block"], x)
    return x


def _upsample(p: Dict, x: jax.Array, factors) -> jax.Array:
    # reference iterates reversed(enumerate(factors)) building the Sequential,
    # so stage order at apply time is factors reversed (fsq.py:61-74)
    for stage, f in zip(p, reversed(factors)):
        x = convops.fish_trans_conv1d(x, stage["conv"]["w"], stage["conv"]["b"], stride=f)
        x = convnext.convnext_block_apply(stage["block"], x)
    return x


def encode(params: Dict, cfg: VocoderConfig, wav: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """wav (B, T) -> (codes (B, n_codebooks, T//2048), quantized latents).

    Equivalent of FireflyArchitecture.encode + DownsampleFSQ.encode for
    full-length (unmasked) audio."""
    mel = stft.log_mel_spectrogram(wav, cfg.mel)
    feat = convnext.convnext_encoder_apply(params["backbone"], cfg.backbone, mel)
    z = _downsample(params["downsample"], feat, cfg.quantizer.downsample_factor)
    quantized, idx = quantizers.grouped_residual_fsq_encode(
        params["fsq"], z, cfg.quantizer.n_groups, cfg.quantizer.levels,
        cfg.quantizer.n_codebooks,
    )
    # idx: (B, T', groups * nq) -> (B, groups * nq, T') to match the
    # reference's "b (g r) l" code layout (fsq.py:109)
    return jnp.swapaxes(idx, 1, 2), quantized


def decode_codes(params: Dict, cfg: VocoderConfig, codes: jax.Array) -> jax.Array:
    """codes (B, n_codebooks, T') -> quantizer output (B, T' * 4, 512)
    (fsq.py:112-116: get_output_from_indices + upsample)."""
    idx = jnp.swapaxes(codes, 1, 2)
    z = quantizers.grouped_residual_fsq_decode(
        params["fsq"], idx, cfg.quantizer.n_groups, cfg.quantizer.levels,
        cfg.quantizer.n_codebooks,
    )
    return _upsample(params["upsample"], z, cfg.quantizer.downsample_factor)


def decode(params: Dict, cfg: VocoderConfig, codes: jax.Array) -> jax.Array:
    """codes (B, n_codebooks, T') -> wav (B, T' * 2048).

    Equivalent of `firefly.head(firefly.quantizer.decode(code))`
    (infer_arvc.py:173-176 code2wav_fn)."""
    z = decode_codes(params, cfg, codes)
    return hifigan.hifigan_apply(params["head"], cfg.head, z)


# ---------------------------------------------------------------------------
# Incremental streaming decode
# ---------------------------------------------------------------------------
#
# The reference streams the vocoder by re-decoding a rolling 64-frame code
# window per 1-frame chunk (infer_arvc.py:567-596) — ~64x redundant compute.
# Because every conv on the decode path is causal, we instead carry input
# tails for each conv and decode only the new frames; the output is exactly
# prefix-consistent with the offline decode (tested).


def init_stream_state(params: Dict, cfg: VocoderConfig, batch: int = 1,
                      dtype=jnp.float32) -> Dict:
    from streamvoiceanon_tpu.models.convnext import convnext_block_init_stream
    from streamvoiceanon_tpu.ops import conv as convops

    up = []
    for stage, f in zip(params["upsample"], reversed(cfg.quantizer.downsample_factor)):
        cin = stage["conv"]["w"].shape[1]
        up.append(
            {
                "conv": convops.fish_trans_conv1d_init_state(
                    batch, cin, stage["conv"]["w"].shape[0], f, dtype=dtype
                ),
                "block": convnext_block_init_stream(stage["block"], batch, dtype),
            }
        )
    return {
        "upsample": up,
        "head": hifigan.hifigan_init_stream(params["head"], cfg.head, batch, dtype),
    }


def convert_head_layout(state: Dict, hcfg, target_batch: int = 0) -> Dict:
    """Migrate the HiFiGAN head streaming state between the dict-of-tails
    layout and the fused kernel's PackedHeadState, per hcfg.use_pallas_stream
    (used by StreamSession.transfer).  `target_batch` overrides the state's
    own batch in the packed-eligibility check (StreamSession.fanout: the
    packed kernel is B=1-only, so a B>1 target unpacks first)."""
    from streamvoiceanon_tpu.ops import pallas_hifigan as ph

    head = state["head"]
    batch = target_batch or (head.pre.shape[0] if hasattr(head, "pre")
                             else head["conv_pre"].tail.shape[0])
    want_packed = hcfg.use_pallas_stream and batch == 1 and all(
        k == 2 * s for k, s in zip(hcfg.upsample_kernel_sizes, hcfg.upsample_rates)
    )
    if want_packed and not isinstance(head, ph.PackedHeadState):
        return {**state, "head": ph.pack_head_state(head, hcfg)}
    if not want_packed and isinstance(head, ph.PackedHeadState):
        return {**state, "head": ph.unpack_head_state(head, hcfg)}
    return state


def decode_stream(params: Dict, cfg: VocoderConfig, state: Dict, codes: jax.Array):
    """Streaming decode: (state, codes (B, nq, k)) -> (state', wav (B, k*2048))."""
    from streamvoiceanon_tpu.models.convnext import convnext_block_apply_stream
    from streamvoiceanon_tpu.ops import conv as convops

    idx = jnp.swapaxes(codes, 1, 2)
    head = state["head"]
    head_dtype = (head.pre.dtype if hasattr(head, "pre")  # PackedHeadState
                  else head["conv_pre"].tail.dtype)
    z = quantizers.grouped_residual_fsq_decode(
        params["fsq"], idx, cfg.quantizer.n_groups, cfg.quantizer.levels,
        cfg.quantizer.n_codebooks,
    ).astype(head_dtype)
    new_up = []
    for stage, st, f in zip(params["upsample"], state["upsample"],
                            reversed(cfg.quantizer.downsample_factor)):
        cs, z = convops.fish_trans_conv1d_stream(
            st["conv"], z, stage["conv"]["w"], stage["conv"]["b"], stride=f
        )
        bs, z = convnext_block_apply_stream(stage["block"], st["block"], z)
        new_up.append({"conv": cs, "block": bs})
    hs, wav = hifigan.hifigan_apply_stream(
        params["head"], cfg.head, state["head"], z,
        packed_w=params.get("head_packed"))
    return {"upsample": new_up, "head": hs}, wav
