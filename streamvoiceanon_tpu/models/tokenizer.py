"""Causal BSQ content tokenizer ("speech_tokenizer").

encode: wav @44.1 kHz -> log-mel(160) -> ConvNeXt backbone ([128..512]) ->
downsample x4 -> window-limited transformer (8L, d512, window 512) -> 13-bit
binary spherical quantization -> content token ids (vocab 8192, ~21.5 Hz).

Behavior matches reference modules/vqgan/modules/firefly_encoder.py:510-598
(encode :553-566) with quantizer bsq_no_upsample.DownsampleBinarySphericalQuantize
(encode :103-107).  The full forward (post_module + distillation head, used
in ASR training) is also provided.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from streamvoiceanon_tpu.config import TokenizerConfig
from streamvoiceanon_tpu.models import convnext, windowed_transformer
from streamvoiceanon_tpu.ops import conv as convops
from streamvoiceanon_tpu.ops import quantizers, stft


def init(key, cfg: TokenizerConfig, dtype=jnp.float32, with_head: bool = False) -> Dict:
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    dims = cfg.quantizer.input_dim
    dkeys = jax.random.split(k2, len(cfg.quantizer.downsample_factor))
    down = [
        {
            "conv": convnext._conv_init(dkeys[i], f, dims, dims, dtype=dtype),
            "block": convnext.convnext_block_init(dkeys[i], dims, dtype=dtype),
        }
        for i, f in enumerate(cfg.quantizer.downsample_factor)
    ]
    p = {
        "backbone": convnext.convnext_encoder_init(k1, cfg.backbone, dtype),
        "downsample": down,
        "pre_module": windowed_transformer.init(k3, cfg.transformer, dtype),
        "post_module": windowed_transformer.init(k4, cfg.transformer, dtype),
        "lfq": quantizers.lfq_init(k5, dims, cfg.quantizer.codebook_bits, dtype),
    }
    if with_head:
        p["head"] = convnext.convnext_encoder_init(k6, cfg.head, dtype)
    return p


def _downsample(p, x: jax.Array, factors) -> jax.Array:
    for stage, f in zip(p, factors):
        x = convops.causal_conv1d(x, stage["conv"]["w"], stage["conv"]["b"], stride=f)
        x = convnext.convnext_block_apply(stage["block"], x)
    return x


def pre_quant_latents(params: Dict, cfg: TokenizerConfig, wav: jax.Array) -> jax.Array:
    """wav (B, T) -> pre-quantization latents (B, T // 2048, 512)."""
    mel = stft.log_mel_spectrogram(wav, cfg.mel)
    feat = convnext.convnext_encoder_apply(params["backbone"], cfg.backbone, mel)
    z = _downsample(params["downsample"], feat, cfg.quantizer.downsample_factor)
    return windowed_transformer.apply(params["pre_module"], cfg.transformer, z)


def encode(params: Dict, cfg: TokenizerConfig, wav: jax.Array) -> jax.Array:
    """wav (B, T) -> content token ids (B, T // 2048), vocab 8192.

    Equivalent of speech_tokenizer.encode(...)[0] (firefly_encoder.py:553-566
    -> bsq_no_upsample.py:103-107) for full-length audio."""
    z = pre_quant_latents(params, cfg, wav)
    return quantizers.lfq_encode(params["lfq"], z, cfg.quantizer.codebook_bits)


def quantized_latents(
    params: Dict, cfg: TokenizerConfig, wav: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Returns (quantized latents through post_module (B,T',512), indices)."""
    z = pre_quant_latents(params, cfg, wav)
    zq, idx = quantizers.lfq_quantize(params["lfq"], z, cfg.quantizer.codebook_bits)
    zq = windowed_transformer.apply(params["post_module"], cfg.transformer, zq)
    return zq, idx


def forward(
    params: Dict,
    cfg: TokenizerConfig,
    wav: jax.Array,
    target_len: Optional[int] = None,
    g: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict]:
    """Training forward (firefly_encoder.py:526-551): returns the
    distillation-head prediction of w2v-BERT features and the vq results."""
    zq, idx = quantized_latents(params, cfg, wav)
    x = zq
    if target_len is not None and target_len != x.shape[1]:
        # nearest-neighbor interpolate along time (F.interpolate mode="nearest")
        src_idx = (jnp.arange(target_len) * x.shape[1]) // target_len
        x = x[:, src_idx]
    pred = convnext.convnext_encoder_apply(params["head"], cfg.head, x, g=g)
    return pred, {"latents": zq, "codes": idx}
