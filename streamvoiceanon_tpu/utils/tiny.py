"""Tiny-geometry full pipeline (random weights) shared by integration tests.

Topology matches the real model family exactly (same layer kinds, same code
paths); only widths/depths are shrunk so CPU tests stay fast.
"""

import jax
import jax.numpy as jnp

from streamvoiceanon_tpu.config import (
    ARVCConfig,
    BSQConfig,
    ConvNeXtConfig,
    DualARConfig,
    FSQConfig,
    HiFiGANConfig,
    PipelineConfig,
    SamplingConfig,
    StreamConfig,
    TokenizerConfig,
    VocoderConfig,
    replace,
)
from streamvoiceanon_tpu.models import arvc, dual_ar, tokenizer, vocoder
from streamvoiceanon_tpu.runtime.pipeline import VoiceConverter


def tiny_config(**stream_kw) -> PipelineConfig:
    backbone = ConvNeXtConfig(
        input_channels=160, depths=(1, 1, 1, 1), dims=(16, 16, 24, 32)
    )
    tok = replace(
        TokenizerConfig(),
        backbone=backbone,
        quantizer=BSQConfig(input_dim=32, codebook_size=8192),
        transformer=replace(
            TokenizerConfig().transformer,
            n_layer=1, n_head=2, dim=32, intermediate_size=64, head_dim=16,
            window_size=64,
        ),
    )
    voc = replace(
        VocoderConfig(),
        backbone=backbone,
        quantizer=FSQConfig(input_dim=32, n_groups=8, levels=(8, 5, 5, 5)),
        head=HiFiGANConfig(
            num_mels=32, upsample_initial_channel=32,
            pre_conv_kernel_size=7, post_conv_kernel_size=7,
        ),
    )
    dcfg = DualARConfig(
        vocab_size=8192, n_layer=2, n_head=2, dim=32, intermediate_size=64,
        head_dim=16, max_seq_len=512, codebook_size=1000, num_codebooks=8,
        n_fast_layer=1, fast_dim=32, fast_n_head=2, fast_head_dim=16,
        fast_intermediate_size=64,
    )
    acfg = ARVCConfig(decoder=dcfg, context_dim=128, style_dim=192, model_dim=32)
    return replace(
        PipelineConfig(),
        tokenizer=tok, vocoder=voc, arvc=acfg,
        stream=StreamConfig(**stream_kw) if stream_kw else StreamConfig(),
        sampling=SamplingConfig(greedy=True),
    )


def _random_arvc(key, cfg: ARVCConfig):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    d = cfg.decoder
    return {
        "embedding": jax.random.normal(k1, (d.vocab_size, d.dim)) * 0.02,
        "context_in": {
            "w": jax.random.normal(k2, (cfg.context_dim, cfg.model_dim)) * 0.02,
            "b": jnp.zeros((cfg.model_dim,)),
        },
        "style_in": {
            "w": jax.random.normal(k3, (cfg.style_dim, cfg.model_dim)) * 0.02,
            "b": jnp.zeros((cfg.model_dim,)),
        },
        "model": dual_ar.prepare_params(dual_ar.random_params(k4, d)),
        "wait4start": jax.random.normal(k5, (8, d.dim)) * 0.02,
        "wait4end": jax.random.normal(k5, (8, d.dim)) * 0.02,
    }


def tiny_converter(seed: int = 0, **stream_kw) -> VoiceConverter:
    cfg = tiny_config(**stream_kw)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    return VoiceConverter(
        cfg=cfg,
        tokenizer_params=tokenizer.init(k1, cfg.tokenizer),
        vocoder_params=vocoder.init(k2, cfg.vocoder),
        arvc_params=_random_arvc(k3, cfg.arvc),
    )
