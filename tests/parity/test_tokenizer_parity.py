"""Parity of the BSQ content tokenizer (backbone + windowed transformer +
LFQ) against the PyTorch reference with converted random weights."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from streamvoiceanon_tpu.config import (
    BSQConfig,
    ConvNeXtConfig,
    TokenizerConfig,
    WindowedTransformerConfig,
    replace,
)
from streamvoiceanon_tpu.models import tokenizer, windowed_transformer
from streamvoiceanon_tpu.runtime import convert

fireref = pytest.importorskip("modules.vqgan.modules.firefly")
from modules.vqgan.modules import bsq_no_upsample as bsqref  # noqa: E402
from modules.vqgan import windowed_transformer as wtref  # noqa: E402


def small_cfg():
    return replace(
        TokenizerConfig(),
        backbone=ConvNeXtConfig(
            input_channels=160, depths=(1, 1, 2, 1), dims=(16, 24, 32, 48)
        ),
        quantizer=BSQConfig(input_dim=48, n_groups=1, codebook_size=8192),
        transformer=WindowedTransformerConfig(
            block_size=256, n_layer=2, n_head=4, dim=48, intermediate_size=96,
            head_dim=12, window_size=8,
        ),
    )


@pytest.fixture(scope="module")
def ref_and_params():
    cfg = small_cfg()
    torch.manual_seed(0)
    tcfg = cfg.transformer

    def make_wt():
        margs = wtref.ModelArgs(
            block_size=tcfg.block_size, n_layer=tcfg.n_layer, n_head=tcfg.n_head,
            dim=tcfg.dim, intermediate_size=tcfg.intermediate_size,
            head_dim=tcfg.head_dim, rope_base=tcfg.rope_base,
            dropout_rate=0.0, attn_dropout_rate=0.0,
        )
        return wtref.WindowLimitedTransformer(
            margs, window_size=tcfg.window_size, causal=True
        )

    backbone = fireref.ConvNeXtEncoder(
        input_channels=cfg.backbone.input_channels,
        depths=list(cfg.backbone.depths),
        dims=list(cfg.backbone.dims),
        kernel_size=cfg.backbone.kernel_size,
    )
    quantizer = bsqref.DownsampleBinarySphericalQuantize(
        input_dim=cfg.quantizer.input_dim,
        n_groups=cfg.quantizer.n_groups,
        codebook_size=cfg.quantizer.codebook_size,
        downsample_factor=list(cfg.quantizer.downsample_factor),
        pre_module=make_wt(),
        post_module=make_wt(),
    )

    class Ref(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = backbone
            self.quantizer = quantizer

    ref = Ref().eval()
    params = convert.tokenizer(ref.state_dict(), cfg)
    return ref, params, cfg


@pytest.mark.parity
def test_windowed_transformer_parity(ref_and_params, rng):
    ref, params, cfg = ref_and_params
    x = rng.standard_normal((2, 48, 24)).astype(np.float32)
    with torch.no_grad():
        y_ref = ref.quantizer.pre_module(torch.from_numpy(x)).numpy()
    y = windowed_transformer.apply(
        params["pre_module"], cfg.transformer, jnp.asarray(np.swapaxes(x, 1, 2))
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(y), 1, 2), y_ref, atol=5e-4, rtol=1e-3
    )


@pytest.mark.parity
def test_tokenizer_encode_token_exact(ref_and_params, rng):
    """Token ids from wav must match the reference exactly (via our mel,
    validated separately against torch.stft semantics)."""
    ref, params, cfg = ref_and_params
    wav = (rng.standard_normal((1, 512 * 64)) * 0.2).astype(np.float32)

    from streamvoiceanon_tpu.ops import stft

    mel = stft.log_mel_spectrogram(jnp.asarray(wav), cfg.mel)
    with torch.no_grad():
        feats = ref.backbone(torch.from_numpy(np.swapaxes(np.asarray(mel), 1, 2)))
        idx_ref = ref.quantizer.encode(feats).numpy()  # (groups=1, B, T)

    tokens = tokenizer.encode(params, cfg, jnp.asarray(wav))
    assert tokens.shape == (1, 16)
    mismatch = (np.asarray(tokens) != idx_ref[0]).mean()
    assert mismatch == 0.0, f"token mismatch rate {mismatch}"


@pytest.mark.parity
def test_tokenizer_prefix_consistency(ref_and_params, rng):
    """Sliding-window re-encode (the reference's streaming strategy) must be
    prefix-consistent: tokens of a prefix == leading tokens of the full
    signal."""
    ref, params, cfg = ref_and_params
    wav = (rng.standard_normal((1, 512 * 64)) * 0.2).astype(np.float32)
    full = np.asarray(tokenizer.encode(params, cfg, jnp.asarray(wav)))
    half = np.asarray(tokenizer.encode(params, cfg, jnp.asarray(wav[:, : 512 * 32])))
    np.testing.assert_array_equal(full[:, :8], half[:, :8])


@pytest.mark.parity
def test_windowed_transformer_dwconv_parity(rng):
    """LConv1d depthwise-conv branch (windowed_transformer.py:197-234),
    enabled via dw_conv=True (off in the deployed tokenizer config)."""
    torch.manual_seed(1)
    tcfg = replace(
        small_cfg().transformer, dw_conv=True, conv_kernel_size=5
    )
    margs = wtref.ModelArgs(
        block_size=tcfg.block_size, n_layer=tcfg.n_layer, n_head=tcfg.n_head,
        dim=tcfg.dim, intermediate_size=tcfg.intermediate_size,
        head_dim=tcfg.head_dim, rope_base=tcfg.rope_base,
        dropout_rate=0.0, attn_dropout_rate=0.0,
        dw_conv=True, conv_kernel_size=tcfg.conv_kernel_size,
    )
    wt = wtref.WindowLimitedTransformer(
        margs, window_size=tcfg.window_size, causal=True
    ).eval()

    class Holder(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.m = wt

    params = convert.windowed_transformer(
        convert.to_numpy(Holder().state_dict()), tcfg, "m"
    )
    x = rng.standard_normal((2, 48, 24)).astype(np.float32)
    with torch.no_grad():
        y_ref = wt(torch.from_numpy(x)).numpy()
    y = windowed_transformer.apply(
        params, tcfg, jnp.asarray(np.swapaxes(x, 1, 2))
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(y), 1, 2), y_ref, atol=5e-4, rtol=1e-3
    )
