"""End-to-end parity of the Firefly codec (vocoder) against the PyTorch
reference with randomly initialized weights converted through
runtime/convert.py."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from streamvoiceanon_tpu.config import VocoderConfig
from streamvoiceanon_tpu.models import convnext, hifigan, vocoder
from streamvoiceanon_tpu.runtime import convert

import refstubs

refstubs.install()

fireref = pytest.importorskip("modules.vqgan.modules.firefly")
from modules.vqgan.modules import fsq as fsqref  # noqa: E402

CFG = VocoderConfig()


def small_cfg():
    """Tiny geometry for fast tests, same topology as the real model."""
    from streamvoiceanon_tpu.config import ConvNeXtConfig, FSQConfig, HiFiGANConfig, replace

    return replace(
        CFG,
        backbone=ConvNeXtConfig(
            input_channels=160, depths=(1, 1, 2, 1), dims=(16, 24, 32, 48)
        ),
        quantizer=FSQConfig(input_dim=48, n_groups=8, n_codebooks=1),
        head=HiFiGANConfig(
            num_mels=48,
            upsample_rates=(8, 8, 2, 2, 2),
            upsample_kernel_sizes=(16, 16, 4, 4, 4),
            upsample_initial_channel=64,
            pre_conv_kernel_size=13,
            post_conv_kernel_size=13,
        ),
    )


@pytest.fixture(scope="module")
def ref_and_params():
    cfg = small_cfg()
    torch.manual_seed(0)
    backbone = fireref.ConvNeXtEncoder(
        input_channels=cfg.backbone.input_channels,
        depths=list(cfg.backbone.depths),
        dims=list(cfg.backbone.dims),
        kernel_size=cfg.backbone.kernel_size,
    )
    head = fireref.HiFiGANGenerator(
        hop_length=512,
        upsample_rates=tuple(cfg.head.upsample_rates),
        upsample_kernel_sizes=tuple(cfg.head.upsample_kernel_sizes),
        resblock_kernel_sizes=tuple(cfg.head.resblock_kernel_sizes),
        resblock_dilation_sizes=tuple(
            tuple(d) for d in cfg.head.resblock_dilation_sizes
        ),
        num_mels=cfg.head.num_mels,
        upsample_initial_channel=cfg.head.upsample_initial_channel,
        pre_conv_kernel_size=cfg.head.pre_conv_kernel_size,
        post_conv_kernel_size=cfg.head.post_conv_kernel_size,
    )
    quantizer = fsqref.DownsampleFiniteScalarQuantize(
        input_dim=cfg.quantizer.input_dim,
        n_codebooks=cfg.quantizer.n_codebooks,
        n_groups=cfg.quantizer.n_groups,
        levels=list(cfg.quantizer.levels),
        downsample_factor=list(cfg.quantizer.downsample_factor),
    )

    class Ref(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = backbone
            self.head = head
            self.quantizer = quantizer

    ref = Ref().eval()
    sd = ref.state_dict()
    params = convert.vocoder(sd, cfg)
    return ref, params, cfg


@pytest.mark.parity
def test_backbone_parity(ref_and_params, rng):
    ref, params, cfg = ref_and_params
    mel = rng.standard_normal((2, 160, 24)).astype(np.float32)
    with torch.no_grad():
        y_ref = ref.backbone(torch.from_numpy(mel)).numpy()
    y = convnext.convnext_encoder_apply(
        params["backbone"], cfg.backbone, jnp.asarray(np.swapaxes(mel, 1, 2))
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(y), 1, 2), y_ref, atol=2e-4, rtol=1e-3
    )


@pytest.mark.parity
def test_fsq_encode_decode_parity(ref_and_params, rng):
    ref, params, cfg = ref_and_params
    z = rng.standard_normal((2, cfg.quantizer.input_dim, 16)).astype(np.float32)
    with torch.no_grad():
        idx_ref, _ = ref.quantizer.encode(torch.from_numpy(z))
        zq_ref = ref.quantizer.decode(idx_ref).numpy()

    zj = jnp.asarray(np.swapaxes(z, 1, 2))
    zd = vocoder._downsample(
        params["downsample"], zj, cfg.quantizer.downsample_factor
    )
    # reference downsample output must agree before quantization
    with torch.no_grad():
        zd_ref = ref.quantizer.downsample(torch.from_numpy(z)).numpy()
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(zd), 1, 2), zd_ref, atol=2e-4, rtol=1e-3
    )

    from streamvoiceanon_tpu.ops import quantizers as q

    _, idx = q.grouped_residual_fsq_encode(
        params["fsq"], zd, cfg.quantizer.n_groups, cfg.quantizer.levels,
        cfg.quantizer.n_codebooks,
    )
    codes = np.swapaxes(np.asarray(idx), 1, 2)
    np.testing.assert_array_equal(codes, idx_ref.numpy())

    zq = vocoder.decode_codes(params, cfg, jnp.asarray(codes))
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(zq), 1, 2), zq_ref, atol=2e-4, rtol=1e-3
    )


@pytest.mark.parity
def test_hifigan_parity(ref_and_params, rng):
    ref, params, cfg = ref_and_params
    x = rng.standard_normal((1, cfg.head.num_mels, 12)).astype(np.float32) * 0.5
    with torch.no_grad():
        y_ref = ref.head(torch.from_numpy(x)).numpy()  # (1, 1, T*512)
    y = hifigan.hifigan_apply(params["head"], cfg.head, jnp.asarray(np.swapaxes(x, 1, 2)))
    assert y.shape == (1, 12 * 512)
    np.testing.assert_allclose(np.asarray(y), y_ref[:, 0], atol=2e-4, rtol=1e-3)


@pytest.mark.parity
def test_full_decode_parity(ref_and_params, rng):
    """codes -> wav equals the reference's code2wav_fn path."""
    ref, params, cfg = ref_and_params
    codes = rng.integers(0, 1000, (1, 8, 10)).astype(np.int64)
    with torch.no_grad():
        wav_ref = ref.head(ref.quantizer.decode(torch.from_numpy(codes))).numpy()
    wav = vocoder.decode(params, cfg, jnp.asarray(codes.astype(np.int32)))
    assert wav.shape == (1, 10 * 2048)
    np.testing.assert_allclose(np.asarray(wav), wav_ref[:, 0], atol=5e-4, rtol=1e-3)
