"""Parity of the SparkTTS/BiCodec timbre encoder (ECAPA + Perceiver +
ResidualFSQ) against the PyTorch reference."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import refstubs

refstubs.install()

from streamvoiceanon_tpu.config import SpeakerEncoderConfig
from streamvoiceanon_tpu.models import speaker_encoder
from streamvoiceanon_tpu.ops import quantizers, stft

ecapa_ref = pytest.importorskip("modules.bicodec_speaker_encoder.ecapa_tdnn")
from modules.bicodec_speaker_encoder import perceiver_encoder as pe_ref  # noqa: E402
from modules.bicodec_speaker_encoder.fsq import residual_fsq as rfsq_ref  # noqa: E402

CFG = SpeakerEncoderConfig()


@pytest.fixture(scope="module")
def ref_and_params():
    torch.manual_seed(0)

    class Ref(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.speaker_encoder = ecapa_ref.ECAPA_TDNN_GLOB_c512(
                feat_dim=CFG.input_dim, embed_dim=1024
            )
            self.perceiver_sampler = pe_ref.PerceiverResampler(
                dim=CFG.latent_dim, dim_context=512 * 3, num_latents=CFG.token_num
            )
            self.quantizer = rfsq_ref.ResidualFSQ(
                levels=list(CFG.fsq_levels),
                num_quantizers=CFG.fsq_num_quantizers,
                dim=CFG.latent_dim,
                is_channel_first=True,
                quantize_dropout=False,
            )

    ref = Ref().eval()
    params = speaker_encoder.convert(ref.state_dict(), CFG)
    return ref, params


@pytest.mark.parity
def test_ecapa_latent_parity(ref_and_params, rng):
    ref, params = ref_and_params
    mel = rng.standard_normal((2, 100, 128)).astype(np.float32)
    with torch.no_grad():
        _, latent_ref = ref.speaker_encoder(torch.from_numpy(mel), True)
    lat = speaker_encoder.ecapa_latents(params["ecapa"], jnp.asarray(mel))
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(lat), 1, 2), latent_ref.numpy(), atol=2e-3, rtol=1e-3
    )


@pytest.mark.parity
def test_full_tokenize_parity(ref_and_params, rng):
    """From mel features through perceiver + FSQ: latents and indices match
    the reference tokenize path with a padding mask."""
    ref, params = ref_and_params
    mel = rng.standard_normal((2, 80, 128)).astype(np.float32) * 0.5
    wav_lens = np.array([80 * CFG.hop_length, 60 * CFG.hop_length])
    with torch.no_grad():
        _, feats = ref.speaker_encoder(torch.from_numpy(mel), True)
        mel_lens = torch.from_numpy(wav_lens) // CFG.hop_length
        T = feats.shape[2]
        mask = (
            torch.arange(T + 32)[None, :] < (mel_lens + 32)[:, None]
        )
        x = ref.perceiver_sampler(feats.transpose(1, 2), mask=mask).transpose(1, 2)
        zq_ref, idx_ref = ref.quantizer(x)  # (B, 128, 32), (B, 32, 1)

    feats_j = speaker_encoder.ecapa_latents(params["ecapa"], jnp.asarray(mel))
    mask_j = jnp.asarray(mask.numpy())
    lat = speaker_encoder.perceiver(params["perceiver"], CFG, feats_j, mask_j)
    zq, idx = quantizers.residual_fsq_encode(
        params["fsq"], lat, CFG.fsq_levels, CFG.fsq_num_quantizers
    )
    # reference is_channel_first returns indices as (B, Q, T); ours is (B, T, Q)
    np.testing.assert_array_equal(
        np.asarray(idx), np.swapaxes(idx_ref.numpy(), 1, 2)
    )
    np.testing.assert_allclose(
        np.asarray(zq), np.swapaxes(zq_ref.numpy(), 1, 2), atol=2e-3, rtol=1e-3
    )


def test_mel_center_matches_torch_semantics(rng):
    """mel_spectrogram_center vs a numpy transcription of
    torchaudio.transforms.MelSpectrogram(center=True, power=1)."""
    cfg = speaker_encoder.mel_config(CFG)
    wav = (rng.standard_normal((1, 16000)) * 0.3).astype(np.float32)
    ours = np.asarray(stft.mel_spectrogram_center(jnp.asarray(wav), cfg))

    x = np.pad(wav, ((0, 0), (cfg.n_fft // 2, cfg.n_fft // 2)), mode="reflect")
    win = stft.hann_window(cfg.win_length)
    lpad = (cfg.n_fft - cfg.win_length) // 2
    win = np.pad(win, (lpad, cfg.n_fft - cfg.win_length - lpad))
    n_frames = (x.shape[1] - cfg.n_fft) // cfg.hop_length + 1
    frames = np.stack(
        [x[:, i * cfg.hop_length : i * cfg.hop_length + cfg.n_fft] for i in range(n_frames)],
        axis=1,
    )
    spec = np.abs(np.fft.rfft(frames * win, axis=-1))
    fb = stft.mel_filterbank(cfg.n_fft // 2 + 1, cfg.f_min, cfg.fmax, cfg.n_mels,
                             cfg.sample_rate)
    golden = spec @ fb
    assert ours.shape == golden.shape == (1, 16000 // 320 + 1, 128)
    np.testing.assert_allclose(ours, golden, atol=1e-3, rtol=1e-3)


@pytest.mark.parity
def test_x_vector_parity(ref_and_params, rng):
    """Pooled x-vector head (ASTP global-context + BN + linear) — the
    reference forward()'s first output (ecapa_tdnn.py:191-206).  Unused by
    the timbre path but part of the published checkpoint; the key-coverage
    contract requires it be consumed AND correct."""
    ref, params = ref_and_params
    mel = rng.standard_normal((2, 100, 128)).astype(np.float32)
    with torch.no_grad():
        xv_ref, _ = ref.speaker_encoder(torch.from_numpy(mel), True)
    xv = speaker_encoder.x_vector(params, jnp.asarray(mel))
    np.testing.assert_allclose(np.asarray(xv), xv_ref.numpy(), atol=5e-3, rtol=1e-3)
