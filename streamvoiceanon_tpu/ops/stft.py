"""Causal STFT / log-mel front end.

Reproduces the reference's spectral semantics (modules/vqgan/spectrogram.py:7-130):
left-pad `win - hop` zeros, non-centered frames, periodic Hann window,
`sqrt(re^2 + im^2 + 1e-6)` magnitude, slaney-scale/slaney-norm mel filter bank,
`log(clamp(x, 1e-5))` compression.

TPU-first design: instead of an FFT, the windowed DFT is a single strided
convolution with a precomputed `(win, 1, 2*n_bins)` kernel — one MXU matmul per
hop — and the mel projection is a second matmul.  Static shapes throughout;
wav length must be a multiple of `hop` for streaming use.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from streamvoiceanon_tpu.config import MelConfig


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window, matching torch.hann_window(win, periodic=True)."""
    n = np.arange(win_length)
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))


def _hz_to_mel_slaney(freq: np.ndarray) -> np.ndarray:
    f_sp = 200.0 / 3
    mels = freq / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(
        freq >= min_log_hz,
        min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep,
        mels,
    )


def _mel_to_hz_slaney(mels: np.ndarray) -> np.ndarray:
    f_sp = 200.0 / 3
    freqs = mels * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(
        mels >= min_log_mel,
        min_log_hz * np.exp(logstep * (mels - min_log_mel)),
        freqs,
    )


def mel_filterbank(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_mels: int,
    sample_rate: int,
) -> np.ndarray:
    """Slaney-scale, slaney-normalized triangular mel filter bank.

    Matches torchaudio.functional.melscale_fbanks(norm="slaney",
    mel_scale="slaney").  Returns (n_freqs, n_mels), float32.
    """
    all_freqs = np.linspace(0.0, sample_rate // 2, n_freqs)
    m_min = _hz_to_mel_slaney(np.array(f_min))
    m_max = _hz_to_mel_slaney(np.array(f_max))
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz_slaney(m_pts)

    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down_slopes = -slopes[:, :-2] / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))

    enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
    fb = fb * enorm[None, :]
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _dft_kernel(n_fft: int, win_length: int) -> np.ndarray:
    """Windowed real-DFT as a conv kernel of shape (n_fft, 1, 2*n_bins).

    Output channels are [real_0..real_{K-1}, imag_0..imag_{K-1}] where
    K = n_fft//2 + 1.  The window (center-padded to n_fft when win_length <
    n_fft, as torch.stft does) is fused into the kernel.
    """
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    win = hann_window(win_length)
    lpad = (n_fft - win_length) // 2
    win = np.pad(win, (lpad, n_fft - win_length - lpad))[:, None]
    real = (np.cos(ang) * win).astype(np.float32)
    imag = (-np.sin(ang) * win).astype(np.float32)
    kern = np.concatenate([real, imag], axis=1)  # (n_fft, 2*n_bins)
    return kern[:, None, :]  # (n_fft, 1, 2*n_bins)


@functools.lru_cache(maxsize=8)
def _mel_matrix(cfg: MelConfig) -> np.ndarray:
    return mel_filterbank(
        cfg.n_fft // 2 + 1, cfg.f_min, cfg.fmax, cfg.n_mels, cfg.sample_rate
    )


def linear_spectrogram(
    wav: jax.Array, cfg: MelConfig, *, causal_pad: bool = True,
    center: bool = False, pow2_sqrt_eps: bool = None
) -> jax.Array:
    """Magnitude spectrogram of shape (B, frames, n_bins).

    `causal_pad` left-pads `win - hop` zeros (spectrogram.py:38-45); with it,
    frames = T // hop for T a multiple of hop.  `center` instead reflect-pads
    n_fft//2 on both sides (torch.stft center=True semantics, used by the
    SparkTTS speaker-encoder mel front end).
    """
    if wav.ndim == 1:
        wav = wav[None]
    if wav.ndim != 2:
        raise ValueError(
            f"expected mono audio of shape (T,) or (B, T), got {wav.shape}; "
            "mix multi-channel audio down to mono first"
        )
    x = wav.astype(jnp.float32)
    if causal_pad and center:
        raise ValueError("causal_pad and center are mutually exclusive")
    if causal_pad:
        x = jnp.pad(x, ((0, 0), (cfg.win_length - cfg.hop_length, 0)))
    elif center:
        x = jnp.pad(x, ((0, 0), (cfg.n_fft // 2, cfg.n_fft // 2)), mode="reflect")
    kern = jnp.asarray(_dft_kernel(cfg.n_fft, cfg.win_length))
    spec = jax.lax.conv_general_dilated(
        x[:, :, None],
        kern,
        window_strides=(cfg.hop_length,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )  # (B, frames, 2*n_bins)
    n_bins = cfg.n_fft // 2 + 1
    re, im = spec[..., :n_bins], spec[..., n_bins:]
    # pow2_sqrt mode adds 1e-6 (spectrogram.py:63); the center-mode speaker
    # front end does not.  Default follows causal_pad, but streaming callers
    # that supply their own context (causal_pad=False) still need the eps.
    if pow2_sqrt_eps is None:
        pow2_sqrt_eps = causal_pad
    eps = 1e-6 if pow2_sqrt_eps else 0.0
    return jnp.sqrt(re * re + im * im + eps)


def mel_spectrogram_center(wav: jax.Array, cfg: MelConfig) -> jax.Array:
    """torchaudio.transforms.MelSpectrogram(power=1, norm/mel_scale=slaney,
    center=True) equivalent — the SparkTTS speaker-encoder front end
    (configs/hydra_arcs/sv/sparktts_speaker_encoder.yaml).  (B, frames, n_mels)."""
    spec = linear_spectrogram(wav, cfg, causal_pad=False, center=True)
    fb = jnp.asarray(_mel_matrix(cfg))
    return jnp.einsum("btf,fm->btm", spec, fb, preferred_element_type=jnp.float32)


def log_mel_spectrogram(
    wav: jax.Array, cfg: MelConfig, *, causal_pad: bool = True,
    pow2_sqrt_eps: bool = True
) -> jax.Array:
    """Causal log-mel features, shape (B, frames, n_mels)."""
    spec = linear_spectrogram(wav, cfg, causal_pad=causal_pad,
                              pow2_sqrt_eps=pow2_sqrt_eps)
    fb = jnp.asarray(_mel_matrix(cfg))
    mel = jnp.einsum(
        "btf,fm->btm", spec, fb, preferred_element_type=jnp.float32
    )
    return jnp.log(jnp.clip(mel, min=1e-5))
