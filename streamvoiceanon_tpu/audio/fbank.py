"""Kaldi-compatible log-mel filterbank features.

Matches torchaudio.compliance.kaldi.fbank with the arguments used by the
reference CAMPPlus front end (evaluations/infer_arvc.py:186-191):
num_mel_bins=80, dither=0, sample_frequency=16000, and the kaldi defaults —
25 ms povey-windowed frames every 10 ms, snip_edges, DC removal,
pre-emphasis 0.97, 512-point power spectrum, HTK-mel triangle bank
(low 20 Hz, high nyquist), natural log with epsilon floor.

Implemented as frame-extraction + two matmuls (DFT, mel) — MXU-shaped.
"""

from __future__ import annotations

import functools
import math
import sys

import jax
import jax.numpy as jnp
import numpy as np


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def povey_window(n: int) -> np.ndarray:
    i = np.arange(n)
    return (0.5 - 0.5 * np.cos(2 * np.pi * i / (n - 1))) ** 0.85


def _mel(hz):
    return 1127.0 * np.log(1.0 + np.asarray(hz, np.float64) / 700.0)


@functools.lru_cache(maxsize=4)
def kaldi_mel_banks(
    num_bins: int, padded_window_size: int, sample_freq: float,
    low_freq: float = 20.0, high_freq: float = 0.0,
) -> np.ndarray:
    """Kaldi mel banks (n_fft//2+1, num_bins) — torchaudio get_mel_banks.
    (Kaldi computes num_fft_bins = padded//2 weights and ignores nyquist.)"""
    if high_freq <= 0.0:
        high_freq = sample_freq / 2 + high_freq
    num_fft_bins = padded_window_size // 2
    fft_bin_width = sample_freq / padded_window_size
    mel_low = _mel(low_freq)
    mel_high = _mel(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)
    mel = _mel(fft_bin_width * np.arange(num_fft_bins))[None, :]  # (1, F)
    left = mel_low + np.arange(num_bins)[:, None] * mel_delta
    center = left + mel_delta
    right = center + mel_delta
    up = (mel - left) / mel_delta
    down = (right - mel) / mel_delta
    fb = np.maximum(0.0, np.minimum(up, down))
    out = np.zeros((num_fft_bins + 1, num_bins), np.float32)
    out[:num_fft_bins] = fb.T
    return out


@functools.lru_cache(maxsize=4)
def _dft_mats(padded: int):
    n = np.arange(padded)[:, None]
    k = np.arange(padded // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / padded
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def fbank(
    wav: jax.Array,
    sample_frequency: int = 16000,
    num_mel_bins: int = 80,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    preemphasis: float = 0.97,
    remove_dc_offset: bool = True,
) -> jax.Array:
    """wav (B, T) float in [-1, 1] -> (B, frames, num_mel_bins)."""
    if wav.ndim == 1:
        wav = wav[None]
    win = int(sample_frequency * frame_length_ms / 1000)  # 400
    hop = int(sample_frequency * frame_shift_ms / 1000)  # 160
    padded = _next_pow2(win)  # 512
    x = wav.astype(jnp.float32)
    B, T = x.shape
    m = 1 + (T - win) // hop  # snip_edges=True

    # frame extraction: (B, m, win)
    frames = jax.lax.conv_general_dilated_patches(
        x[:, :, None],
        filter_shape=(win,),
        window_strides=(hop,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    ).reshape(B, m, win)

    if remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if preemphasis != 0.0:
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - preemphasis * prev
    frames = frames * jnp.asarray(povey_window(win), jnp.float32)
    frames = jnp.pad(frames, ((0, 0), (0, 0), (0, padded - win)))

    cos_m, sin_m = _dft_mats(padded)
    re = jnp.einsum("bmw,wk->bmk", frames, jnp.asarray(cos_m),
                    preferred_element_type=jnp.float32)
    im = jnp.einsum("bmw,wk->bmk", frames, jnp.asarray(sin_m),
                    preferred_element_type=jnp.float32)
    power = re * re + im * im  # (B, m, padded//2+1)

    mel_fb = jnp.asarray(kaldi_mel_banks(num_mel_bins, padded, float(sample_frequency)))
    mel = jnp.einsum("bmk,kn->bmn", power, mel_fb, preferred_element_type=jnp.float32)
    return jnp.log(jnp.maximum(mel, sys.float_info.epsilon))
