"""Polyphase sinc resampling, matching torchaudio.functional.resample
(sinc_interp_hann, lowpass_filter_width=6, rolloff=0.99) — the resampler the
reference uses for the 44.1 kHz -> 16 kHz speaker-encoder branch
(evaluations/infer_arvc.py:276-278).

Expressed as a single strided conv (one MXU matmul per output block)."""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _kernel(orig_freq: int, new_freq: int, lowpass_filter_width: int = 6,
            rolloff: float = 0.99):
    """Returns (kernel (K, 1, up), width, up, down) for the polyphase conv."""
    gcd = math.gcd(orig_freq, new_freq)
    up = new_freq // gcd
    down = orig_freq // gcd
    base_freq = min(down, up) * rolloff
    width = int(np.ceil(lowpass_filter_width * down / base_freq))
    idx = np.arange(-width, width + down, dtype=np.float64)[None] / down
    t = np.arange(0, -up, -1, dtype=np.float64)[:, None] / up + idx
    t = np.clip(t * base_freq, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t = t * np.pi
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel = kernel * window * base_freq / down  # (up, K)
    return kernel.astype(np.float32).T[:, None, :], width, up, down


def resample(wav: jax.Array, orig_freq: int, new_freq: int) -> jax.Array:
    """wav (B, T) -> (B, ceil(T * new/orig)), torchaudio-equivalent."""
    if orig_freq == new_freq:
        return wav
    if wav.ndim == 1:
        wav = wav[None]
    kern, width, up, down = _kernel(orig_freq, new_freq)
    T = wav.shape[1]
    target_len = int(np.ceil(T * up / down))
    x = jnp.pad(wav.astype(jnp.float32), ((0, 0), (width, width + down)))
    y = jax.lax.conv_general_dilated(
        x[:, :, None],
        jnp.asarray(kern),
        window_strides=(down,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )  # (B, T//down(+1), up)
    return y.reshape(y.shape[0], -1)[:, :target_len]
