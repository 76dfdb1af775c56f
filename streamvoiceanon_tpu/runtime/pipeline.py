"""Offline voice-conversion pipeline — the InferenceWrapper equivalent.

Ties the five models together exactly as the reference runtime does
(evaluations/infer_arvc.py:26-380): tokenize source/reference content,
encode the reference through the codec, compute (noise-mixed) speaker
embeddings from 16 kHz audio, run the dual-AR LM, vocode.

The pipeline object holds parameter pytrees + static configs; every compute
method is a thin wrapper over jitted pure functions.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from streamvoiceanon_tpu.audio import fbank as fbank_mod
from streamvoiceanon_tpu.audio.resample import resample
from streamvoiceanon_tpu.config import PipelineConfig, SamplingConfig
from streamvoiceanon_tpu.models import arvc, campplus, speaker_encoder, tokenizer, vocoder


def apply_noise_mixing(key: jax.Array, x: jax.Array, alpha: float) -> jax.Array:
    """alpha * x + (1 - alpha) * N(mean(x), std(x)) (infer_arvc.py:228-232)."""
    if alpha >= 1.0:
        return x
    mean, std = jnp.mean(x), jnp.std(x)
    noise = jax.random.normal(key, x.shape, x.dtype) * std + mean
    return alpha * x + (1.0 - alpha) * noise


@dataclass
class VoiceConverter:
    """Bundle of params + configs for the full conversion stack."""

    cfg: PipelineConfig
    tokenizer_params: Dict
    vocoder_params: Dict
    arvc_params: Dict
    campplus_params: Optional[Dict] = None
    speaker_params: Optional[Dict] = None

    def __post_init__(self):
        # pre-pack fused-kernel weight layouts OUTSIDE jit (re-packing
        # in-program would copy tens of MB per frame)
        hcfg = self.cfg.vocoder.head
        if hcfg.use_pallas_stream and "head_packed" not in self.vocoder_params:
            from streamvoiceanon_tpu.ops.pallas_hifigan import packed_weights

            vp = dict(self.vocoder_params)
            vp["head_packed"] = packed_weights(vp["head"], hcfg)
            self.vocoder_params = vp
        tcfg = self.cfg.tokenizer
        if tcfg.use_pallas_encoder and "enc_packed" not in self.tokenizer_params:
            from streamvoiceanon_tpu.ops.pallas_convnext_enc import (
                packed_weights as enc_packed_weights,
            )

            tp = dict(self.tokenizer_params)
            tp["enc_packed"] = enc_packed_weights(tp, tcfg)
            self.tokenizer_params = tp

    # ------------------------------------------------------------------
    # feature extraction
    # ------------------------------------------------------------------

    def content_tokens(self, wav: jax.Array) -> jax.Array:
        """wav (B, T) @44.1k -> content tokens (B, T // 2048)."""
        T = (wav.shape[-1] // self.cfg.samples_per_frame) * self.cfg.samples_per_frame
        return _encode_tokens(self.tokenizer_params, self.cfg, wav[..., :T])

    def audio_codes(self, wav: jax.Array) -> jax.Array:
        """wav (B, T) @44.1k -> codec codes (B, 8, T // 2048)."""
        T = (wav.shape[-1] // self.cfg.samples_per_frame) * self.cfg.samples_per_frame
        return _encode_codes(self.vocoder_params, self.cfg, wav[..., :T])

    def style_vector(self, wav16k: jax.Array) -> jax.Array:
        """CAMPPlus style vec from 16 kHz audio (infer_arvc.py:179-211)."""
        return _style_vector(self.campplus_params, self.cfg, wav16k)

    def timbre_latents(self, wav16k: jax.Array) -> jax.Array:
        """SparkTTS timbre latents (B, 32, 128) (infer_arvc.py:213-223)."""
        return _timbre_latents(self.speaker_params, self.cfg, wav16k)

    def speaker_embeddings(
        self,
        ref_wavs: Sequence[np.ndarray],
        alpha: float,
        key: jax.Array,
        collate: str = "concat_mel",
    ):
        """Multi-reference fusion + anonymization noise mixing
        (infer_arvc.py:282-322, 346-347).  Returns (style, timbre)."""
        k1, k2 = jax.random.split(key)
        if collate == "avg" and len(ref_wavs) > 1:
            styles, timbres = [], []
            for w in ref_wavs:
                w16 = resample(jnp.asarray(w)[None], self.cfg.sample_rate,
                               self.cfg.resample_rate)
                styles.append(self.style_vector(w16))
                timbres.append(self.timbre_latents(w16))
            style = jnp.mean(jnp.stack(styles), axis=0)
            timbre = jnp.mean(jnp.stack(timbres), axis=0)
        else:
            cat = jnp.concatenate([jnp.asarray(w) for w in ref_wavs])[None]
            w16 = resample(cat, self.cfg.sample_rate, self.cfg.resample_rate)
            style = self.style_vector(w16)
            timbre = self.timbre_latents(w16)
        return (
            apply_noise_mixing(k1, style, alpha),
            apply_noise_mixing(k2, timbre, alpha),
        )

    # ------------------------------------------------------------------
    # conversion
    # ------------------------------------------------------------------

    def infer(
        self,
        src_wav: np.ndarray,
        ref_wavs: Union[np.ndarray, Sequence[np.ndarray]],
        *,
        delay: int = 2,
        alpha: float = 1.0,
        key: Optional[jax.Array] = None,
        sampling: Optional[SamplingConfig] = None,
        collate: str = "concat_mel",
        ref_crop_lengths: Optional[Sequence[float]] = None,
    ) -> np.ndarray:
        """Offline conversion (infer_arvc.py:261-380).  Returns wav @44.1k."""
        if isinstance(ref_wavs, np.ndarray):
            ref_wavs = [ref_wavs]
        if ref_crop_lengths is not None:
            crops = (
                [ref_crop_lengths] * len(ref_wavs)
                if np.isscalar(ref_crop_lengths)
                else ref_crop_lengths
            )
            ref_wavs = [
                w[: int(c * self.cfg.sample_rate)] if c is not None else w
                for w, c in zip(ref_wavs, crops)
            ]
        key = jax.random.PRNGKey(0) if key is None else key
        sampling = sampling or self.cfg.sampling
        k_spk, k_gen = jax.random.split(key)

        style, timbre = self.speaker_embeddings(ref_wavs, alpha, k_spk, collate)

        ref_cat = jnp.concatenate([jnp.asarray(w) for w in ref_wavs])[None]
        src = jnp.asarray(src_wav)[None]
        ref_codes = self.audio_codes(ref_cat)
        ref_tokens = self.content_tokens(ref_cat)
        src_tokens = self.content_tokens(src)

        # shape bucketing so utterance lengths don't trigger recompiles:
        # crop the reference prompt down to a multiple of 8 frames (prompt
        # cropping is semantically free) and right-pad the source tokens up
        # to a multiple of 16 (causality makes the junk tail inert).
        Tr = max(ref_tokens.shape[1] // 8 * 8, min(8, ref_tokens.shape[1]))
        ref_tokens = ref_tokens[:, :Tr]
        ref_codes = ref_codes[:, :, :Tr]
        Ts = src_tokens.shape[1]
        Ts_pad = -(-Ts // 16) * 16
        src_tokens = jnp.pad(src_tokens, ((0, 0), (0, Ts_pad - Ts)))

        codes = _generate(
            self.arvc_params, self.cfg, ref_tokens, ref_codes, src_tokens,
            style, timbre, k_gen, sampling, delay,
        )
        wav = _vocode(self.vocoder_params, self.cfg, codes)
        return np.asarray(wav)[0, : Ts * self.cfg.samples_per_frame]


# ---------------------------------------------------------------------------
# jitted kernels (static configs via closure-free partial static args)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(1,))
def _style_vector(params, cfg: PipelineConfig, wav16k):
    feat = fbank_mod.fbank(wav16k)
    feat = feat - jnp.mean(feat, axis=1, keepdims=True)
    lens = jnp.full((feat.shape[0],), feat.shape[1] // 2, jnp.int32)
    return campplus.apply(params, cfg.campplus, feat, lens)


@functools.partial(jax.jit, static_argnums=(1,))
def _timbre_latents(params, cfg: PipelineConfig, wav16k):
    lens = jnp.full((wav16k.shape[0],), wav16k.shape[-1], jnp.int32)
    zq, _ = speaker_encoder.tokenize_wav(params, cfg.speaker, wav16k, lens)
    return zq


@functools.partial(jax.jit, static_argnums=(1,))
def _encode_tokens(params, cfg: PipelineConfig, wav):
    return tokenizer.encode(params, cfg.tokenizer, wav)


@functools.partial(jax.jit, static_argnums=(1,))
def _encode_codes(params, cfg: PipelineConfig, wav):
    return vocoder.encode(params, cfg.vocoder, wav)[0]


@functools.partial(jax.jit, static_argnums=(1,))
def _vocode(params, cfg: PipelineConfig, codes):
    return vocoder.decode(params, cfg.vocoder, codes)


@functools.partial(jax.jit, static_argnums=(1, 8, 9))
def _generate(params, cfg: PipelineConfig, ref_tokens, ref_codes, src_tokens,
              style, timbre, key, sampling: SamplingConfig, delay: int):
    return arvc.generate(
        params, cfg.arvc, ref_tokens, ref_codes, src_tokens, style, timbre,
        key, sampling, delay,
    )
