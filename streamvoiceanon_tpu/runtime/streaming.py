"""Streaming voice-conversion runtime.

Reproduces the reference's chunk state machine
(evaluations/infer_arvc.py:443-689: setup_stream_caches, prefill_prompt,
process_one_chunk, stream_infer) as a set of fixed-shape jitted programs
coordinated by a tiny host-side session object:

* rolling 128-frame wav window re-encoded per chunk (the reference's
  streaming strategy for the tokenizer, :495-518);
* 2-token KV-cache decode per frame (models/arvc.decode_one);
* 64-frame vocoder window seeded from the reference prompt's code tail, so
  early chunks are left-padded with reference codes exactly like :567-571;
* periodic prompt refill when the LM position reaches max_seq_frames
  (:547-564) — scheduled host-side (the position trajectory is
  deterministic), so no data-dependent branching enters the compiled code.

Every per-chunk program has a single static shape: one compile per
(chunk geometry), none per chunk index.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from streamvoiceanon_tpu.config import PipelineConfig, SamplingConfig, StreamConfig
from streamvoiceanon_tpu.models import arvc, tokenizer, vocoder


@functools.partial(jax.jit, static_argnums=(1,))
def _encode_window(params, cfg: PipelineConfig, wav_window):
    return tokenizer.encode(params, cfg.tokenizer, wav_window)


@functools.partial(jax.jit, static_argnums=(1,))
def _vocode_window(params, cfg: PipelineConfig, code_window):
    return vocoder.decode(params, cfg.vocoder, code_window)


@functools.partial(jax.jit, static_argnums=(1, 5, 6))
def _decode_frames(params, cfg: PipelineConfig, state, tokens_k, key,
                   sampling: SamplingConfig, k: int):
    """k sequential decode_one steps (process_one_chunk :534-537)."""

    def step(carry, tok):
        st, kk = carry
        kk, sub = jax.random.split(kk)
        st, codes = arvc.decode_one(params, cfg.arvc, st, tok[:, None], sub, sampling)
        return (st, kk), codes

    (state, _), codes = jax.lax.scan(step, (state, key), jnp.swapaxes(tokens_k, 0, 1))
    return state, jnp.transpose(codes, (1, 2, 0))  # (B, nq, k)


class StreamSession:
    """One real-time conversion stream.

    Usage:
        sess = StreamSession(converter, stream_cfg, ref_wavs, key=...)
        for chunk in chunks_of_2048_samples:
            out = sess.process_chunk(chunk)   # (2048 * k,) samples
    """

    def __init__(
        self,
        converter,
        scfg: Optional[StreamConfig] = None,
        ref_wavs=None,
        *,
        key: Optional[jax.Array] = None,
        sampling: Optional[SamplingConfig] = None,
        style: Optional[jax.Array] = None,
        timbre: Optional[jax.Array] = None,
        ref_tokens: Optional[jax.Array] = None,
        ref_codes: Optional[jax.Array] = None,
    ):
        self.cv = converter
        self.cfg: PipelineConfig = converter.cfg
        self.scfg = scfg or self.cfg.stream
        self.sampling = sampling or self.cfg.sampling
        self.key = jax.random.PRNGKey(0) if key is None else key
        self.spf = self.cfg.samples_per_frame
        self.delay = self.scfg.delay

        # ---- prompt computation (prefill_prompt, infer_arvc.py:463-489)
        if ref_wavs is not None:
            self.key, k_spk = jax.random.split(self.key)
            style, timbre = self.cv.speaker_embeddings(
                ref_wavs if isinstance(ref_wavs, (list, tuple)) else [ref_wavs],
                self.scfg.alpha, k_spk,
            )
            cat = jnp.concatenate(
                [jnp.asarray(w) for w in
                 (ref_wavs if isinstance(ref_wavs, (list, tuple)) else [ref_wavs])]
            )[None]
            ref_codes = self.cv.audio_codes(cat)
            ref_tokens = self.cv.content_tokens(cat)
        assert ref_tokens is not None and ref_codes is not None
        mp = self.scfg.max_prompt_frames
        self.ref_tokens = ref_tokens[:, :mp]
        self.ref_codes = ref_codes[:, :, :mp]
        self.style = style
        self.timbre = timbre
        self.Tp = self.ref_tokens.shape[1]

        self.state = arvc.prefill_prompt(
            self.cv.arvc_params, self.cfg.arvc, self.ref_tokens, self.ref_codes,
            style, timbre, delay=self.delay,
        )

        # ---- stream caches (setup_stream_caches, :443-461)
        k = self.scfg.decode_chunk_frames
        self.wav_window = jnp.zeros((1, self.scfg.encode_window_frames * self.spf))
        # token ring: enough history for refill (buffer + delay + chunk)
        self.tok_ring_len = self.scfg.buffer_frames + max(self.delay, 1) + k + 8
        self.tok_ring = jnp.zeros((1, self.tok_ring_len), jnp.int32)
        self.tokens_seen = 0
        # vocoder code window, seeded with the reference code tail so that
        # early chunks get ref-code left-padding (:567-571)
        W = self.scfg.decode_window_frames
        seed = self.ref_codes[:, :, -W:]
        pad = W - seed.shape[-1]
        if pad > 0:
            seed = jnp.concatenate([jnp.zeros_like(seed[:, :, :1]).repeat(pad, -1), seed], -1)
        self.code_window = seed
        self.frames_decoded = 0
        self.delay_prefilled = self.delay == 0

    # ------------------------------------------------------------------

    def _lm_pos(self) -> int:
        """Deterministic LM cache position (see module docstring)."""
        return int(self.state.decode.pos)

    def process_chunk(self, chunk: np.ndarray) -> np.ndarray:
        """One k-frame chunk in (k * 2048 samples), one chunk out
        (process_one_chunk, infer_arvc.py:492-596)."""
        k = self.scfg.decode_chunk_frames
        n = k * self.spf
        chunk = jnp.asarray(chunk).reshape(1, n)

        # roll wav window, encode, keep last k tokens
        self.wav_window = jnp.concatenate([self.wav_window[:, n:], chunk], axis=1)
        toks = _encode_window(self.cv.tokenizer_params, self.cfg, self.wav_window)
        new_toks = toks[:, -k:]
        self.tok_ring = jnp.concatenate([self.tok_ring[:, k:], new_toks], axis=1)
        self.tokens_seen += k

        if self.tokens_seen < self.delay:
            return np.zeros(n, np.float32)
        if not self.delay_prefilled:
            self.state = arvc.prefill_src_condition4delay(
                self.cv.arvc_params, self.cfg.arvc, self.state,
                self.tok_ring[:, -self.delay :], self.delay,
            )
            self.delay_prefilled = True
            return np.zeros(n, np.float32)

        # decode k frames
        self.key, sub = jax.random.split(self.key)
        self.state, codes_k = _decode_frames(
            self.cv.arvc_params, self.cfg, self.state, new_toks, sub,
            self.sampling, k,
        )
        self.code_window = jnp.concatenate(
            [self.code_window[:, :, k:], codes_k], axis=-1
        )
        self.frames_decoded += k

        # prompt refill when the interleaved position exceeds the cache
        # budget (:547-564)
        if self._lm_pos() // 2 >= self.scfg.max_seq_frames:
            self._refill()

        wav = _vocode_window(self.cv.vocoder_params, self.cfg, self.code_window)
        return np.asarray(wav[0, -n:])

    def _refill(self):
        b = self.scfg.buffer_frames
        ext_codes = jnp.concatenate(
            [self.ref_codes, self.code_window[:, :, -b:]], axis=-1
        )
        if self.delay > 0:
            tok_hist = self.tok_ring[:, -b - self.delay : -self.delay]
        else:
            tok_hist = self.tok_ring[:, -b:]
        ext_tokens = jnp.concatenate([self.ref_tokens, tok_hist], axis=-1)
        self.state = arvc.prefill_prompt(
            self.cv.arvc_params, self.cfg.arvc, ext_tokens, ext_codes,
            self.style, self.timbre, delay=self.delay,
        )
        if self.delay > 0:
            self.state = arvc.prefill_src_condition4delay(
                self.cv.arvc_params, self.cfg.arvc, self.state,
                self.tok_ring[:, -self.delay :], self.delay,
            )

    # ------------------------------------------------------------------

    def stream_file(self, src_wav: np.ndarray) -> np.ndarray:
        """Simulated streaming over a file (stream_infer, :598-689)."""
        k = self.scfg.decode_chunk_frames
        n = k * self.spf
        pad = n - (len(src_wav) % n)
        src = np.pad(src_wav, (pad, 0))
        outs = [self.process_chunk(src[i : i + n]) for i in range(0, len(src), n)]
        return np.concatenate(outs)
