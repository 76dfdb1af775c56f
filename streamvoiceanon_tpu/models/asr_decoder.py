"""ASR decoder head (content-tokenizer training only).

A decoder-only transformer that consumes tokenizer latents as a prefix plus
whisper-tokenized text and computes a seq2seq CE loss, forcing the content
tokens to be transcribable (speaker disentanglement).  Behavior matches
reference modules/asr/asr_decoder.py:17-117 with the AdaptiveLayerNorm
backbone modules/asr/transformer.py:20-226 (at inference/no-conditioning the
adaptive LN reduces to plain RMSNorm, transformer.py:30-32).

Fixed-shape: the audio prefix and text are packed per-sample with masks
instead of the reference's python loops.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp

from streamvoiceanon_tpu.models.dual_ar import _run_layers
from streamvoiceanon_tpu.ops.norm import rms_norm
from streamvoiceanon_tpu.ops.rope import precompute_freqs_cis


@dataclass(frozen=True)
class ASRDecoderConfig:
    hidden_dim: int = 768
    num_heads: int = 12
    depth: int = 12
    block_size: int = 4096
    in_channels: int = 512
    n_vocab: int = 51866  # whisper vocab
    bos_id: int = 50528
    eos_id: int = 50527
    rope_base: float = 10000.0
    norm_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.num_heads

    @property
    def intermediate_size(self) -> int:
        n_hidden = int(2 * (4 * self.hidden_dim) / 3)
        return n_hidden if n_hidden % 256 == 0 else n_hidden + 256 - n_hidden % 256


def init(key, cfg: ASRDecoderConfig, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(key, 4)

    def block(k):
        kk = jax.random.split(k, 5)
        d, h = cfg.hidden_dim, cfg.intermediate_size
        kv = cfg.num_heads * cfg.head_dim
        return {
            "wqkv": {"w": jax.random.normal(kk[0], (d, 3 * kv), dtype) * 0.02},
            "wo": {"w": jax.random.normal(kk[1], (kv, d), dtype) * 0.02},
            "attention_norm": {"w": jnp.ones((d,), dtype)},
            "ffn_norm": {"w": jnp.ones((d,), dtype)},
            "w1": {"w": jax.random.normal(kk[2], (d, h), dtype) * 0.02},
            "w3": {"w": jax.random.normal(kk[3], (d, h), dtype) * 0.02},
            "w2": {"w": jax.random.normal(kk[4], (h, d), dtype) * 0.02},
        }

    from streamvoiceanon_tpu.models.dual_ar import stack_layers

    p = {
        "layers": stack_layers(
            [block(k) for k in jax.random.split(ks[0], cfg.depth)]
        ),
        "norm": {"w": jnp.ones((cfg.hidden_dim,), dtype)},
        "text_embedding": jax.random.normal(
            ks[1], (cfg.n_vocab, cfg.hidden_dim), dtype
        )
        * 0.02,
        "prediction_head": {
            "w": jax.random.normal(ks[2], (cfg.hidden_dim, cfg.n_vocab), dtype) * 0.02,
            "b": jnp.zeros((cfg.n_vocab,), dtype),
        },
    }
    if cfg.in_channels != cfg.hidden_dim:
        p["audio_proj"] = {
            "w": jax.random.normal(ks[3], (cfg.in_channels, cfg.hidden_dim), dtype)
            * 0.02,
            "b": jnp.zeros((cfg.hidden_dim,), dtype),
        }
    return p


def _backbone(params: Dict, cfg: ASRDecoderConfig, x: jax.Array) -> jax.Array:
    L = x.shape[1]
    freqs = jnp.asarray(precompute_freqs_cis(L, cfg.head_dim, cfg.rope_base))
    mask = jnp.arange(L)[None, :] <= jnp.arange(L)[:, None]
    h, _ = _run_layers(
        params["layers"], x, freqs, mask, None, None,
        cfg.num_heads, cfg.num_heads, cfg.head_dim, cfg.norm_eps,
    )
    return rms_norm(h, params["norm"]["w"], cfg.norm_eps)


def greedy_decode(
    params: Dict,
    cfg: ASRDecoderConfig,
    audio_feats: jax.Array,  # (1, Ta, in_channels)
    max_len: int = 128,
) -> jax.Array:
    """Greedy transcription for training-time logging
    (asr_decoder.py:100-117, greedy instead of top-p for determinism).
    Returns (max_len,) token ids, eos-padded.  Recomputes the full prefix per
    step (matching the reference's cache-less loop) under lax.scan."""
    if "audio_proj" in params:
        audio = audio_feats @ params["audio_proj"]["w"] + params["audio_proj"]["b"]
    else:
        audio = audio_feats
    Ta = audio.shape[1]
    L = Ta + max_len

    def step(carry, _):
        tokens, t = carry  # tokens (max_len,) with bos logic folded in
        text = jnp.concatenate(
            [jnp.full((1,), cfg.bos_id, jnp.int32), tokens.astype(jnp.int32)]
        )
        emb = jnp.take(params["text_embedding"], text, axis=0)[None]
        x = jnp.concatenate([audio, emb], axis=1)
        h = _backbone(params, cfg, x)
        logits = (
            h[:, Ta + t] @ params["prediction_head"]["w"]
            + params["prediction_head"]["b"]
        )
        nxt = jnp.argmax(logits[0]).astype(jnp.int32)
        tokens = tokens.at[t].set(nxt)
        return (tokens, t + 1), nxt

    init = (jnp.full((max_len,), cfg.eos_id, jnp.int32), jnp.int32(0))
    (_, _), out = jax.lax.scan(step, init, None, length=max_len)
    return out


def forward(
    params: Dict,
    cfg: ASRDecoderConfig,
    audio_feats: jax.Array,  # (B, Ta, in_channels) tokenizer latents
    audio_lens: jax.Array,  # (B,)
    text: jax.Array,  # (B, Tt) token ids, right-padded
    text_lens: jax.Array,  # (B,)
) -> jax.Array:
    """s2s CE loss (asr_decoder.py:61-99): per-sample packed
    [audio prefix | bos text eos] stream, CE over the text span, averaged per
    sample then over the batch."""
    B, Ta, _ = audio_feats.shape
    Tt = text.shape[1]
    # bos/eos framing (asr_decoder.py:63-69)
    text = jnp.concatenate(
        [jnp.full((B, 1), cfg.bos_id, text.dtype), text,
         jnp.zeros((B, 1), text.dtype)], axis=1,
    )
    text_lens = text_lens + 2
    pos_t = jnp.arange(Tt + 2)[None, :]
    text = jnp.where(pos_t >= text_lens[:, None] - 1, cfg.eos_id, text)

    if "audio_proj" in params:
        audio = audio_feats @ params["audio_proj"]["w"] + params["audio_proj"]["b"]
    else:
        audio = audio_feats
    text_emb = jnp.take(params["text_embedding"], text, axis=0)

    # pack [audio[:la] | text_emb[:lt]] per sample into (B, Ta+Tt+2, D)
    L = Ta + Tt + 2
    pos = jnp.arange(L)[None, :]
    la = audio_lens[:, None]
    audio_pad = jnp.pad(audio, ((0, 0), (0, L - Ta), (0, 0)))
    t_idx = jnp.clip(pos - la, 0, Tt + 1)
    text_gath = jnp.take_along_axis(text_emb, t_idx[..., None], axis=1)
    x = jnp.where(pos[..., None] < la[..., None], audio_pad, text_gath)

    h = _backbone(params, cfg, x)
    logits = h @ params["prediction_head"]["w"] + params["prediction_head"]["b"]

    # targets: predict text[f+1] from position la + f, f in [0, text_len-1)
    tgt = text[:, 1:]  # (B, Tt+1)
    f_idx = jnp.arange(Tt + 1)[None, :]
    gather_pos = jnp.clip(la + f_idx, 0, L - 1)
    frame_logits = jnp.take_along_axis(
        logits, gather_pos[..., None], axis=1
    ).astype(jnp.float32)  # (B, Tt+1, V)
    valid = (f_idx < (text_lens - 1)[:, None]).astype(jnp.float32)
    logz = jax.nn.logsumexp(frame_logits, axis=-1)
    sel = jnp.take_along_axis(frame_logits, tgt[..., None], axis=-1)[..., 0]
    per_sample = jnp.sum((logz - sel) * valid, axis=1) / jnp.maximum(
        jnp.sum(valid, axis=1), 1.0
    )
    return jnp.mean(per_sample)
