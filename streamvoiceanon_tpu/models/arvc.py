"""ARVC wrapper: content-token embedding + speaker conditioning around the
dual-AR LM, with offline generate and the streaming prefill/decode programs.

Matches reference modules/arvc_wrapper.py:7-126 plus DualARWrapper's
generate/prefill_prompt/prefill_src_condition4delay/decode_one
(modules/dual_ar_stream.py:605-837).

The interleaved stream layout (dual_ar_stream.py:706-716):

  [spk_cond (33) | c_0 a_{-d} c_1 a_{-d+1} ... ]   (c = content, a = audio)

where the first d audio slots are learned wait4start embeddings, the last d
content slots are wait4end embeddings, and d = delay in frames.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from streamvoiceanon_tpu.config import ARVCConfig, SamplingConfig
from streamvoiceanon_tpu.models import dual_ar


def prepare_params(raw: Dict) -> Dict:
    """convert.arvc output -> runtime layout (stacked transformer layers)."""
    p = {
        "embedding": jnp.asarray(raw["embedding"]),
        "context_in": jax.tree.map(jnp.asarray, raw["context_in"]),
        "style_in": jax.tree.map(jnp.asarray, raw["style_in"]),
        "model": dual_ar.prepare_params(raw["decoder"]["model"]),
    }
    if "wait4start" in raw["decoder"]:
        p["wait4start"] = jnp.asarray(raw["decoder"]["wait4start"])
        p["wait4end"] = jnp.asarray(raw["decoder"]["wait4end"])
    return p


def spk_condition(params: Dict, style_vec: jax.Array, timbre: jax.Array) -> jax.Array:
    """(B,192) style + (B,32,128) timbre -> (B,33,dim) condition prefix
    (arvc_wrapper.py:59-60: [context_in(timbre), style_in(style)])."""
    t = timbre @ params["context_in"]["w"] + params["context_in"]["b"]
    s = style_vec @ params["style_in"]["w"] + params["style_in"]["b"]
    return jnp.concatenate([t, s[:, None]], axis=1)


def embed_content(params: Dict, tokens: jax.Array) -> jax.Array:
    return jnp.take(params["embedding"], tokens, axis=0)


def _interleave(cond: jax.Array, audio: jax.Array) -> jax.Array:
    """(B,T,D),(B,T,D) -> (B,2T,D) as c_0 a_0 c_1 a_1 ...
    (torch.stack dim=1 + transpose + reshape, dual_ar_stream.py:714)."""
    B, T, D = cond.shape
    return jnp.stack([cond, audio], axis=2).reshape(B, 2 * T, D)


# ---------------------------------------------------------------------------
# Offline generate
# ---------------------------------------------------------------------------


def generate(
    params: Dict,
    cfg: ARVCConfig,
    ref_content: jax.Array,  # (B, Tr) int
    ref_audio_codes: jax.Array,  # (B, nq, Tr) int
    src_content: jax.Array,  # (B, Ts) int
    style_vec: jax.Array,  # (B, 192)
    timbre: jax.Array,  # (B, 32, 128)
    key: jax.Array,
    sampling: SamplingConfig = SamplingConfig(),
    delay: int = 2,
    cache_dtype=jnp.float32,
    auto_cache_rows: bool = False,
) -> jax.Array:
    """Full-utterance conversion: returns codec codes (B, nq, Ts).

    Equivalent to ARVCWrapper.generate -> DualARWrapper.generate
    (dual_ar_stream.py:699-762): prefill the interleaved prompt + first
    source condition, then a scanned 2-token step per frame.

    auto_cache_rows: right-size the KV cache to this utterance (the decode
    step reads the FULL fixed-shape cache every frame, so cache length is
    per-utterance state traffic AND the per-batch-row HBM footprint; the
    reference-geometry 2048 rows are ~7x oversize for a 64-frame utterance
    — same lever as StreamSession.with_cache_rows).  Shapes are static
    under jit, so the resize is a trace-time reconfiguration."""
    dcfg = cfg.decoder
    B, Ts = src_content.shape
    ref_cond = embed_content(params, ref_content)
    src_cond = embed_content(params, src_content)
    spk = spk_condition(params, style_vec, timbre)

    w4s = params["wait4start"][None, :delay] * jnp.ones((B, 1, 1))
    w4e = params["wait4end"][None, :delay] * jnp.ones((B, 1, 1))
    ref_emb = dual_ar.embed_codes(params["model"], dcfg, ref_audio_codes)
    ref_emb = jnp.concatenate([w4s, ref_emb], axis=1)
    prefill_cond = jnp.concatenate([ref_cond, src_cond[:, :delay]], axis=1)
    emb_seq = _interleave(prefill_cond, ref_emb)
    emb_seq = jnp.concatenate([spk, emb_seq], axis=1)
    remaining = jnp.concatenate([src_cond[:, delay:], w4e], axis=1)  # (B, Ts, D)

    # prefill + first frame
    emb_seq = jnp.concatenate([emb_seq, remaining[:, :1]], axis=1)
    L = emb_seq.shape[1]
    if auto_cache_rows:
        need = L + 2 * (Ts - 1) + 2  # prefill rows + 2 rows/frame + slack
        rows = min(dcfg.max_seq_len, -(-need // 64) * 64)
        from dataclasses import replace as _drep

        dcfg = _drep(dcfg, max_seq_len=rows)
    state = dual_ar.init_state(dcfg, batch=B, cache_dtype=cache_dtype)
    key, k0 = jax.random.split(key)
    state, last_hidden = dual_ar.prefill(
        params["model"], dcfg, state, emb_seq, jnp.int32(L)
    )
    logits = dual_ar._token_logits(params["model"], dcfg, last_hidden)[:, -1]
    k_sem, k_fast = jax.random.split(k0)
    _ = k_sem  # semantic sample of the prefill frame is discarded (VC path)
    hidden = dual_ar._project_fast(params["model"], last_hidden)
    first_codes, first_emb, _ = dual_ar._fast_decode(
        params["model"], dcfg, hidden, k_fast, sampling)
    if first_emb is None:
        first_emb = dual_ar.embed_codes(params["model"], dcfg, first_codes[:, :, None])

    def step(carry, inp):
        state, audio_emb, key = carry
        cond_t = inp
        key, sub = jax.random.split(key)
        emb2 = jnp.concatenate([audio_emb, cond_t[:, None]], axis=1)
        state, _, codes, audio_emb = dual_ar.decode_frame(
            params["model"], dcfg, state, emb2, sub, sampling
        )
        return (state, audio_emb, key), codes

    xs = jnp.swapaxes(remaining[:, 1:], 0, 1)  # (Ts-1, B, D)
    (_, _, _), frames = jax.lax.scan(step, (state, first_emb, key), xs)
    all_codes = jnp.concatenate(
        [first_codes[None], frames], axis=0
    )  # (Ts, B, nq)
    return jnp.transpose(all_codes, (1, 2, 0))  # (B, nq, Ts)


# ---------------------------------------------------------------------------
# Training forward
# ---------------------------------------------------------------------------


def forward_train(
    params: Dict,
    cfg: ARVCConfig,
    content_tokens: jax.Array,  # (B, T) int
    base_target: jax.Array,  # (B, T) int semantic targets
    target: jax.Array,  # (B, nq, T) int codebook targets
    x_lens: jax.Array,  # (B,)
    style_vec: jax.Array,
    timbre: jax.Array,
    delay: int,
) -> Tuple[jax.Array, jax.Array]:
    """Training losses (codebook CE, semantic CE) — ARVCWrapper.forward
    (arvc_wrapper.py:49-66).  `delay` is drawn by the trainer per batch."""
    condition = embed_content(params, content_tokens)
    spk = spk_condition(params, style_vec, timbre)
    return dual_ar.forward_train(
        params["model"], cfg.decoder, condition, spk, base_target, target,
        x_lens, params["wait4start"], params["wait4end"], delay,
    )


# ---------------------------------------------------------------------------
# Streaming programs
# ---------------------------------------------------------------------------


class ARVCState(NamedTuple):
    decode: dual_ar.DecodeState
    audio_emb: jax.Array  # (B, 1, dim) — cached_new_audio_emb
    ref_tail_emb: jax.Array  # (B, delay, dim) — cached_ref_emb


def prefill_prompt(
    params: Dict,
    cfg: ARVCConfig,
    ref_content: jax.Array,  # (B, Tp)
    ref_audio_codes: jax.Array,  # (B, nq, Tp)
    style_vec: jax.Array,
    timbre: jax.Array,
    delay: int,
    cache_dtype=jnp.float32,
) -> ARVCState:
    """Fill a fresh KV cache with the reference prompt
    (dual_ar_stream.py:765-796).  Prompt length is static (the runtime calls
    this once at stream start and at each periodic refill, both with fixed
    geometry, so there are at most two compiled variants per stream)."""
    dcfg = cfg.decoder
    B, Tp = ref_content.shape
    ref_cond = embed_content(params, ref_content)
    spk = spk_condition(params, style_vec, timbre)
    ref_emb = dual_ar.embed_codes(params["model"], dcfg, ref_audio_codes)

    if delay > 0:
        tail = ref_emb[:, Tp - delay :]
        w4s = params["wait4start"][None, :delay] * jnp.ones((B, 1, 1))
        audio_stream = jnp.concatenate([w4s, ref_emb[:, : Tp - delay]], axis=1)
        audio_cache = jnp.zeros_like(ref_emb[:, :1])
    else:
        tail = ref_emb[:, :0]
        audio_stream = ref_emb
        audio_cache = ref_emb[:, -1:]

    emb_seq = _interleave(ref_cond, audio_stream)
    emb_seq = jnp.concatenate([spk, emb_seq], axis=1)
    if delay == 0:
        emb_seq = emb_seq[:, :-1]  # dual_ar_stream.py:784-785

    state = dual_ar.init_state(dcfg, batch=B, cache_dtype=cache_dtype)
    state, _ = dual_ar.prefill(
        params["model"], dcfg, state, emb_seq, jnp.int32(emb_seq.shape[1])
    )
    return ARVCState(state, audio_cache, tail)


def prefill_src_condition4delay(
    params: Dict, cfg: ARVCConfig, state: ARVCState, src_content: jax.Array, delay: int
) -> ARVCState:
    """Once `delay` source frames accumulated: interleave them with the cached
    reference audio tail and extend the KV cache
    (dual_ar_stream.py:799-815)."""
    dcfg = cfg.decoder
    src_cond = embed_content(params, src_content)  # (B, delay, D)
    emb = _interleave(src_cond, state.ref_tail_emb)  # (B, 2*delay, D)
    new_audio_emb = emb[:, -1:]
    emb = emb[:, :-1]
    d, _ = dual_ar.prefill(
        params["model"], dcfg, state.decode, emb, jnp.int32(emb.shape[1])
    )
    return ARVCState(d, new_audio_emb, state.ref_tail_emb)


def prefill_history(
    params: Dict,
    cfg: ARVCConfig,
    state: ARVCState,
    recent_tokens: jax.Array,  # (B, b) content tokens ending at the boundary
    recent_codes: jax.Array,  # (B, nq, b) decoded codes ending at the boundary
    delay: int,
) -> ARVCState:
    """Incremental form of the periodic prompt refill: append b recent
    (content, audio) frame pairs to a PROMPT-PREFILLED state.

    prefill_prompt(ref ++ recent) == prefill_history(prefill_prompt(ref),
    recent): the ref-prefix KV rows are position-identical in both, so the
    runtime can stash the post-prompt state once and refill with this small
    fixed-shape program instead of re-running the full padded-prompt prefill
    on the hot path (reference semantics: infer_arvc.py:547-564, where the
    refill prompt is always [ref codes | last buffer_frames codes]).
    Exactness is asserted by tests/test_streaming_integration.py."""
    dcfg = cfg.decoder
    B, b = recent_tokens.shape
    cond = embed_content(params, recent_tokens)  # (B, b, D)
    emb = dual_ar.embed_codes(params["model"], dcfg, recent_codes)  # (B, b, D)
    if delay > 0:
        # continuation pairs (c_t, a_{t-d}) for t in [Tp, Tp+b): the audio
        # slots are the first b of [stashed tail (delay) ; recent codes (b)],
        # the new tail is the remaining delay entries.  Written in cat/slice
        # form so it holds for ANY b >= 1 (including b < delay), which makes
        # prefill_history CHAIN: splitting the b pairs into consecutive
        # groups and appending group-by-group gives the same state — the
        # contract behind the background (per-chunk) refill
        # (StreamConfig.background_refill).
        cat = jnp.concatenate([state.ref_tail_emb, emb], axis=1)  # (B, d+b, D)
        audio = cat[:, :b]
        seq = _interleave(cond, audio)  # (B, 2b, D)
        new_tail = cat[:, b:]
        audio_cache = jnp.zeros_like(emb[:, :1])
    else:
        # delay=0 prompts end on a cond slot with the last audio slot cached
        # (prefill_prompt drops it); the continuation re-inserts it first:
        # [a_{Tp-1}, c_Tp, a_Tp, ..., c_{Tp+b-1}] — audio-first interleave
        audio = jnp.concatenate([state.audio_emb, emb[:, : b - 1]], axis=1)
        seq = _interleave(audio, cond)  # (B, 2b, D)
        new_tail = emb[:, :0]
        audio_cache = emb[:, -1:]
    d, _ = dual_ar.prefill(
        params["model"], dcfg, state.decode, seq, jnp.int32(seq.shape[1])
    )
    return ARVCState(d, audio_cache, new_tail)


def decode_one(
    params: Dict,
    cfg: ARVCConfig,
    state: ARVCState,
    src_content_1: jax.Array,  # (B, 1) newest content token
    key: jax.Array,
    sampling: SamplingConfig = SamplingConfig(),
) -> Tuple[ARVCState, jax.Array]:
    """One streaming frame: [cached_audio_emb, new cond] 2-token step
    (dual_ar_stream.py:818-837).  Returns (state', codes (B, nq))."""
    dcfg = cfg.decoder
    cond = embed_content(params, src_content_1[:, 0])[:, None]
    emb2 = jnp.concatenate([state.audio_emb, cond], axis=1)
    d, _, codes, audio_emb = dual_ar.decode_frame(
        params["model"], dcfg, state.decode, emb2, key, sampling
    )
    return ARVCState(d, audio_emb, state.ref_tail_emb), codes
