"""Dual-autoregressive token LM — the voice-conversion model proper.

A slow transformer (12L, d768) consumes an interleaved stream of
[speaker-condition prefix (33) | (content_t, audio_{t-delay}) pairs] and
predicts the next semantic token plus a per-frame hidden state; a fast
transformer (4L, d768) autoregresses over the 8 codec codebooks of each
frame.  Behavior matches reference modules/dual_ar_stream.py (BaseTransformer
:167-409, DualARTransformer :411-602, decode_one_token_ar :1168-1219).

TPU-first design decisions:
* layer parameters are stacked on a leading axis and the layer loop is a
  single `lax.scan` — one compiled block instead of 12/4 unrolled layers;
* KV caches are fixed-shape (L, B, H, S, D) arrays carried in a DecodeState
  pytree; position bookkeeping is one scalar (the reference's input_pos and
  kv_pos are always equal on the runtime path);
* the whole frame step (2-token slow step + 8-step fast codebook loop +
  sampling) is one jitted function with no host sync;
* prefill takes a *padded* sequence plus valid_len so prompt length changes
  do not trigger recompiles (garbage cache slots beyond valid_len are
  provably overwritten before ever being attended).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from streamvoiceanon_tpu.config import DualARConfig, SamplingConfig
from streamvoiceanon_tpu.ops.norm import rms_norm
from streamvoiceanon_tpu.ops.pallas_attention import decode_attention_prepadded
from streamvoiceanon_tpu.ops.pallas_fast_decode import fast_decode as pallas_fast_decode
from streamvoiceanon_tpu.ops.pallas_slow_decode import slow_decode_step
from streamvoiceanon_tpu.ops.rope import apply_rope, precompute_freqs_cis
from streamvoiceanon_tpu.ops.sampling import sample_token


def _pallas_interpret() -> bool:
    """Pallas kernels run compiled on TPU, interpreted elsewhere (CPU tests).

    Honors an enclosing `jax.default_device(...)` context: the CPU one-time
    prep phase of bench.py / benchmarks/stage_floor.py traces the decode
    programs on the CPU backend while the process-level default backend is
    the TPU, and a compiled-mode pallas_call cannot lower for CPU."""
    dd = jax.config.jax_default_device
    platform = dd.platform if dd is not None else jax.default_backend()
    return platform != "tpu"


# ---------------------------------------------------------------------------
# Parameter plumbing
# ---------------------------------------------------------------------------


def stack_layers(layer_list) -> Dict:
    """List of per-layer param dicts -> single dict of stacked arrays."""
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *layer_list)


def prepare_params(raw: Dict) -> Dict:
    """Converts runtime/convert.dual_ar output (lists of layers) into the
    stacked-scan layout used by this module."""
    p = dict(raw)
    p["layers"] = stack_layers(raw["layers"])
    p["fast_layers"] = stack_layers(raw["fast_layers"])
    return jax.tree.map(jnp.asarray, p)


def random_params(key, cfg: DualARConfig, dtype=jnp.float32) -> Dict:
    """Random init with the reference's initializer_range=0.02 normal."""

    def lin(k, i, o):
        return {"w": jax.random.normal(k, (i, o), dtype) * 0.02}

    def block(k, dim, n_head, n_local, head_dim, inter):
        ks = jax.random.split(k, 5)
        total = (n_head + 2 * n_local) * head_dim
        return {
            "wqkv": lin(ks[0], dim, total),
            "wo": lin(ks[1], dim, dim),
            "attention_norm": {"w": jnp.ones((dim,), dtype)},
            "ffn_norm": {"w": jnp.ones((dim,), dtype)},
            "w1": lin(ks[2], dim, inter),
            "w3": lin(ks[3], dim, inter),
            "w2": lin(ks[4], inter, dim),
        }

    keys = jax.random.split(key, 16)
    p = {
        "embeddings": jax.random.normal(keys[0], (cfg.vocab_size, cfg.dim), dtype) * 0.02,
        "codebook_embeddings": jax.random.normal(
            keys[1], (cfg.codebook_size * cfg.num_codebooks, cfg.dim), dtype
        )
        * 0.02,
        "layers": [
            block(k, cfg.dim, cfg.n_head, cfg.n_local_heads, cfg.head_dim,
                  cfg.intermediate_size)
            for k in jax.random.split(keys[2], cfg.n_layer)
        ],
        "norm": {"w": jnp.ones((cfg.dim,), dtype)},
        "fast_embeddings": jax.random.normal(
            keys[3], (cfg.codebook_size, cfg.fast_dim), dtype
        )
        * 0.02,
        "fast_layers": [
            block(k, cfg.fast_dim, cfg.fast_n_head, cfg.fast_n_local_heads,
                  cfg.fast_head_dim, cfg.fast_intermediate_size)
            for k in jax.random.split(keys[4], cfg.n_fast_layer)
        ],
        "fast_norm": {"w": jnp.ones((cfg.fast_dim,), dtype)},
        "fast_output": lin(keys[5], cfg.fast_dim, cfg.codebook_size),
    }
    if not cfg.tie_word_embeddings:
        p["output"] = lin(keys[6], cfg.dim, cfg.vocab_size)
    return p


def embed_codes(params: Dict, cfg: DualARConfig, codes: jax.Array) -> jax.Array:
    """Sum of per-codebook embeddings (dual_ar_stream.py:245-255).

    codes: (B, num_codebooks, T) int -> (B, T, dim)."""
    offsets = jnp.arange(cfg.num_codebooks, dtype=codes.dtype) * cfg.codebook_size
    shifted = codes + offsets[None, :, None]
    emb = jnp.take(params["codebook_embeddings"], shifted, axis=0)  # (B, nq, T, D)
    return jnp.sum(emb, axis=1)


def embed_tokens(params: Dict, tokens: jax.Array) -> jax.Array:
    """Semantic-token embedding (embeddings table)."""
    return jnp.take(params["embeddings"], tokens, axis=0)


# ---------------------------------------------------------------------------
# Core attention layer (scanned over the stacked layer axis)
# ---------------------------------------------------------------------------


def _attn_block(
    lp: Dict,
    x: jax.Array,
    freqs: jax.Array,
    mask: jax.Array,
    kv: Optional[Tuple[jax.Array, jax.Array]],
    pos: Optional[jax.Array],
    n_head: int,
    n_local: int,
    head_dim: int,
    norm_eps: float,
    use_pallas: bool = False,
):
    """One transformer block.  If kv is given, k/v are written at `pos` into
    the cache and attention runs over the full cache length.

    The caches may be stored with a head dim padded beyond `head_dim` (the
    Pallas decode layout, config.DualARConfig.cache_head_dim); the XLA path
    pads new rows on write and slices the true lanes back on read.  With
    `use_pallas` (decode steps only: pure-causal mask, n_local == n_head) the
    fused update+attend kernel runs instead, keeping the padded cache layout
    end to end."""
    B, T, dim = x.shape
    h = rms_norm(x, lp["attention_norm"]["w"], norm_eps)
    qkv = h @ lp["wqkv"]["w"]
    q, k, v = jnp.split(qkv, [n_head * head_dim, (n_head + n_local) * head_dim], axis=-1)
    q = apply_rope(q.reshape(B, T, n_head, head_dim), freqs)
    k = apply_rope(k.reshape(B, T, n_local, head_dim), freqs)
    v = v.reshape(B, T, n_local, head_dim)
    q = jnp.swapaxes(q, 1, 2)  # (B, H, T, D)
    k = jnp.swapaxes(k, 1, 2)
    v = jnp.swapaxes(v, 1, 2)

    if use_pallas and kv is not None:
        if n_local != n_head:
            raise NotImplementedError("pallas decode path requires MHA (no GQA)")
        k_cache, v_cache = kv  # (B, H, S, Dp)
        S, Dp = k_cache.shape[-2:]
        out, kc, vc = decode_attention_prepadded(
            q.reshape(B * n_head, T, head_dim).astype(k_cache.dtype),
            k.reshape(B * n_head, T, head_dim).astype(k_cache.dtype),
            v.reshape(B * n_head, T, head_dim).astype(k_cache.dtype),
            k_cache.reshape(B * n_head, S, Dp),
            v_cache.reshape(B * n_head, S, Dp),
            pos,
            true_head_dim=head_dim,
            interpret=_pallas_interpret(),
        )
        out = jnp.swapaxes(out.reshape(B, n_head, T, head_dim), 1, 2)
        out = out.reshape(B, T, n_head * head_dim).astype(x.dtype)
        x = x + out @ lp["wo"]["w"]
        f = rms_norm(x, lp["ffn_norm"]["w"], norm_eps)
        f = (jax.nn.silu(f @ lp["w1"]["w"]) * (f @ lp["w3"]["w"])) @ lp["w2"]["w"]
        new_kv = (
            kc.reshape(B, n_head, S, Dp),
            vc.reshape(B, n_head, S, Dp),
        )
        return x + f, new_kv

    if kv is not None and kv[0].ndim == 3:
        # flat (B, S, n_local*head_dim) cache layout (use_pallas_slow_decode):
        # roped K rows are stored flat; reads transpose back to (B, H, S, D).
        k_cache, v_cache = kv
        S = k_cache.shape[1]
        k_rows = jnp.swapaxes(k, 1, 2).reshape(B, T, n_local * head_dim)
        v_rows = jnp.swapaxes(v, 1, 2).reshape(B, T, n_local * head_dim)
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k_rows.astype(k_cache.dtype), (0, pos, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v_rows.astype(v_cache.dtype), (0, pos, 0)
        )
        k_all = jnp.swapaxes(
            k_cache.reshape(B, S, n_local, head_dim), 1, 2
        ).astype(x.dtype)
        v_all = jnp.swapaxes(
            v_cache.reshape(B, S, n_local, head_dim), 1, 2
        ).astype(x.dtype)
        new_kv = (k_cache, v_cache)
    elif kv is not None:
        k_cache, v_cache = kv
        cache_dim = k_cache.shape[-1]
        if cache_dim != head_dim:  # pallas-padded layout driven by an XLA step
            padw = ((0, 0), (0, 0), (0, 0), (0, cache_dim - head_dim))
            k_w, v_w = jnp.pad(k, padw), jnp.pad(v, padw)
        else:
            k_w, v_w = k, v
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k_w.astype(k_cache.dtype), (0, 0, pos, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v_w.astype(v_cache.dtype), (0, 0, pos, 0)
        )
        k_all = k_cache[..., :head_dim].astype(x.dtype)
        v_all = v_cache[..., :head_dim].astype(x.dtype)
        new_kv = (k_cache, v_cache)
    else:
        k_all, v_all = k, v
        new_kv = None

    if n_local != n_head:
        rep = n_head // n_local
        k_all = jnp.repeat(k_all, rep, axis=1)
        v_all = jnp.repeat(v_all, rep, axis=1)

    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k_all, preferred_element_type=jnp.float32)
    scores = scores / np.sqrt(head_dim)
    scores = jnp.where(mask[None, None], scores, -jnp.inf)
    w = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bqhd", w, v_all).reshape(B, T, n_head * head_dim)
    x = x + out @ lp["wo"]["w"]

    f = rms_norm(x, lp["ffn_norm"]["w"], norm_eps)
    f = (jax.nn.silu(f @ lp["w1"]["w"]) * (f @ lp["w3"]["w"])) @ lp["w2"]["w"]
    return x + f, new_kv


def _run_layers(
    stacked: Dict,
    x: jax.Array,
    freqs: jax.Array,
    mask: jax.Array,
    caches: Optional[Tuple[jax.Array, jax.Array]],
    pos: Optional[jax.Array],
    n_head: int,
    n_local: int,
    head_dim: int,
    norm_eps: float,
    use_pallas: bool = False,
    unroll: int = 1,
    remat: bool = False,
):
    """lax.scan over stacked layers, threading x and the per-layer caches.

    `remat` rematerializes each layer in the backward pass (training only):
    without it the scan saves every layer's attention matrix and MLP
    activations for backward — f32 (L, B, H, T, T) alone is 3 GB at
    B=16/T=549 and OOMs the chip before batch can amortize the matmuls.
    Inference paths never differentiate, so the flag costs them nothing.

    `unroll` > 1 unrolls the layer loop in the compiled program, letting XLA
    overlap one layer's HBM weight streaming with the previous layer's
    compute — worthwhile for tiny-T decode steps where each layer is
    latency-bound, wasteful for long-sequence prefill/training."""

    def body(carry, inp):
        h = carry
        lp, kv = inp
        h, new_kv = _attn_block(
            lp, h, freqs, mask, kv, pos, n_head, n_local, head_dim, norm_eps,
            use_pallas=use_pallas,
        )
        return h, new_kv

    if remat:
        body = jax.checkpoint(body)

    if caches is not None:
        x, new_caches = jax.lax.scan(
            lambda c, i: body(c, (i[0], (i[1], i[2]))),
            x,
            (stacked, caches[0], caches[1]),
            unroll=unroll,
        )
        return x, (new_caches[0], new_caches[1])
    x, _ = jax.lax.scan(lambda c, lp: (body(c, (lp, None))[0], None), x, stacked)
    return x, None


# ---------------------------------------------------------------------------
# Decode state
# ---------------------------------------------------------------------------


class DecodeState(NamedTuple):
    k_cache: jax.Array  # (L, B, H, S, D)
    v_cache: jax.Array
    pos: jax.Array  # scalar int32: next cache slot to write
    # cumulative count of nucleus-truncation events (windowed top-p filter
    # whose top-k window held < top_p mass — see ops/sampling.sample_token).
    # Carried as data so the guard works on callback-free backends (axon).
    trunc: jax.Array = 0  # scalar int32


def init_state(
    cfg: DualARConfig, batch: int = 1, cache_dtype=jnp.bfloat16
) -> DecodeState:
    if cfg.use_pallas_slow_decode:
        # flat row layout consumed by ops/pallas_slow_decode (and by the XLA
        # path via the flat branch of _attn_block)
        shape = (cfg.n_layer, batch, cfg.max_seq_len,
                 cfg.n_local_heads * cfg.head_dim)
    else:
        shape = (cfg.n_layer, batch, cfg.n_local_heads, cfg.max_seq_len,
                 cfg.cache_head_dim)
    return DecodeState(
        jnp.zeros(shape, cache_dtype),
        jnp.zeros(shape, cache_dtype),
        jnp.int32(0),
        jnp.int32(0),
    )


def convert_cache_layout(state: DecodeState, cfg: DualARConfig) -> DecodeState:
    """Re-layout a DecodeState to match `cfg`'s program-selection flags.

    The three layouts: (L, B, H, S, D[, padded]) for the XLA scan /
    per-head Pallas decode kernel, and flat (L, B, S, H*D) rows for the
    grid-pipelined slow kernel.  Used by StreamSession.transfer when the
    target device's converter enables different flags than the prep device."""
    kc = state.k_cache
    want_flat = cfg.use_pallas_slow_decode
    if want_flat and kc.ndim == 5:
        L, B, H, S, Dp = kc.shape
        D = cfg.head_dim

        def to_flat(c):
            return jnp.swapaxes(c[..., :D], 2, 3).reshape(L, B, S, H * D)

        return DecodeState(
            to_flat(state.k_cache), to_flat(state.v_cache), state.pos, state.trunc
        )
    if not want_flat and kc.ndim == 4:
        L, B, S, HD = kc.shape
        H, D = cfg.n_local_heads, cfg.head_dim

        def to_headed(c):
            c = jnp.swapaxes(c.reshape(L, B, S, H, D), 2, 3)
            if cfg.cache_head_dim != D:
                c = jnp.pad(c, ((0, 0),) * 4 + ((0, cfg.cache_head_dim - D),))
            return c

        return DecodeState(
            to_headed(state.k_cache), to_headed(state.v_cache), state.pos, state.trunc
        )
    return state


def _freqs(cfg: DualARConfig) -> jax.Array:
    return jnp.asarray(
        precompute_freqs_cis(cfg.max_seq_len, cfg.head_dim, cfg.rope_base)
    )


# ---------------------------------------------------------------------------
# Prefill
# ---------------------------------------------------------------------------


def prefill(
    params: Dict,
    cfg: DualARConfig,
    state: DecodeState,
    emb_seq: jax.Array,
    valid_len: jax.Array,
) -> Tuple[DecodeState, jax.Array]:
    """Run `emb_seq` (B, L_pad, dim) through the slow stack, filling the KV
    cache from state.pos; positions >= valid_len are padding (masked out of
    attention; their cache slots are overwritten by later decode steps before
    ever being attended).  Returns (state', hidden of last valid token).

    Matches decode_one_token_ar's prefill usage (dual_ar_stream.py:787-790)
    with pos starting at state.pos (0 for a fresh prompt)."""
    B, L, _ = emb_seq.shape
    start = state.pos
    positions = start + jnp.arange(L)
    freqs = jnp.take(_freqs(cfg), positions, axis=0)
    # rows attend cache cols <= their absolute position AND < start+valid_len
    col = jnp.arange(cfg.max_seq_len)[None, :]
    mask = (col <= positions[:, None]) & (col < start + valid_len)
    x, caches = _run_layers(
        params["layers"], emb_seq, freqs, mask, (state.k_cache, state.v_cache),
        start, cfg.n_head, cfg.n_local_heads, cfg.head_dim, cfg.norm_eps,
    )
    last_hidden = jnp.take_along_axis(
        x, (valid_len - 1)[None, None, None].astype(jnp.int32) * jnp.ones((B, 1, 1), jnp.int32), axis=1
    )
    new_state = DecodeState(caches[0], caches[1], start + valid_len, state.trunc)
    return new_state, last_hidden


# ---------------------------------------------------------------------------
# Fast codebook loop
# ---------------------------------------------------------------------------


def _fast_decode(
    params: Dict,
    cfg: DualARConfig,
    hidden: jax.Array,  # (B, 1, fast_dim) projected latent
    key: jax.Array,
    sampling: SamplingConfig,
) -> jax.Array:
    """8-step autoregressive codebook sampling with a fresh fast KV cache
    (decode_one_token_ar zeroes it every frame, dual_ar_stream.py:1197-1205).
    Returns (codes (B, num_codebooks) int32, fused audio_emb or None,
    trunc int32 scalar — count of nucleus-truncation events this frame).

    With cfg.use_pallas_fast_decode and batch 1, the whole loop runs in one
    VMEM-resident Pallas kernel (ops/pallas_fast_decode.py) — weights stream
    from HBM once per frame instead of once per codebook step."""
    B = hidden.shape[0]
    if cfg.use_pallas_fast_decode and B == 1 and cfg.fast_n_local_heads == cfg.fast_n_head:
        codes, aemb = pallas_fast_decode(
            params["fast_layers"],
            params["fast_norm"]["w"],
            params["fast_output"]["w"],
            params["fast_embeddings"],
            params["codebook_embeddings"],
            hidden[:, 0, :],
            key,
            nq=cfg.num_codebooks,
            n_head=cfg.fast_n_head,
            head_dim=cfg.fast_head_dim,
            vocab=cfg.codebook_size,
            rope_base=cfg.rope_base,
            norm_eps=cfg.norm_eps,
            temperature=sampling.temperature,
            top_p=sampling.top_p,
            greedy=sampling.greedy,
            interpret=_pallas_interpret(),
        )
        # in-kernel sampler is the exact full-vocab nucleus filter — no
        # window, no truncation possible
        return (codes, aemb[:, None].astype(params["codebook_embeddings"].dtype),
                jnp.int32(0))
    nq = cfg.num_codebooks
    shape = (cfg.n_fast_layer, B, cfg.fast_n_local_heads, nq, cfg.fast_head_dim)
    fast_freqs_all = jnp.asarray(
        precompute_freqs_cis(nq, cfg.fast_head_dim, cfg.rope_base)
    )
    col = jnp.arange(nq)[None, :]

    def step(carry, inp):
        x, kc, vc, pos = carry
        k = inp
        freqs = jax.lax.dynamic_slice_in_dim(fast_freqs_all, pos, 1, axis=0)
        mask = col <= pos
        y, (kc, vc) = _run_layers(
            params["fast_layers"], x, freqs, mask, (kc, vc), pos,
            cfg.fast_n_head, cfg.fast_n_local_heads, cfg.fast_head_dim, cfg.norm_eps,
        )
        y = rms_norm(y, params["fast_norm"]["w"], cfg.norm_eps)
        logits = (y @ params["fast_output"]["w"])[:, -1]  # (B, V)
        code, fl = jax.vmap(
            lambda kk, lg: sample_token(
                kk, lg, temperature=sampling.temperature, top_p=sampling.top_p,
                greedy=sampling.greedy, top_k_window=sampling.top_k_window,
                with_flag=True,
            )
        )(jax.random.split(k, B), logits)
        next_x = jnp.take(params["fast_embeddings"], code, axis=0)[:, None].astype(x.dtype)
        return (next_x, kc, vc, pos + 1), (code, jnp.sum(fl))

    init = (
        hidden,
        jnp.zeros(shape, hidden.dtype),
        jnp.zeros(shape, hidden.dtype),
        jnp.int32(0),
    )
    _, (codes, flags) = jax.lax.scan(step, init, jax.random.split(key, nq))
    # (B, nq), no fused embedding, truncation-event count across the loop
    return jnp.swapaxes(codes, 0, 1), None, jnp.sum(flags)


def _project_fast(params: Dict, hidden: jax.Array) -> jax.Array:
    if "fast_project_in" in params:
        return hidden @ params["fast_project_in"]["w"] + params["fast_project_in"].get("b", 0.0)
    return hidden


def _token_logits(params: Dict, cfg: DualARConfig, hidden: jax.Array) -> jax.Array:
    h = rms_norm(hidden, params["norm"]["w"], cfg.norm_eps)
    if cfg.tie_word_embeddings:
        return h @ params["embeddings"].T
    return h @ params["output"]["w"] + params["output"].get("b", 0.0)


# ---------------------------------------------------------------------------
# Training forward
# ---------------------------------------------------------------------------


def forward_train(
    params: Dict,
    cfg: DualARConfig,
    condition: jax.Array,  # (B, T, dim) embedded content conditions
    spk_condition: jax.Array,  # (B, S, dim)
    base_target: jax.Array,  # (B, T) int semantic targets
    target: jax.Array,  # (B, nq, T) int codebook targets
    x_lens: jax.Array,  # (B,) valid frames per sample
    wait4start: jax.Array,  # (max_delay, dim)
    wait4end: jax.Array,
    delay: int,
) -> Tuple[jax.Array, jax.Array]:
    """Training losses (codebook CE, semantic-token CE).

    Fixed-shape re-expression of DualARWrapper.forward + DualARTransformer
    .forward (dual_ar_stream.py:639-676, 477-538): per-sample interleaved
    stream [spk | (cond_t, audio_{t-delay})] with wait4start/wait4end pads,
    causal slow stack (no padding mask, as the reference), token targets at
    stride-2 offsets, teacher-forced fast stack over the 8 codebooks of every
    frame.  Padding frames are masked out of both losses."""
    B, T, D = condition.shape
    S = spk_condition.shape[1]
    nq = cfg.num_codebooks
    Tm = T + delay
    t_idx = jnp.arange(Tm)

    x_emb = embed_codes(params, cfg, target)  # (B, T, D)

    # cond stream: condition[t] for t < len, wait4end[t - len] after
    w4e_idx = jnp.clip(t_idx[None, :] - x_lens[:, None], 0, max(delay - 1, 0))
    cond_pad = jnp.pad(condition, ((0, 0), (0, delay), (0, 0)))
    cond_stream = jnp.where(
        (t_idx[None, :] < x_lens[:, None])[..., None],
        cond_pad[:, :Tm],
        wait4end[w4e_idx] if delay > 0 else jnp.zeros((B, Tm, D)),
    )
    # audio stream: wait4start[t] for t < delay, x_emb[t - delay] after
    audio_shift = jnp.pad(x_emb, ((0, 0), (delay, 0), (0, 0)))[:, :Tm]
    if delay > 0:
        w4s_part = jnp.pad(wait4start[:delay], ((0, Tm - delay), (0, 0)))
        audio_stream = jnp.where(
            (t_idx < delay)[None, :, None], w4s_part[None], audio_shift
        )
    else:
        audio_stream = audio_shift

    inter = jnp.stack([cond_stream, audio_stream], axis=2).reshape(B, 2 * Tm, D)
    emb_seq = jnp.concatenate([spk_condition, inter], axis=1)  # (B, L, D)
    L = emb_seq.shape[1]

    freqs = jnp.asarray(precompute_freqs_cis(L, cfg.head_dim, cfg.rope_base))
    col = jnp.arange(L)[None, :]
    mask = col <= jnp.arange(L)[:, None]
    x, _ = _run_layers(
        params["layers"], emb_seq, freqs, mask, None, None,
        cfg.n_head, cfg.n_local_heads, cfg.head_dim, cfg.norm_eps,
        remat=True,
    )

    # semantic-token CE at positions S + 2*(delay + f), f in [0, x_len):
    # gather the T frame positions BEFORE the vocab projection — logits at
    # the other L-T positions are never read, and (B, L, vocab) is the
    # largest activation in the step
    frame_pos = S + 2 * delay + 2 * jnp.arange(T)  # (T,)
    frame_logits = _token_logits(
        params, cfg, jnp.take(x, frame_pos, axis=1))  # (B, T, vocab)
    valid = (jnp.arange(T)[None, :] < x_lens[:, None]).astype(jnp.float32)
    logz = jax.nn.logsumexp(frame_logits.astype(jnp.float32), axis=-1)
    tgt_logit = jnp.take_along_axis(
        frame_logits.astype(jnp.float32), base_target[..., None], axis=-1
    )[..., 0]
    token_loss = jnp.sum((logz - tgt_logit) * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    # fast stack: teacher-forced codebook prediction per frame
    latents = jnp.take(x, frame_pos, axis=1)  # (B, T, D)
    latents = _project_fast(params, latents)
    cb = jnp.swapaxes(target, 1, 2)  # (B, T, nq)
    cb_emb = jnp.take(params["fast_embeddings"], cb[..., :-1], axis=0)  # (B,T,nq-1,D)
    fast_in = jnp.concatenate([latents[:, :, None], cb_emb], axis=2)  # (B,T,nq,D)
    fast_in = fast_in.reshape(B * T, nq, cfg.fast_dim)
    fast_freqs = jnp.asarray(precompute_freqs_cis(nq, cfg.fast_head_dim, cfg.rope_base))
    fmask = jnp.arange(nq)[None, :] <= jnp.arange(nq)[:, None]
    h, _ = _run_layers(
        params["fast_layers"], fast_in, fast_freqs, fmask, None, None,
        cfg.fast_n_head, cfg.fast_n_local_heads, cfg.fast_head_dim, cfg.norm_eps,
        remat=True,
    )
    h = rms_norm(h, params["fast_norm"]["w"], cfg.norm_eps)
    cb_logits = (h @ params["fast_output"]["w"]).reshape(B, T, nq, cfg.codebook_size)
    logz = jax.nn.logsumexp(cb_logits.astype(jnp.float32), axis=-1)
    tgt = jnp.take_along_axis(cb_logits.astype(jnp.float32), cb[..., None], axis=-1)[..., 0]
    cb_ce = (logz - tgt) * valid[..., None]
    codebook_loss = jnp.sum(cb_ce) / jnp.maximum(jnp.sum(valid) * nq, 1.0)
    return codebook_loss, token_loss


# ---------------------------------------------------------------------------
# The frame decode step (the hot loop)
# ---------------------------------------------------------------------------


def decode_frame(
    params: Dict,
    cfg: DualARConfig,
    state: DecodeState,
    emb2: jax.Array,  # (B, 2, dim): [new_audio_emb, new_cond_emb]
    key: jax.Array,
    sampling: SamplingConfig,
) -> Tuple[DecodeState, jax.Array, jax.Array, jax.Array]:
    """One 2-token slow step + fast codebook loop.

    Returns (state', semantic (B,), codes (B, nq), audio_emb (B, 1, dim)) —
    audio_emb is the next frame's summed codebook embedding (embed_codes),
    computed in-kernel on the Pallas fast path.

    Returns (state', semantic_token (B,), codes (B, num_codebooks)).
    Equivalent to decode_one_token_ar on a 2-token window
    (dual_ar_stream.py:1168-1219)."""
    B = emb2.shape[0]
    k_sem, k_fast = jax.random.split(key)
    if (
        cfg.use_pallas_slow_decode
        and B == 1
        and cfg.n_local_heads == cfg.n_head
        and not cfg.tie_word_embeddings
        and "b" not in params.get("output", {"b": None})
    ):
        # kernel runs layers + final norm + output head + exact full-vocab
        # nucleus sampling (top_k_window=0 semantics) in one invocation
        x2, k_rows, v_rows, semantic = slow_decode_step(
            params["layers"], emb2[0], state.k_cache[:, 0], state.v_cache[:, 0],
            state.pos, params["norm"]["w"], params["output"]["w"], k_sem,
            n_head=cfg.n_head, head_dim=cfg.head_dim,
            max_seq_len=cfg.max_seq_len, rope_base=cfg.rope_base,
            norm_eps=cfg.norm_eps, temperature=sampling.temperature,
            top_p=sampling.top_p, greedy=sampling.greedy,
            interpret=_pallas_interpret(),
        )
        # fold the 2 fresh rows into the donated caches in place — the kernel
        # reads the caches but never writes them back whole
        k_cache = jax.lax.dynamic_update_slice(
            state.k_cache, k_rows[:, None].astype(state.k_cache.dtype),
            (0, 0, state.pos, 0),
        )
        v_cache = jax.lax.dynamic_update_slice(
            state.v_cache, v_rows[:, None].astype(state.v_cache.dtype),
            (0, 0, state.pos, 0),
        )
        last = x2[None, -1:]
        caches = (k_cache, v_cache)
        sem_trunc = jnp.int32(0)  # in-kernel sampler is the exact filter
    else:
        positions = state.pos + jnp.arange(2)
        freqs = jnp.take(_freqs(cfg), positions, axis=0)
        col = jnp.arange(cfg.max_seq_len)[None, :]
        mask = col <= positions[:, None]
        x, caches = _run_layers(
            params["layers"], emb2, freqs, mask, (state.k_cache, state.v_cache),
            state.pos, cfg.n_head, cfg.n_local_heads, cfg.head_dim, cfg.norm_eps,
            use_pallas=cfg.use_pallas_decode, unroll=cfg.decode_layer_unroll,
        )
        last = x[:, -1:]
        logits = _token_logits(params, cfg, last)[:, -1]  # (B, vocab)
        semantic, sem_flags = jax.vmap(
            lambda kk, lg: sample_token(
                kk, lg, temperature=sampling.temperature, top_p=sampling.top_p,
                greedy=sampling.greedy, top_k_window=sampling.top_k_window,
                with_flag=True,
            )
        )(jax.random.split(k_sem, B), logits)
        sem_trunc = jnp.sum(sem_flags)
    hidden = _project_fast(params, last)
    codes, audio_emb, fast_trunc = _fast_decode(params, cfg, hidden, k_fast, sampling)
    if audio_emb is None:
        audio_emb = embed_codes(params, cfg, codes[:, :, None])
    new_state = DecodeState(
        caches[0], caches[1], state.pos + 2,
        state.trunc + sem_trunc + fast_trunc,
    )
    return new_state, semantic, codes, audio_emb
