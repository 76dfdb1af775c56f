"""Jittable token sampling: temperature, top-p (nucleus), repetition penalty.

Reproduces the sampling semantics of reference dual_ar_stream.py:1081-1132
(`sample` / `logits_to_probs`: rep-penalty -> top-p mask -> temperature ->
softmax -> multinomial) as fully-traced JAX with no host sync — sort-based
nucleus filtering plus an exponential-race multinomial (the same trick as the
reference's `multinomial_sample_one_no_sync`, :1092-1096).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def apply_repetition_penalty(
    logits: jax.Array, previous_tokens: jax.Array, penalty: float
) -> jax.Array:
    """logits (V,), previous_tokens (P,) int32.  Scores of previously emitted
    tokens are divided (if positive) or multiplied (if negative) by penalty."""
    score = jnp.take(logits, previous_tokens)
    score = jnp.where(score < 0, score * penalty, score / penalty)
    return logits.at[previous_tokens].set(score)


def top_p_mask(logits: jax.Array, top_p: float) -> jax.Array:
    """Mask (set to -inf) all but the smallest prefix of descending-prob
    tokens with cumulative probability <= top_p; always keeps the argmax."""
    sorted_logits = jnp.sort(logits)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # threshold logit value: smallest kept logit
    keep = cum - probs <= top_p  # keep token i if cumprob *before* it <= p
    # note: reference keeps tokens while cumsum <= p and always position 0;
    # "cum - probs <= p" is exactly cumsum_{j<i} <= p, matching
    # sorted_indices_to_remove shifted right by one (dual_ar_stream.py:1120-1126)
    kth = jnp.sum(keep, axis=-1) - 1
    thresh = jnp.take_along_axis(sorted_logits, kth[..., None], axis=-1)[..., 0]
    return jnp.where(logits < thresh, -jnp.inf, logits)


def window_covers_nucleus(logits: jax.Array, top_k_window: int, top_p: float):
    """True iff the top-`k` window holds at least `top_p` cumulative
    probability, i.e. the windowed nucleus filter in `sample_token` is exact
    for these logits.  Pure/jittable — used by tests and runtime validation."""
    vals, _ = jax.lax.top_k(logits.astype(jnp.float32), top_k_window)
    logz = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1, keepdims=True)
    return jnp.sum(jnp.exp(vals - logz), axis=-1) >= top_p


def sample_token(
    key: jax.Array,
    logits: jax.Array,
    *,
    temperature: float = 0.7,
    top_p: float = 0.7,
    repetition_penalty: float = 1.0,
    previous_tokens: Optional[jax.Array] = None,
    greedy: bool = False,
    top_k_window: int = 0,
    with_flag: bool = False,
):
    """Sample one token id (scalar int32) from logits (V,).

    With `top_k_window` > 0 the nucleus filter runs over only the top-k
    logits (jax.lax.top_k + cumsum over k candidates) instead of a full-vocab
    sort — the decode hot path uses k=64..256, which is exact whenever the
    nucleus fits in the window (always, at the reference's top_p=0.7 with a
    trained model) and orders of magnitude cheaper on TPU.

    `with_flag=True` returns (token, truncated) where `truncated` is an int32
    scalar that is 1 iff the windowed filter silently truncated the nucleus
    (window mass < top_p: flat logits / untrained model / high temperature).
    The flag is pure data — no host callback — so the guard works on every
    backend including the axon relay (which lacks host send/recv); the
    runtime accumulates it in the decode state (DecodeState.trunc) and
    surfaces it through StreamSession.truncation_count / LiveStatus."""
    logits = logits.astype(jnp.float32)
    zero = jnp.zeros((), jnp.int32)
    if previous_tokens is not None and repetition_penalty != 1.0:
        logits = apply_repetition_penalty(logits, previous_tokens, repetition_penalty)
    if greedy:
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (tok, zero) if with_flag else tok
    if top_k_window and top_k_window < logits.shape[-1]:
        vals, idx = jax.lax.top_k(logits, top_k_window)  # descending
        flag = zero
        if top_p < 1.0:
            # normalize against the FULL vocabulary (matching the reference's
            # softmax-then-cumsum over all logits), not just the window
            logz = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
            probs = jnp.exp(vals - logz)
            cum = jnp.cumsum(probs, axis=-1)
            keep = cum - probs <= top_p  # keep while cumprob before <= p
            vals = jnp.where(keep, vals, -jnp.inf)
            # guard the approximation: if the window's total mass is below
            # top_p the nucleus extends past the window and the distribution
            # is silently truncated.  Exact path is top_k_window=0.
            flag = (cum[..., -1] < top_p).astype(jnp.int32)
        vals = vals / jnp.maximum(temperature, 1e-5)
        g = jax.random.gumbel(key, vals.shape, jnp.float32)
        j = jnp.argmax(vals + g, axis=-1)
        tok = jnp.take(idx, j).astype(jnp.int32)
        return (tok, flag) if with_flag else tok
    if top_p < 1.0:
        logits = top_p_mask(logits, top_p)
    logits = logits / jnp.maximum(temperature, 1e-5)
    # exponential race == gumbel-max == multinomial, no host sync
    g = jax.random.gumbel(key, logits.shape, jnp.float32)
    tok = jnp.argmax(logits + g, axis=-1).astype(jnp.int32)
    return (tok, zero) if with_flag else tok
