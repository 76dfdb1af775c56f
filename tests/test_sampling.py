"""Sampling-op unit tests: windowed nucleus filter guard (ADVICE round 1).

The decode hot path uses `top_k_window=64`: nucleus filtering over only the
top-64 logits, exact whenever the top-p nucleus fits in the window.  With
adversarially flat logits (untrained model, high temperature) the window
silently truncates the distribution relative to the reference's full-vocab
top-p (dual_ar_stream.py:1099-1132) — `window_covers_nucleus` detects this
and `sample_token` flags it at runtime.
"""

import jax
import jax.numpy as jnp
import numpy as np

from streamvoiceanon_tpu.ops.sampling import (
    sample_token,
    top_p_mask,
    window_covers_nucleus,
)


def test_window_covers_nucleus_peaked_vs_flat():
    v = 8192
    # peaked: one dominant logit -> top-64 holds essentially all mass
    peaked = jnp.zeros(v).at[17].set(20.0)
    assert bool(window_covers_nucleus(peaked, 64, 0.7))
    # flat: top-64 of 8192 equal logits holds 64/8192 << 0.7
    flat = jnp.zeros(v)
    assert not bool(window_covers_nucleus(flat, 64, 0.7))


def test_windowed_sampling_matches_exact_when_covered():
    """When the nucleus fits in the window, windowed and exact paths induce
    the same support (checked via many samples with shared keys)."""
    v = 512
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal(v) * 4.0, jnp.float32)
    assert bool(window_covers_nucleus(logits, 64, 0.7))
    keys = jax.random.split(jax.random.PRNGKey(1), 64)
    exact = jax.vmap(
        lambda k: sample_token(k, logits, top_p=0.7, top_k_window=0)
    )(keys)
    # exact nucleus support
    support = np.flatnonzero(np.isfinite(np.asarray(top_p_mask(logits, 0.7))))
    windowed = jax.vmap(
        lambda k: sample_token(k, logits, top_p=0.7, top_k_window=64)
    )(keys)
    assert set(np.asarray(exact).tolist()) <= set(support.tolist())
    assert set(np.asarray(windowed).tolist()) <= set(support.tolist())


def test_flat_logits_truncation_flag():
    """The truncation guard is pure data (no host callback — it must work on
    the callback-free axon relay): flag=1 on adversarially flat logits,
    flag=0 when the nucleus fits in the window, and it composes with jit."""
    flat = jnp.zeros(8192)
    peaked = jnp.zeros(8192).at[17].set(20.0)

    @jax.jit
    def f(key, logits):
        return sample_token(key, logits, top_p=0.7, top_k_window=64,
                            with_flag=True)

    tok, flag = f(jax.random.PRNGKey(0), flat)
    assert 0 <= int(tok) < 8192
    assert int(flag) == 1
    _, flag = f(jax.random.PRNGKey(0), peaked)
    assert int(flag) == 0
    # exact full-vocab path never truncates
    _, flag = jax.jit(lambda k: sample_token(
        k, flat, top_p=0.7, top_k_window=0, with_flag=True))(jax.random.PRNGKey(0))
    assert int(flag) == 0
