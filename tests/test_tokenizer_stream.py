"""Incremental tokenizer encode must match offline encode token-for-token."""

import numpy as np
import pytest

import jax.numpy as jnp

import tinymodels
from streamvoiceanon_tpu.models import tokenizer, tokenizer_stream

SPF = 2048


@pytest.fixture(scope="module")
def cv():
    return tinymodels.tiny_converter()


@pytest.mark.parametrize("chunk_frames", [1, 2])
def test_encode_stream_matches_offline(cv, rng, chunk_frames):
    cfg = cv.cfg.tokenizer
    T = 24
    wav = (rng.standard_normal((1, T * SPF)) * 0.2).astype(np.float32)
    offline = np.asarray(tokenizer.encode(cv.tokenizer_params, cfg, jnp.asarray(wav)))

    state = tokenizer_stream.init_stream_state(cv.tokenizer_params, cfg)
    toks = []
    n = chunk_frames * SPF
    for i in range(0, T * SPF, n):
        state, t = tokenizer_stream.encode_stream(
            cv.tokenizer_params, cfg, state, jnp.asarray(wav[:, i : i + n])
        )
        toks.append(np.asarray(t))
    got = np.concatenate(toks, axis=1)
    assert got.shape == offline.shape
    mismatch = (got != offline).mean()
    assert mismatch == 0.0, f"token mismatch rate {mismatch}"


@pytest.mark.slow
def test_encode_stream_beyond_window(cv, rng):
    """Stream longer than the attention window: the ring must keep producing
    tokens equal to offline (window-limited) encoding."""
    cfg = cv.cfg.tokenizer  # window_size=64 in the tiny config
    T = 90
    wav = (rng.standard_normal((1, T * SPF)) * 0.2).astype(np.float32)
    offline = np.asarray(tokenizer.encode(cv.tokenizer_params, cfg, jnp.asarray(wav)))
    state = tokenizer_stream.init_stream_state(cv.tokenizer_params, cfg)
    toks = []
    for i in range(T):
        state, t = tokenizer_stream.encode_stream(
            cv.tokenizer_params, cfg, state, jnp.asarray(wav[:, i * SPF : (i + 1) * SPF])
        )
        toks.append(np.asarray(t))
    got = np.concatenate(toks, axis=1)
    mismatch = (got != offline).mean()
    assert mismatch <= 0.01, f"token mismatch rate {mismatch}"


def test_encode_stream_matches_offline_dwconv(rng):
    """Streaming must stay token-exact when the LConv1d depthwise-conv branch
    is enabled (windowed_transformer.py:197-234): the per-layer GLU-output
    tail in RingState.conv_tail must reproduce the offline causal conv."""
    import jax
    from dataclasses import replace

    from streamvoiceanon_tpu.utils.tiny import tiny_config

    cfg = tiny_config().tokenizer
    cfg = replace(cfg, transformer=replace(
        cfg.transformer, dw_conv=True, conv_kernel_size=5))
    params = tokenizer.init(jax.random.PRNGKey(7), cfg)
    T = 16
    wav = (rng.standard_normal((1, T * SPF)) * 0.2).astype(np.float32)
    offline = np.asarray(tokenizer.encode(params, cfg, jnp.asarray(wav)))

    state = tokenizer_stream.init_stream_state(params, cfg)
    assert state.ring.conv_tail is not None
    toks = []
    for i in range(T):
        state, t = tokenizer_stream.encode_stream(
            params, cfg, state, jnp.asarray(wav[:, i * SPF : (i + 1) * SPF])
        )
        toks.append(np.asarray(t))
    got = np.concatenate(toks, axis=1)
    mismatch = (got != offline).mean()
    assert mismatch == 0.0, f"token mismatch rate {mismatch}"
