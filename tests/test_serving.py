"""Batched data-parallel serving over the 8-device virtual mesh."""

import numpy as np
import pytest

import jax.numpy as jnp

import tinymodels
from streamvoiceanon_tpu.config import SamplingConfig
from streamvoiceanon_tpu.parallel.serving import BatchServer, bucket_by_frames

GREEDY = SamplingConfig(greedy=True)


def test_bucketing():
    buckets = bucket_by_frames([5, 12, 30, 7, 64], [8, 32, 64])
    assert buckets == {8: [0, 3], 32: [1, 2], 64: [4]}
    with pytest.raises(ValueError):
        bucket_by_frames([100], [8, 32, 64])


def test_batched_convert_matches_single(rng):
    cv = tinymodels.tiny_converter()
    server = BatchServer(cv, n_model=1)
    B, Ts, Tr = 8, 6, 4
    src = (rng.standard_normal((B, Ts * 2048)) * 0.1).astype(np.float32)
    ref_wav = (rng.standard_normal((1, Tr * 2048)) * 0.1).astype(np.float32)
    ref_tokens = np.asarray(cv.content_tokens(jnp.asarray(ref_wav))).repeat(B, 0)
    ref_codes = np.asarray(cv.audio_codes(jnp.asarray(ref_wav))).repeat(B, 0)
    style = rng.standard_normal((B, 192)).astype(np.float32)
    timbre = rng.standard_normal((B, 32, 128)).astype(np.float32)

    wav = server.convert(
        src, ref_tokens, ref_codes, style, timbre, sampling=GREEDY, delay=2
    )
    assert wav.shape == (B, Ts * 2048)
    assert np.isfinite(wav).all()

    # row 0 must equal a single-utterance conversion (data parallelism must
    # not change results)
    wav_single = server.convert(
        src[:1], ref_tokens[:1], ref_codes[:1], style[:1], timbre[:1],
        sampling=GREEDY, delay=2,
    )
    np.testing.assert_allclose(wav[0], wav_single[0], atol=2e-4)


def test_generate_auto_cache_rows_token_exact(rng):
    """Right-sizing the offline KV cache to the utterance (auto_cache_rows,
    the BatchServer default) must not change the sampled codes vs the full
    reference-geometry cache: cache slot == absolute position either way,
    and rows beyond the final position are never attended."""
    import jax

    from streamvoiceanon_tpu.models import arvc

    cv = tinymodels.tiny_converter()
    B, Ts, Tr = 2, 6, 4
    src_wav = (rng.standard_normal((B, Ts * 2048)) * 0.1).astype(np.float32)
    ref_wav = (rng.standard_normal((1, Tr * 2048)) * 0.1).astype(np.float32)
    src_tokens = cv.content_tokens(jnp.asarray(src_wav))
    ref_tokens = jnp.asarray(
        np.asarray(cv.content_tokens(jnp.asarray(ref_wav))).repeat(B, 0))
    ref_codes = jnp.asarray(
        np.asarray(cv.audio_codes(jnp.asarray(ref_wav))).repeat(B, 0))
    style = jnp.asarray(rng.standard_normal((B, 192)).astype(np.float32))
    timbre = jnp.asarray(rng.standard_normal((B, 32, 128)).astype(np.float32))

    kw = dict(sampling=SamplingConfig(), delay=2)
    key = jax.random.PRNGKey(7)
    full = arvc.generate(cv.arvc_params, cv.cfg.arvc, ref_tokens, ref_codes,
                         src_tokens, style, timbre, key, **kw)
    small = arvc.generate(cv.arvc_params, cv.cfg.arvc, ref_tokens, ref_codes,
                          src_tokens, style, timbre, key,
                          auto_cache_rows=True, **kw)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(small))
