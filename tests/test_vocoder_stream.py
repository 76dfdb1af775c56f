"""Incremental streaming vocoder must equal offline decode exactly."""

import numpy as np
import pytest

import jax.numpy as jnp

import tinymodels
from streamvoiceanon_tpu.models import vocoder


@pytest.fixture(scope="module")
def cv():
    return tinymodels.tiny_converter()


@pytest.mark.parametrize("chunk", [1, 2, 4])
def test_decode_stream_prefix_consistency(cv, rng, chunk):
    cfg = cv.cfg.vocoder
    T = 12
    codes = jnp.asarray(rng.integers(0, 1000, (1, 8, T)).astype(np.int32))
    full = np.asarray(vocoder.decode(cv.vocoder_params, cfg, codes))
    state = vocoder.init_stream_state(cv.vocoder_params, cfg)
    outs = []
    for i in range(0, T, chunk):
        state, wav = vocoder.decode_stream(
            cv.vocoder_params, cfg, state, codes[:, :, i : i + chunk]
        )
        outs.append(np.asarray(wav))
    got = np.concatenate(outs, axis=-1)
    assert got.shape == full.shape == (1, T * 2048)
    np.testing.assert_allclose(got, full, atol=1e-4)
