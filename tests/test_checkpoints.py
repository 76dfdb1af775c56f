"""Converter-level Orbax checkpoint round trip."""

import pytest
import numpy as np

import jax.numpy as jnp

import tinymodels
from streamvoiceanon_tpu.runtime import checkpoints


@pytest.mark.slow
def test_converter_checkpoint_roundtrip(tmp_path):
    cv = tinymodels.tiny_converter()
    path = checkpoints.save(cv, str(tmp_path / "cv"))
    cv2 = checkpoints.load(path, cv.cfg)
    a = np.asarray(cv.arvc_params["embedding"])
    b = np.asarray(cv2.arvc_params["embedding"])
    np.testing.assert_array_equal(a, b)
    assert cv2.campplus_params is None
    # restored converter actually runs
    wav = (np.random.default_rng(0).standard_normal(4 * 2048) * 0.1).astype(np.float32)
    toks = cv2.content_tokens(jnp.asarray(wav)[None])
    assert toks.shape == (1, 4)
