"""Parity of the CAM++ style encoder against the PyTorch reference."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from streamvoiceanon_tpu.config import CAMPPlusConfig
from streamvoiceanon_tpu.models import campplus

dtdnn = pytest.importorskip("modules.campplus.DTDNN")


@pytest.mark.parity
def test_campplus_parity(rng):
    cfg = CAMPPlusConfig()
    torch.manual_seed(0)
    ref = dtdnn.CAMPPlus(feat_dim=80, embedding_size=192).eval()
    params = campplus.convert(ref.state_dict(), cfg)

    feat = rng.standard_normal((2, 211, 80)).astype(np.float32)
    feat = feat - feat.mean(axis=1, keepdims=True)
    lens = torch.tensor([211 // 2, 180 // 2], dtype=torch.int32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(feat), lens).numpy()
    out = campplus.apply(params, cfg, jnp.asarray(feat), jnp.asarray(lens.numpy()))
    assert out.shape == out_ref.shape == (2, 192)
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=2e-3, rtol=1e-3)
