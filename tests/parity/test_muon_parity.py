"""Parity of the Muon optimizer update against the reference implementation."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from streamvoiceanon_tpu.train import muon as muon_mod

ref_muon = pytest.importorskip("optimizers.modified_muon")


@pytest.mark.parity
def test_newton_schulz_parity(rng):
    g = rng.standard_normal((3, 24, 16)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref_muon.zeropower_via_newtonschulz5(torch.from_numpy(g), 6).numpy()
    out = np.asarray(muon_mod.newton_schulz5(jnp.asarray(g), 6))
    np.testing.assert_allclose(out, out_ref, atol=1e-4, rtol=1e-3)


@pytest.mark.parity
def test_muon_step_parity(rng):
    """Two Muon steps on a toy parameter match the torch optimizer."""
    w0 = rng.standard_normal((24, 16)).astype(np.float32)
    grads = [rng.standard_normal((24, 16)).astype(np.float32) for _ in range(2)]

    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = ref_muon.Muon([p], lr=1e-2, weight_decay=0.01, ns_steps=6)
    for g in grads:
        p.grad = torch.from_numpy(g.copy())
        opt.step()
    want = p.detach().numpy()

    tx = muon_mod.muon(lr=1e-2, weight_decay=0.01, ns_steps=6)
    params = jnp.asarray(w0)
    state = tx.init(params)
    for g in grads:
        upd, state = tx.update(jnp.asarray(g), state, params)
        params = params + upd
    np.testing.assert_allclose(np.asarray(params), want, atol=2e-4, rtol=1e-3)
