"""Parity of the training forward losses against the PyTorch reference
(DualARWrapper.forward through ARVCWrapper.forward)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from streamvoiceanon_tpu.models import arvc

das = pytest.importorskip("modules.dual_ar_stream")

from test_dual_ar_parity import ref_and_params, small_cfg  # noqa: F401,E402


@pytest.mark.parity
@pytest.mark.parametrize("delay_idx", [0, 2])
def test_train_losses_match(ref_and_params, rng, delay_idx, monkeypatch):  # noqa: F811
    ref, params, cfg = ref_and_params
    d = cfg.decoder
    delay = list(d.delay)[delay_idx]

    # pin the reference's random delay draw (dual_ar_stream.py:651)
    orig_randint = torch.randint

    def fixed_randint(low, high, size, **kw):
        return torch.tensor([delay_idx])

    monkeypatch.setattr(torch, "randint", fixed_randint)

    B, T = 2, 12
    x_lens = np.array([12, 9])
    content = rng.integers(0, d.vocab_size, (B, T))
    base_target = rng.integers(0, d.vocab_size, (B, T))
    target = rng.integers(0, d.codebook_size, (B, d.num_codebooks, T))
    style = rng.standard_normal((B, cfg.style_dim)).astype(np.float32)
    timbre = rng.standard_normal((B, 32, cfg.context_dim)).astype(np.float32)

    ref.train(False)
    with torch.no_grad():
        cb_loss_ref, tok_loss_ref, _, _ = ref(
            torch.from_numpy(x_lens),
            torch.from_numpy(content),
            torch.from_numpy(base_target)[None],  # trainer passes (1, B, T) -> squeeze(0)
            torch.from_numpy(target),
            style_vectors=torch.from_numpy(style),
            timbre_latents=torch.from_numpy(timbre),
        )
    monkeypatch.setattr(torch, "randint", orig_randint)

    cb_loss, tok_loss = arvc.forward_train(
        params, cfg, jnp.asarray(content), jnp.asarray(base_target),
        jnp.asarray(target), jnp.asarray(x_lens), jnp.asarray(style),
        jnp.asarray(timbre), delay,
    )
    np.testing.assert_allclose(float(cb_loss), float(cb_loss_ref), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(float(tok_loss), float(tok_loss_ref), atol=2e-4, rtol=1e-4)
