"""Training-stack learning check: overfitting one batch must drive both CE
losses well below their initial values (validates gradients through the full
interleaved dual-AR forward + MuonAdamW)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

import tinymodels
from streamvoiceanon_tpu.models import arvc
from streamvoiceanon_tpu.train import muon as muon_mod


@pytest.mark.slow
def test_overfit_one_batch():
    cv = tinymodels.tiny_converter()
    cfg = cv.cfg.arvc
    d = cfg.decoder
    rng = np.random.default_rng(0)
    B, T = 2, 10
    batch = dict(
        content=jnp.asarray(rng.integers(0, d.vocab_size, (B, T))),
        base_target=jnp.asarray(rng.integers(0, d.vocab_size, (B, T))),
        target=jnp.asarray(rng.integers(0, d.codebook_size, (B, d.num_codebooks, T))),
        x_lens=jnp.asarray([T, T - 2]),
        style=jnp.asarray(rng.standard_normal((B, 192)).astype(np.float32)),
        timbre=jnp.asarray(rng.standard_normal((B, 32, 128)).astype(np.float32)),
    )

    params = cv.arvc_params
    tx = optax.chain(
        optax.clip_by_global_norm(1000.0), muon_mod.muon_adamw(lr=3e-3)
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            cb, tok = arvc.forward_train(
                p, cfg, batch["content"], batch["base_target"], batch["target"],
                batch["x_lens"], batch["style"], batch["timbre"], 2,
            )
            return cb + tok, (cb, tok)

        (loss, (cb, tok)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, cb, tok

    losses = []
    for i in range(60):
        params, opt_state, loss, cb, tok = step(params, opt_state)
        losses.append(float(loss))
    init, final = losses[0], losses[-1]
    # random-chance CE: ln(1000) + ln(8192) ~ 15.9; memorizing one batch
    # must cut the total loss by far more than noise
    assert final < init * 0.5, f"no learning: {init:.3f} -> {final:.3f}"
    assert np.isfinite(losses).all()
