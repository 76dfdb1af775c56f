"""Sharded ARVC training step.

One jitted function: loss -> grad -> optimizer update, with the batch sharded
over the 'data' mesh axis and the LM weights optionally sharded over 'model'.
XLA inserts the gradient all-reduce (data axis) and the Megatron-style psums
(model axis) from the array shardings — there is no explicit collective code
(SURVEY.md §2.4: the reference's DDP equivalent + optional TP)."""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from streamvoiceanon_tpu.config import ARVCConfig
from streamvoiceanon_tpu.models import arvc


class TrainState(NamedTuple):
    params: Dict
    opt_state: optax.OptState
    step: jax.Array


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.01,
                   clip: float = 1000.0) -> optax.GradientTransformation:
    """AdamW fallback optimizer (MuonAdamW lives in train/muon.py); grad
    clipping matches the reference's clip 1000 (arvc_trainer.py:388)."""
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(lr, b1=0.9, b2=0.98, eps=1e-6, weight_decay=weight_decay),
    )


def loss_fn(params, cfg: ARVCConfig, batch: Dict, delay: int):
    cb, tok = arvc.forward_train(
        params, cfg, batch["content"], batch["base_target"], batch["target"],
        batch["x_lens"], batch["style"], batch["timbre"], delay,
    )
    return cb + tok, {"codebook_loss": cb, "token_loss": tok}


@functools.partial(jax.jit, static_argnums=(2, 3, 4), donate_argnums=(0,))
def train_step(
    state: TrainState,
    batch: Dict,
    cfg: ARVCConfig,
    optimizer: optax.GradientTransformation,
    delay: int,
) -> Tuple[TrainState, Dict]:
    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, cfg, batch, delay
    )
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    aux = dict(aux, loss=loss, grad_norm=optax.global_norm(grads))
    return TrainState(params, opt_state, state.step + 1), aux
