"""MuonAdamW optimizer (optax-style).

Re-implements the reference's modified Muon (optimizers/modified_muon.py:
15-101): Nesterov SGD-momentum whose 2-D updates are orthogonalized with a
quintic Newton-Schulz iteration (ns_steps=6, coefficients 3.4445, -4.7750,
2.0315), scaled by sqrt(max(dim)), with decoupled weight decay; parameters
whose names match `exclude_keys` or with < 2 effective dims go to AdamW
(optimizers/modified_muon.py:161-186 routing).

TPU notes: the Newton-Schulz loop is 5 matmuls x ns_steps on the MXU per
parameter; stacked-layer parameters (L, m, n) orthogonalize all layers in one
batched matmul, which is exactly how this framework stores transformers.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import optax


def newton_schulz5(g: jax.Array, steps: int = 6) -> jax.Array:
    """Batched quintic Newton-Schulz orthogonalization (…, m, n)."""
    a, b, c = 3.4445, -4.7750, 2.0315
    x = g.astype(jnp.float32)
    transposed = x.shape[-2] > x.shape[-1]
    if transposed:
        x = jnp.swapaxes(x, -1, -2)
    norm = jnp.sqrt(jnp.sum(x * x, axis=(-2, -1), keepdims=True))
    x = x / jnp.maximum(norm, 1e-7)
    for _ in range(steps):
        A = x @ jnp.swapaxes(x, -1, -2)
        B = b * A + c * (A @ A)
        x = a * x + B @ x
    if transposed:
        x = jnp.swapaxes(x, -1, -2)
    return x.astype(g.dtype)


class MuonState(NamedTuple):
    momentum: Any


def muon(
    lr: float = 1e-4,
    weight_decay: float = 0.01,
    momentum: float = 0.95,
    nesterov: bool = True,
    ns_steps: int = 6,
) -> optax.GradientTransformation:
    """Muon update for >= 2-D parameters.  For a (…, m, n) parameter the
    update is -lr * sqrt(max(m, n)) * NS5(momentum_grad) plus decoupled decay.
    Stacked-layer tensors (L, m, n) are treated as L batched matrices."""

    def init(params):
        return MuonState(jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params):
        mom = jax.tree.map(
            lambda b, g: b + (1.0 - momentum) * (g - b), state.momentum, grads
        )
        eff = (
            jax.tree.map(lambda g, b: g + momentum * (b - g), grads, mom)
            if nesterov
            else mom
        )

        def one(g, p):
            shape = g.shape
            if g.ndim > 3:  # conv filters: flatten trailing dims
                g = g.reshape(g.shape[0], g.shape[1], -1)
            o = newton_schulz5(g, ns_steps)
            scale = float(max(o.shape[-2], o.shape[-1])) ** 0.5
            upd = -lr * scale * o.reshape(shape)
            if weight_decay > 0:
                upd = upd - lr * weight_decay * p
            return upd

        updates = jax.tree.map(one, eff, params)
        return updates, MuonState(mom)

    return optax.GradientTransformation(init, update)


def _is_muon_param(path, leaf, exclude_keys: Sequence[str]) -> bool:
    keys = [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]
    if any(any(ex in k for ex in exclude_keys) for k in keys):
        return False
    squeezed = [d for d in leaf.shape if d != 1]
    return len(squeezed) >= 2


def muon_adamw(
    lr: float = 1e-4,
    adamw_betas=(0.9, 0.98),
    adamw_eps: float = 1e-6,
    muon_weight_decay: float = 0.01,
    adamw_weight_decay: float = 0.01,
    exclude_keys: Sequence[str] = ("embedding", "lm_head", "output", "to_logits"),
    ns_steps: int = 6,
) -> optax.GradientTransformation:
    """Combined optimizer with the reference's routing rule: >= 2-D params not
    name-matching exclude_keys -> Muon, everything else -> AdamW
    (configs/config_firefly_arvcasr_8192_delay0_8.yaml optimizer_params)."""

    def label(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: "muon" if _is_muon_param(path, leaf, exclude_keys)
            else "adamw",
            params,
        )

    adamw = optax.adamw(
        lr, b1=adamw_betas[0], b2=adamw_betas[1], eps=adamw_eps,
        weight_decay=adamw_weight_decay,
    )
    # muon() already applies lr; use identity scaling afterwards
    return optax.multi_transform(
        {"muon": muon(lr, muon_weight_decay, ns_steps=ns_steps), "adamw": adamw},
        label,
    )


def exp_decay_schedule(lr: float, gamma: float = 0.999997, min_lr: float = 1e-5):
    """MinLRExponentialLR (optimizers/default.py:5-12): exponential decay with
    a floor, expressed as an optax schedule multiplier."""

    def schedule(step):
        return jnp.maximum(lr * (gamma**step), min_lr) / lr

    return schedule
