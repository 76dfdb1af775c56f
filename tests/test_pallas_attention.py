"""Fused decode-attention Pallas kernel vs the XLA reference path
(interpret mode on CPU; the same kernel compiles for TPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from streamvoiceanon_tpu.ops.pallas_attention import decode_attention


def _xla_reference(q, kn, vn, kc, vc, pos):
    H, T, D = q.shape
    S = kc.shape[1]
    kc = jax.lax.dynamic_update_slice(kc, kn.astype(kc.dtype), (0, pos, 0))
    vc = jax.lax.dynamic_update_slice(vc, vn.astype(vc.dtype), (0, pos, 0))
    scores = jnp.einsum("htd,hsd->hts", q.astype(jnp.float32), kc.astype(jnp.float32))
    scores = scores / np.sqrt(D)
    col = jnp.arange(S)[None, None, :]
    row = jnp.arange(T)[None, :, None]
    scores = jnp.where(col <= pos + row, scores, -jnp.inf)
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hts,hsd->htd", w, vc.astype(jnp.float32))
    return out.astype(q.dtype), kc, vc


def test_decode_attention_matches_xla(rng):
    H, T, D, S = 4, 2, 64, 256
    q = jnp.asarray(rng.standard_normal((H, T, D)).astype(np.float32))
    kn = jnp.asarray(rng.standard_normal((H, T, D)).astype(np.float32))
    vn = jnp.asarray(rng.standard_normal((H, T, D)).astype(np.float32))
    kc = jnp.asarray(rng.standard_normal((H, S, D)).astype(np.float32))
    vc = jnp.asarray(rng.standard_normal((H, S, D)).astype(np.float32))
    pos = 37

    want_o, want_k, want_v = _xla_reference(q, kn, vn, kc, vc, pos)
    got_o, got_k, got_v = decode_attention(q, kn, vn, kc, vc, pos, interpret=True)
    np.testing.assert_allclose(np.asarray(got_k), np.asarray(want_k), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(want_o), atol=1e-4, rtol=1e-4)


def test_decode_attention_pos_zero(rng):
    H, T, D, S = 2, 2, 16, 64
    q = jnp.asarray(rng.standard_normal((H, T, D)).astype(np.float32))
    kn = jnp.asarray(rng.standard_normal((H, T, D)).astype(np.float32))
    vn = jnp.asarray(rng.standard_normal((H, T, D)).astype(np.float32))
    kc = jnp.zeros((H, S, D), jnp.float32)
    vc = jnp.zeros((H, S, D), jnp.float32)
    want_o, _, _ = _xla_reference(q, kn, vn, kc, vc, 0)
    got_o, _, _ = decode_attention(q, kn, vn, kc, vc, 0, interpret=True)
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(want_o), atol=1e-4)
