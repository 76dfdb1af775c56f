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


def test_decode_frame_pallas_flag_parity(rng):
    """End-to-end flag parity: decode_frame with use_pallas_decode (pre-padded
    cache layout + fused kernel, interpret mode on CPU) must reproduce the XLA
    path's greedy tokens and hidden-state numerics after prefill."""
    from streamvoiceanon_tpu import config as C
    from streamvoiceanon_tpu.models import dual_ar

    base = C.DualARConfig(
        vocab_size=256, n_layer=2, n_head=2, dim=32, intermediate_size=64,
        head_dim=16, max_seq_len=256, codebook_size=64, num_codebooks=8,
        n_fast_layer=1, fast_dim=32, fast_n_head=2, fast_head_dim=16,
        fast_intermediate_size=64,
    )
    cfg_p = C.replace(base, use_pallas_decode=True)
    assert cfg_p.cache_head_dim == 128 and base.cache_head_dim == 16

    params = dual_ar.prepare_params(dual_ar.random_params(jax.random.PRNGKey(1), base))
    samp = C.SamplingConfig(greedy=True)
    prompt = jnp.asarray(rng.standard_normal((1, 12, base.dim)).astype(np.float32))
    valid = jnp.int32(9)

    outs = {}
    for name, cfg in (("xla", base), ("pallas", cfg_p)):
        state = dual_ar.init_state(cfg, batch=1, cache_dtype=jnp.float32)
        state, hidden = dual_ar.prefill(params, cfg, state, prompt, valid)
        toks, all_codes = [], []
        key = jax.random.PRNGKey(2)
        for i in range(4):
            emb2 = jnp.asarray(
                np.random.default_rng(100 + i).standard_normal((1, 2, base.dim)).astype(np.float32)
            )
            state, tok, codes, _ = dual_ar.decode_frame(params, cfg, state, emb2, key, samp)
            toks.append(int(tok[0]))
            all_codes.append(np.asarray(codes))
        outs[name] = (toks, np.stack(all_codes), np.asarray(hidden),
                      np.asarray(state.k_cache[..., : base.head_dim]))

    assert outs["xla"][0] == outs["pallas"][0]
    np.testing.assert_array_equal(outs["xla"][1], outs["pallas"][1])
    np.testing.assert_allclose(outs["xla"][2], outs["pallas"][2], atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(outs["xla"][3], outs["pallas"][3], atol=1e-4, rtol=1e-4)
    # padded lanes beyond head_dim stay zero in the pallas layout
    state_p = dual_ar.init_state(cfg_p, batch=1, cache_dtype=jnp.float32)
    assert state_p.k_cache.shape[-1] == 128


def test_decode_frame_unroll_parity(rng):
    """decode_layer_unroll only changes the compiled schedule of the layer
    scan, never the math: greedy tokens and codes must match unroll=1
    exactly, including a factor that does not divide n_layer."""
    from streamvoiceanon_tpu import config as C
    from streamvoiceanon_tpu.models import dual_ar

    base = C.DualARConfig(
        vocab_size=256, n_layer=3, n_head=2, dim=32, intermediate_size=64,
        head_dim=16, max_seq_len=256, codebook_size=64, num_codebooks=8,
        n_fast_layer=1, fast_dim=32, fast_n_head=2, fast_head_dim=16,
        fast_intermediate_size=64,
    )
    params = dual_ar.prepare_params(dual_ar.random_params(jax.random.PRNGKey(1), base))
    samp = C.SamplingConfig(greedy=True)
    prompt = jnp.asarray(rng.standard_normal((1, 12, base.dim)).astype(np.float32))

    outs = {}
    for unroll in (1, 2, 3):
        cfg = C.replace(base, decode_layer_unroll=unroll)
        state = dual_ar.init_state(cfg, batch=1, cache_dtype=jnp.float32)
        state, _ = dual_ar.prefill(params, cfg, state, prompt, jnp.int32(9))
        toks, all_codes = [], []
        for i in range(3):
            emb2 = jnp.asarray(
                np.random.default_rng(200 + i).standard_normal((1, 2, base.dim)).astype(np.float32)
            )
            state, tok, codes, _ = dual_ar.decode_frame(
                params, cfg, state, emb2, jax.random.PRNGKey(2), samp)
            toks.append(int(tok[0]))
            all_codes.append(np.asarray(codes))
        outs[unroll] = (toks, np.stack(all_codes), np.asarray(state.k_cache))

    for unroll in (2, 3):
        assert outs[1][0] == outs[unroll][0]
        np.testing.assert_array_equal(outs[1][1], outs[unroll][1])
        np.testing.assert_allclose(outs[1][2], outs[unroll][2], atol=1e-5, rtol=1e-5)
