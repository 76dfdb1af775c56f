"""Parity tests for the VMEM-resident fast-codebook decoder
(ops/pallas_fast_decode.py) against the XLA scan path in models/dual_ar.

The kernel's sampling reproduces sample_token's top_k_window=0 exact nucleus
semantics with the identical Gumbel key structure, so sampled token sequences
match token-for-token — any divergence cascades through the AR feedback,
making these end-to-end sequence comparisons strict.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamvoiceanon_tpu.config import DualARConfig, SamplingConfig
from streamvoiceanon_tpu.models import dual_ar
from streamvoiceanon_tpu.ops.pallas_fast_decode import fast_decode


def tiny_cfg(**kw):
    base = dict(
        n_layer=2, n_head=4, dim=256, intermediate_size=512,
        n_fast_layer=3, fast_dim=256, fast_n_head=4, fast_head_dim=64,
        fast_intermediate_size=512, codebook_size=100, num_codebooks=8,
        vocab_size=300, max_seq_len=64,
    )
    base.update(kw)
    return DualARConfig(**base)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    params = dual_ar.prepare_params(
        dual_ar.random_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    )
    hidden = jax.random.normal(jax.random.PRNGKey(1), (3, cfg.fast_dim), jnp.float32)
    return cfg, params, hidden


def run_kernel(cfg, params, hidden, key, **kw):
    return fast_decode(
        params["fast_layers"], params["fast_norm"]["w"],
        params["fast_output"]["w"], params["fast_embeddings"],
        params["codebook_embeddings"], hidden, key,
        nq=cfg.num_codebooks, n_head=cfg.fast_n_head,
        head_dim=cfg.fast_head_dim, vocab=cfg.codebook_size,
        rope_base=cfg.rope_base, norm_eps=cfg.norm_eps,
        interpret=True, **kw,
    )


def test_greedy_matches_xla_scan(setup):
    cfg, params, hidden = setup
    ref, _, _ = dual_ar._fast_decode(
        params, cfg, hidden[:, None, :], jax.random.PRNGKey(2),
        SamplingConfig(greedy=True),
    )
    got, emb = run_kernel(cfg, params, hidden, jax.random.PRNGKey(2), greedy=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    # fused next-frame embedding == embed_codes of the sampled codes
    want = dual_ar.embed_codes(params, cfg, got[:, :, None])[:, 0]
    np.testing.assert_allclose(np.asarray(emb), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("seed", [3, 4, 5, 7])
def test_sampled_matches_xla_exact_nucleus(setup, seed):
    cfg, params, hidden = setup
    samp = SamplingConfig(greedy=False, top_k_window=0, temperature=0.7, top_p=0.7)
    ref, _, _ = dual_ar._fast_decode(
        params, cfg, hidden[:, None, :], jax.random.PRNGKey(seed), samp
    )
    got, _ = run_kernel(
        cfg, params, hidden, jax.random.PRNGKey(seed),
        temperature=0.7, top_p=0.7, greedy=False,
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_sampled_flat_logits_nucleus_bisection(setup):
    """Near-flat logits (untrained model) push the nucleus to hundreds of
    tokens — the bisection threshold must still match the sort-based filter."""
    cfg, params, _ = setup
    hidden = (
        jax.random.normal(jax.random.PRNGKey(9), (2, cfg.fast_dim), jnp.float32)
        * 1e-3
    )
    samp = SamplingConfig(greedy=False, top_k_window=0, temperature=1.5, top_p=0.9)
    ref, _, _ = dual_ar._fast_decode(
        params, cfg, hidden[:, None, :], jax.random.PRNGKey(11), samp
    )
    got, _ = run_kernel(
        cfg, params, hidden, jax.random.PRNGKey(11),
        temperature=1.5, top_p=0.9, greedy=False,
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_decode_frame_flag_integration(setup):
    """decode_frame with use_pallas_fast_decode=True (B=1, greedy) emits the
    same semantic token and codes as the XLA scan path."""
    cfg, params, _ = setup
    cfg_pl = tiny_cfg(use_pallas_fast_decode=True)
    samp = SamplingConfig(greedy=True)
    emb2 = jax.random.normal(jax.random.PRNGKey(20), (1, 2, cfg.dim), jnp.float32) * 0.1
    for c in (cfg, cfg_pl):
        state = dual_ar.init_state(c, batch=1, cache_dtype=jnp.float32)
        st, sem, codes, _ = dual_ar.decode_frame(
            params, c, state, emb2, jax.random.PRNGKey(21), samp
        )
        if c is cfg:
            ref = (np.asarray(sem), np.asarray(codes))
    np.testing.assert_array_equal(ref[0], np.asarray(sem))
    np.testing.assert_array_equal(ref[1], np.asarray(codes))


def test_batch_gt1_falls_back_to_scan(setup):
    """With batch > 1 the flag is a no-op (XLA scan handles the batch)."""
    cfg, params, hidden = setup
    cfg_pl = tiny_cfg(use_pallas_fast_decode=True)
    samp = SamplingConfig(greedy=True)
    ref, _, _ = dual_ar._fast_decode(params, cfg, hidden[:, None, :], jax.random.PRNGKey(2), samp)
    got, _, _ = dual_ar._fast_decode(params, cfg_pl, hidden[:, None, :], jax.random.PRNGKey(2), samp)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
