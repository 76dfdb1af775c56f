"""Grid-pipelined slow-step Pallas kernel vs the XLA scan path
(interpret mode on CPU; the same kernel compiles for TPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from streamvoiceanon_tpu import config as C
from streamvoiceanon_tpu.models import dual_ar


def _tiny(**kw):
    return C.DualARConfig(
        vocab_size=256, n_layer=3, n_head=2, dim=32, intermediate_size=64,
        head_dim=16, max_seq_len=256, codebook_size=64, num_codebooks=8,
        n_fast_layer=1, fast_dim=32, fast_n_head=2, fast_head_dim=16,
        fast_intermediate_size=64, **kw,
    )


def test_decode_frame_slow_kernel_parity(rng):
    """End-to-end flag parity: decode_frame with use_pallas_slow_decode (flat
    cache layout + grid-over-layers kernel) must reproduce the XLA scan
    path's greedy tokens, codes, and hidden numerics after an XLA prefill."""
    base = _tiny()
    cfg_p = _tiny(use_pallas_slow_decode=True)

    params = dual_ar.prepare_params(dual_ar.random_params(jax.random.PRNGKey(1), base))
    samp = C.SamplingConfig(greedy=True)
    prompt = jnp.asarray(rng.standard_normal((1, 12, base.dim)).astype(np.float32))
    valid = jnp.int32(9)

    outs = {}
    for name, cfg in (("xla", base), ("pallas", cfg_p)):
        state = dual_ar.init_state(cfg, batch=1, cache_dtype=jnp.float32)
        state, hidden = dual_ar.prefill(params, cfg, state, prompt, valid)
        toks, all_codes, hiddens = [], [], []
        key = jax.random.PRNGKey(2)
        for i in range(4):
            emb2 = jnp.asarray(
                np.random.default_rng(300 + i)
                .standard_normal((1, 2, base.dim))
                .astype(np.float32)
            )
            state, tok, codes, _ = dual_ar.decode_frame(params, cfg, state, emb2, key, samp)
            toks.append(int(tok[0]))
            all_codes.append(np.asarray(codes))
        # compare caches in a layout-independent form: (L, H, S, D)
        kc = state.k_cache[:, 0]
        if kc.ndim == 3:  # flat (L, S, H*D)
            L, S, _ = kc.shape
            kc = np.asarray(kc).reshape(L, S, base.n_head, base.head_dim)
            kc = np.swapaxes(kc, 1, 2)
        else:
            kc = np.asarray(kc)
        outs[name] = (toks, np.stack(all_codes), np.asarray(hidden), kc,
                      int(state.pos))

    assert outs["xla"][0] == outs["pallas"][0]
    np.testing.assert_array_equal(outs["xla"][1], outs["pallas"][1])
    np.testing.assert_allclose(outs["xla"][2], outs["pallas"][2], atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(outs["xla"][3], outs["pallas"][3], atol=1e-4, rtol=1e-4)
    assert outs["xla"][4] == outs["pallas"][4]


def test_decode_frame_slow_kernel_sampling_parity(rng):
    """The in-kernel nucleus sampler (final norm + head + bisection filter +
    Gumbel race) must reproduce the XLA path's sampled semantic tokens
    token-for-token at top_k_window=0 (exact full-vocab semantics) with the
    same key."""
    base = _tiny()
    cfg_p = _tiny(use_pallas_slow_decode=True)
    params = dual_ar.prepare_params(dual_ar.random_params(jax.random.PRNGKey(1), base))
    samp = C.SamplingConfig(temperature=0.9, top_p=0.7, greedy=False, top_k_window=0)
    prompt = jnp.asarray(rng.standard_normal((1, 12, base.dim)).astype(np.float32))

    outs = {}
    for name, cfg in (("xla", base), ("pallas", cfg_p)):
        state = dual_ar.init_state(cfg, batch=1, cache_dtype=jnp.float32)
        state, _ = dual_ar.prefill(params, cfg, state, prompt, jnp.int32(9))
        toks, all_codes = [], []
        for i in range(6):
            emb2 = jnp.asarray(
                np.random.default_rng(500 + i)
                .standard_normal((1, 2, base.dim))
                .astype(np.float32)
            )
            key = jax.random.PRNGKey(100 + i)
            state, tok, codes, _ = dual_ar.decode_frame(params, cfg, state, emb2, key, samp)
            toks.append(int(tok[0]))
            all_codes.append(np.asarray(codes))
        outs[name] = (toks, np.stack(all_codes))

    assert outs["xla"][0] == outs["pallas"][0]
    np.testing.assert_array_equal(outs["xla"][1], outs["pallas"][1])


def test_slow_kernel_respects_stale_cache(rng):
    """Slots at and beyond pos must never be attended: poison them with huge
    values and check the step's outputs are unchanged."""
    cfg = _tiny(use_pallas_slow_decode=True)
    params = dual_ar.prepare_params(dual_ar.random_params(jax.random.PRNGKey(1), cfg))
    samp = C.SamplingConfig(greedy=True)
    prompt = jnp.asarray(rng.standard_normal((1, 10, cfg.dim)).astype(np.float32))
    state0 = dual_ar.init_state(cfg, batch=1, cache_dtype=jnp.float32)
    state0, _ = dual_ar.prefill(params, cfg, state0, prompt, jnp.int32(7))

    emb2 = jnp.asarray(rng.standard_normal((1, 2, cfg.dim)).astype(np.float32))
    _, tok_a, codes_a, _ = dual_ar.decode_frame(
        params, cfg, state0, emb2, jax.random.PRNGKey(3), samp)

    pos = int(state0.pos)
    poisoned = state0._replace(
        k_cache=state0.k_cache.at[:, :, pos:].set(37.0),
        v_cache=state0.v_cache.at[:, :, pos:].set(-54.0),
    )
    _, tok_b, codes_b, _ = dual_ar.decode_frame(
        params, cfg, poisoned, emb2, jax.random.PRNGKey(3), samp)
    assert int(tok_a[0]) == int(tok_b[0])
    np.testing.assert_array_equal(np.asarray(codes_a), np.asarray(codes_b))


def test_transfer_migrates_cache_layout(rng):
    """StreamSession.transfer rebinds the target converter's config; when the
    target enables use_pallas_slow_decode the LM cache must be re-laid-out
    to flat rows mid-stream with no change in the decoded audio."""
    from dataclasses import replace as drep

    from streamvoiceanon_tpu.config import SamplingConfig
    from streamvoiceanon_tpu.runtime.pipeline import VoiceConverter
    from streamvoiceanon_tpu.runtime.streaming import StreamSession
    from streamvoiceanon_tpu.utils.tiny import tiny_converter

    def make_sess(cv, src, n):
        rng2 = np.random.default_rng(7)
        spf = cv.cfg.samples_per_frame
        ref = jnp.asarray(rng2.standard_normal((1, 8 * spf)) * 0.1, jnp.float32)
        sess = StreamSession(
            cv, cv.cfg.stream, key=jax.random.PRNGKey(1),
            sampling=SamplingConfig(greedy=True),
            style=jnp.asarray(rng2.standard_normal((1, cv.cfg.arvc.style_dim)), jnp.float32),
            timbre=jnp.asarray(rng2.standard_normal((1, 32, cv.cfg.arvc.context_dim)), jnp.float32),
            ref_tokens=cv.content_tokens(ref), ref_codes=cv.audio_codes(ref))
        outs = [sess.process_chunk(src[i * spf:(i + 1) * spf]) for i in range(n)]
        return sess, outs

    cv = tiny_converter(seed=0)
    cfg_p = drep(cv.cfg, arvc=drep(cv.cfg.arvc, decoder=drep(
        cv.cfg.arvc.decoder, use_pallas_slow_decode=True)))
    cv_p = VoiceConverter(cfg=cfg_p, tokenizer_params=cv.tokenizer_params,
                          vocoder_params=cv.vocoder_params, arvc_params=cv.arvc_params)
    spf = cv.cfg.samples_per_frame
    src = (np.random.default_rng(8).standard_normal(10 * spf) * 0.1).astype(np.float32)

    # reference: the whole stream on the plain XLA layout
    _, ref_outs = make_sess(cv, src, 10)

    # migrated: 6 chunks on the XLA layout, transfer to the flat-layout
    # converter, then 4 more chunks through the kernel path
    sess, outs = make_sess(cv, src, 6)
    dev = jax.devices("cpu")[0]
    sess = sess.transfer(cv_p, dev)
    assert sess.fstate.lm.decode.k_cache.ndim == 4  # (L, B, S, H*D)
    for i in range(6, 10):
        outs.append(sess.process_chunk(src[i * spf:(i + 1) * spf]))

    ref_cat = np.concatenate([np.asarray(o).ravel() for o in ref_outs])
    got_cat = np.concatenate([np.asarray(o).ravel() for o in outs])
    np.testing.assert_allclose(got_cat, ref_cat, atol=1e-5, rtol=1e-5)


def test_flat_layout_batched_fallback(rng):
    """With the flag on but batch > 1, decode_frame falls back to the XLA
    scan on the flat layout and still matches the reference layout's
    numerics."""
    base = _tiny()
    cfg_p = _tiny(use_pallas_slow_decode=True)
    params = dual_ar.prepare_params(dual_ar.random_params(jax.random.PRNGKey(1), base))
    samp = C.SamplingConfig(greedy=True)
    prompt = jnp.asarray(rng.standard_normal((2, 12, base.dim)).astype(np.float32))
    emb2 = jnp.asarray(rng.standard_normal((2, 2, base.dim)).astype(np.float32))

    res = {}
    for name, cfg in (("ref", base), ("flat", cfg_p)):
        state = dual_ar.init_state(cfg, batch=2, cache_dtype=jnp.float32)
        state, _ = dual_ar.prefill(params, cfg, state, prompt, jnp.int32(12))
        _, tok, codes, _ = dual_ar.decode_frame(
            params, cfg, state, emb2, jax.random.PRNGKey(5), samp)
        res[name] = (np.asarray(tok), np.asarray(codes))

    np.testing.assert_array_equal(res["ref"][0], res["flat"][0])
    np.testing.assert_array_equal(res["ref"][1], res["flat"][1])


def test_snapshot_restore_migrates_cache_layout(rng):
    """bench.py's exact fast-start path: a session prepped (and snapshotted)
    under the plain XLA layout is restored into a converter with
    use_pallas_slow_decode on — restore must migrate the LM cache to flat
    rows and the continued stream must match the never-snapshotted one."""
    import pickle
    from dataclasses import replace as drep

    from streamvoiceanon_tpu.config import SamplingConfig
    from streamvoiceanon_tpu.runtime.pipeline import VoiceConverter
    from streamvoiceanon_tpu.runtime.streaming import StreamSession
    from streamvoiceanon_tpu.utils.tiny import tiny_converter

    def make_sess(cv, src, n):
        rng2 = np.random.default_rng(7)
        spf = cv.cfg.samples_per_frame
        ref = jnp.asarray(rng2.standard_normal((1, 8 * spf)) * 0.1, jnp.float32)
        sess = StreamSession(
            cv, cv.cfg.stream, key=jax.random.PRNGKey(1),
            sampling=SamplingConfig(greedy=True),
            style=jnp.asarray(rng2.standard_normal((1, cv.cfg.arvc.style_dim)), jnp.float32),
            timbre=jnp.asarray(rng2.standard_normal((1, 32, cv.cfg.arvc.context_dim)), jnp.float32),
            ref_tokens=cv.content_tokens(ref), ref_codes=cv.audio_codes(ref))
        outs = [sess.process_chunk(src[i * spf:(i + 1) * spf]) for i in range(n)]
        return sess, outs

    cv = tiny_converter(seed=0)
    cfg_p = drep(cv.cfg, arvc=drep(cv.cfg.arvc, decoder=drep(
        cv.cfg.arvc.decoder, use_pallas_slow_decode=True)))
    cv_p = VoiceConverter(cfg=cfg_p, tokenizer_params=cv.tokenizer_params,
                          vocoder_params=cv.vocoder_params, arvc_params=cv.arvc_params)
    spf = cv.cfg.samples_per_frame
    src = (np.random.default_rng(8).standard_normal(10 * spf) * 0.1).astype(np.float32)

    _, ref_outs = make_sess(cv, src, 10)

    sess, outs = make_sess(cv, src, 6)
    blob = pickle.dumps(sess.snapshot())  # process boundary
    sess2 = StreamSession.restore(cv_p, pickle.loads(blob), jax.devices("cpu")[0])
    assert sess2.fstate.lm.decode.k_cache.ndim == 4  # flat (L, B, S, H*D)
    for i in range(6, 10):
        outs.append(sess2.process_chunk(src[i * spf:(i + 1) * spf]))

    ref_cat = np.concatenate([np.asarray(o).ravel() for o in ref_outs])
    got_cat = np.concatenate([np.asarray(o).ravel() for o in outs])
    np.testing.assert_allclose(got_cat, ref_cat, atol=1e-5, rtol=1e-5)
