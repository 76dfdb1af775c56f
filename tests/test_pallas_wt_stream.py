"""Grid-pipelined windowed-transformer ring-step Pallas kernel vs the XLA
scan path (interpret mode on CPU; the same kernel compiles for TPU)."""

from dataclasses import replace as drep

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import tinymodels
from streamvoiceanon_tpu.config import WindowedTransformerConfig
from streamvoiceanon_tpu.models import tokenizer, tokenizer_stream, windowed_transformer


def _wt_cfg(**kw):
    return WindowedTransformerConfig(
        n_layer=3, n_head=2, dim=32, intermediate_size=64, head_dim=16,
        window_size=8, **kw,
    )


def test_transformer_stream_step_kernel_parity(rng):
    """Token-by-token outputs must match the XLA rotated-ring path exactly
    (fp tolerance), including past the window length; the final circular
    ring, converted back to the rotated-frame layout, must equal the XLA
    ring (valid slots)."""
    base = _wt_cfg()
    cfg_p = _wt_cfg(use_pallas_stream=True)
    params = windowed_transformer.init(jax.random.PRNGKey(0), base)

    states = {
        "xla": tokenizer_stream.ring_init(base, 1),
        "pallas": tokenizer_stream.ring_init(cfg_p, 1),
    }
    cfgs = {"xla": base, "pallas": cfg_p}
    n_tok = 12  # > window_size
    xs = rng.standard_normal((n_tok, 1, 1, base.dim)).astype(np.float32)

    outs = {"xla": [], "pallas": []}
    for name in ("xla", "pallas"):
        st = states[name]
        for t in range(n_tok):
            st, h = tokenizer_stream.transformer_stream_step(
                params, cfgs[name], st, jnp.asarray(xs[t])
            )
            outs[name].append(np.asarray(h))
        states[name] = st

    np.testing.assert_allclose(
        np.concatenate(outs["pallas"]), np.concatenate(outs["xla"]),
        atol=1e-5, rtol=1e-5,
    )
    # circular absolute-rope ring -> rotated-frame layout must match XLA
    back = tokenizer_stream.convert_ring_layout(states["pallas"], base)
    np.testing.assert_allclose(
        np.asarray(back.k_ring), np.asarray(states["xla"].k_ring),
        atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(back.v_ring), np.asarray(states["xla"].v_ring),
        atol=1e-6, rtol=1e-6)
    assert int(states["pallas"].count) == int(states["xla"].count)


def test_circular_ring_rebase_exact(rng):
    """Streaming far past the rebase period must stay equal to the rotated
    XLA path — exercises maybe_rebase_ring multiple times (tiny table:
    W=8, R=8 -> a rebase every 8 tokens)."""
    base = _wt_cfg()
    cfg_p = _wt_cfg(use_pallas_stream=True, rope_table_rows=16)
    params = windowed_transformer.init(jax.random.PRNGKey(2), base)
    st_x = tokenizer_stream.ring_init(base, 1)
    st_p = tokenizer_stream.ring_init(cfg_p, 1)
    n_tok = 30  # > 3 rebase periods
    xs = rng.standard_normal((n_tok, 1, 1, base.dim)).astype(np.float32)
    for t in range(n_tok):
        st_x, hx = tokenizer_stream.transformer_stream_step(
            params, base, st_x, jnp.asarray(xs[t]))
        st_p, hp = tokenizer_stream.transformer_stream_step(
            params, cfg_p, st_p, jnp.asarray(xs[t]))
        np.testing.assert_allclose(
            np.asarray(hp), np.asarray(hx), atol=1e-5, rtol=1e-5,
            err_msg=f"token {t}")


@pytest.mark.slow
def test_encode_stream_kernel_token_exact(rng):
    """encode_stream with the kernel-backed ring must stay token-exact vs the
    offline tokenizer (the same guarantee the XLA ring path has)."""
    cv = tinymodels.tiny_converter()
    cfg = cv.cfg.tokenizer
    cfg_p = drep(cfg, transformer=drep(cfg.transformer, use_pallas_stream=True))
    spf = 2048
    T = 12
    wav = (rng.standard_normal((1, T * spf)) * 0.2).astype(np.float32)
    offline = np.asarray(tokenizer.encode(cv.tokenizer_params, cfg, jnp.asarray(wav)))

    state = tokenizer_stream.init_stream_state(cv.tokenizer_params, cfg_p)
    assert state.ring.k_ring.ndim == 4  # flat (L, B, W, H*D)
    toks = []
    for i in range(T):
        state, t = tokenizer_stream.encode_stream(
            cv.tokenizer_params, cfg_p, state, jnp.asarray(wav[:, i * spf:(i + 1) * spf])
        )
        toks.append(np.asarray(t))
    got = np.concatenate(toks, axis=1)
    np.testing.assert_array_equal(got, offline)


def test_flat_ring_batched_fallback(rng):
    """Flag on with batch > 1 falls back to the XLA scan on the flat layout
    and matches the per-head layout's numerics."""
    base = _wt_cfg()
    cfg_p = _wt_cfg(use_pallas_stream=True)
    params = windowed_transformer.init(jax.random.PRNGKey(1), base)
    xs = rng.standard_normal((5, 3, 1, base.dim)).astype(np.float32)

    res = {}
    for name, cfg in (("ref", base), ("flat", cfg_p)):
        st = tokenizer_stream.ring_init(cfg, 3)
        hs = []
        for t in range(xs.shape[0]):
            st, h = tokenizer_stream.transformer_stream_step(
                params, cfg, st, jnp.asarray(xs[t]))
            hs.append(np.asarray(h))
        res[name] = np.concatenate(hs)
    np.testing.assert_allclose(res["flat"], res["ref"], atol=1e-5, rtol=1e-5)


def test_transfer_tpu_optimized_end_to_end(rng):
    """bench.py's production flow: prep a session on the plain config, then
    transfer to a tpu_optimized() converter (Pallas fast+slow decode + WT
    ring kernel, flat layouts) and continue — decoded audio must match the
    plain path."""
    from streamvoiceanon_tpu.config import SamplingConfig, tpu_optimized
    from streamvoiceanon_tpu.runtime.pipeline import VoiceConverter
    from streamvoiceanon_tpu.runtime.streaming import StreamSession
    from streamvoiceanon_tpu.utils.tiny import tiny_converter

    cv = tiny_converter(seed=0)
    cv_opt = VoiceConverter(
        cfg=tpu_optimized(cv.cfg), tokenizer_params=cv.tokenizer_params,
        vocoder_params=cv.vocoder_params, arvc_params=cv.arvc_params)
    spf = cv.cfg.samples_per_frame
    rng2 = np.random.default_rng(7)
    ref = jnp.asarray(rng2.standard_normal((1, 8 * spf)) * 0.1, jnp.float32)
    src = (np.random.default_rng(8).standard_normal(10 * spf) * 0.1).astype(np.float32)

    def make_sess(conv):
        return StreamSession(
            conv, conv.cfg.stream, key=jax.random.PRNGKey(1),
            sampling=SamplingConfig(greedy=True),
            style=jnp.asarray(rng2.standard_normal((1, conv.cfg.arvc.style_dim)), jnp.float32),
            timbre=jnp.asarray(rng2.standard_normal((1, 32, conv.cfg.arvc.context_dim)), jnp.float32),
            ref_tokens=cv.content_tokens(ref), ref_codes=cv.audio_codes(ref))

    sess_ref = make_sess(cv)
    ref_outs = [sess_ref.process_chunk(src[i * spf:(i + 1) * spf]) for i in range(10)]

    sess = make_sess(cv)
    outs = [sess.process_chunk(src[i * spf:(i + 1) * spf]) for i in range(6)]
    sess = sess.transfer(cv_opt, jax.devices("cpu")[0])
    assert sess.fstate.lm.decode.k_cache.ndim == 4  # flat LM cache
    assert sess.fstate.tok.ring.k_ring.ndim == 4  # flat WT ring
    for i in range(6, 10):
        outs.append(sess.process_chunk(src[i * spf:(i + 1) * spf]))

    ref_cat = np.concatenate([np.asarray(o).ravel() for o in ref_outs])
    got_cat = np.concatenate([np.asarray(o).ravel() for o in outs])
    np.testing.assert_allclose(got_cat, ref_cat, atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_batched_session_tpu_optimized(rng):
    """A batch-3 StreamSession under tpu_optimized (flat layouts -> XLA
    circular ring + flat-cache scan fallbacks) must match the plain config
    chunk-for-chunk — the multistream serving path."""
    from streamvoiceanon_tpu.config import SamplingConfig, tpu_optimized
    from streamvoiceanon_tpu.runtime.pipeline import VoiceConverter
    from streamvoiceanon_tpu.runtime.streaming import StreamSession
    from streamvoiceanon_tpu.utils.tiny import tiny_converter

    cv = tiny_converter(seed=0)
    cv_opt = VoiceConverter(
        cfg=tpu_optimized(cv.cfg), tokenizer_params=cv.tokenizer_params,
        vocoder_params=cv.vocoder_params, arvc_params=cv.arvc_params)
    B = 3
    spf = cv.cfg.samples_per_frame
    rng2 = np.random.default_rng(7)
    ref = jnp.asarray(rng2.standard_normal((1, 8 * spf)) * 0.1, jnp.float32)
    ref_tokens = jnp.repeat(cv.content_tokens(ref), B, 0)
    ref_codes = jnp.repeat(cv.audio_codes(ref), B, 0)
    style = jnp.asarray(rng2.standard_normal((B, cv.cfg.arvc.style_dim)), jnp.float32)
    timbre = jnp.asarray(rng2.standard_normal((B, 32, cv.cfg.arvc.context_dim)), jnp.float32)
    src = (np.random.default_rng(8).standard_normal((B, 8 * spf)) * 0.1).astype(np.float32)

    outs = {}
    for name, conv in (("plain", cv), ("opt", cv_opt)):
        sess = StreamSession(
            conv, conv.cfg.stream, key=jax.random.PRNGKey(1),
            sampling=SamplingConfig(greedy=True),
            style=style, timbre=timbre,
            ref_tokens=ref_tokens, ref_codes=ref_codes, batch=B)
        outs[name] = np.concatenate([
            np.asarray(sess.process_chunk(src[:, i * spf:(i + 1) * spf])).ravel()
            for i in range(8)
        ])
    np.testing.assert_allclose(outs["opt"], outs["plain"], atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_refill_under_tpu_optimized(rng):
    """Prompt refill (LM cache recycling) must keep producing audio equal to
    the plain config when the flat layouts are active — refill re-prefills
    through the flat-cache branch of the LM."""
    from streamvoiceanon_tpu.config import SamplingConfig, StreamConfig, tpu_optimized
    from streamvoiceanon_tpu.runtime.pipeline import VoiceConverter
    from streamvoiceanon_tpu.runtime.streaming import StreamSession
    from streamvoiceanon_tpu.utils.tiny import tiny_converter

    cv = tiny_converter(seed=0)
    cv_opt = VoiceConverter(
        cfg=tpu_optimized(cv.cfg), tokenizer_params=cv.tokenizer_params,
        vocoder_params=cv.vocoder_params, arvc_params=cv.arvc_params)
    spf = cv.cfg.samples_per_frame
    rng2 = np.random.default_rng(7)
    ref = jnp.asarray(rng2.standard_normal((1, 6 * spf)) * 0.1, jnp.float32)
    n = 14
    src = (np.random.default_rng(8).standard_normal(n * spf) * 0.1).astype(np.float32)
    scfg = StreamConfig(max_prompt_frames=8, max_seq_frames=24, buffer_frames=2,
                        delay=1)

    outs = {}
    for name, conv in (("plain", cv), ("opt", cv_opt)):
        sess = StreamSession(
            conv, scfg, key=jax.random.PRNGKey(1),
            sampling=SamplingConfig(greedy=True),
            style=jnp.asarray(rng2.standard_normal((1, conv.cfg.arvc.style_dim)), jnp.float32),
            timbre=jnp.asarray(rng2.standard_normal((1, 32, conv.cfg.arvc.context_dim)), jnp.float32),
            ref_tokens=cv.content_tokens(ref), ref_codes=cv.audio_codes(ref))
        outs[name] = np.concatenate([
            np.asarray(sess.process_chunk(src[i * spf:(i + 1) * spf])).ravel()
            for i in range(n)
        ])
        assert sess._lm_pos_host // 2 < scfg.max_seq_frames + 8  # refilled
    np.testing.assert_allclose(outs["opt"], outs["plain"], atol=1e-5, rtol=1e-5)


def test_transfer_migrates_ring_layout(rng):
    """StreamSession.transfer re-lays-out the tokenizer ring when the target
    converter enables use_pallas_stream, with no change in decoded audio."""
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
    cfg_p = drep(cv.cfg, tokenizer=drep(cv.cfg.tokenizer, transformer=drep(
        cv.cfg.tokenizer.transformer, use_pallas_stream=True)))
    cv_p = VoiceConverter(cfg=cfg_p, tokenizer_params=cv.tokenizer_params,
                          vocoder_params=cv.vocoder_params, arvc_params=cv.arvc_params)
    spf = cv.cfg.samples_per_frame
    src = (np.random.default_rng(8).standard_normal(10 * spf) * 0.1).astype(np.float32)

    _, ref_outs = make_sess(cv, src, 10)

    sess, outs = make_sess(cv, src, 6)
    dev = jax.devices("cpu")[0]
    sess = sess.transfer(cv_p, dev)
    assert sess.fstate.tok.ring.k_ring.ndim == 4  # flat (L, B, W, H*D)
    for i in range(6, 10):
        outs.append(sess.process_chunk(src[i * spf:(i + 1) * spf]))

    ref_cat = np.concatenate([np.asarray(o).ravel() for o in ref_outs])
    got_cat = np.concatenate([np.asarray(o).ravel() for o in outs])
    np.testing.assert_allclose(got_cat, ref_cat, atol=1e-5, rtol=1e-5)
