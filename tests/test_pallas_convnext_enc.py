"""Fused ConvNeXt front-end Pallas kernel vs the op-by-op XLA streaming path
(interpret mode on CPU; the same kernel compiles for TPU)."""

from dataclasses import replace as drep

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import tinymodels
from streamvoiceanon_tpu.models import tokenizer, tokenizer_stream
from streamvoiceanon_tpu.ops import pallas_convnext_enc as pce

SPF = 2048


def _cfgs():
    cv = tinymodels.tiny_converter()
    cfg = cv.cfg.tokenizer
    cfg_p = drep(cfg, use_pallas_encoder=True)
    return cv, cfg, cfg_p


def test_encode_stream_encoder_kernel_token_exact(rng):
    """encode_stream with the fused front end must stay token-exact vs the
    offline tokenizer and the dict-layout stream."""
    cv, cfg, cfg_p = _cfgs()
    T = 10
    wav = (rng.standard_normal((1, T * SPF)) * 0.2).astype(np.float32)
    offline = np.asarray(tokenizer.encode(cv.tokenizer_params, cfg, jnp.asarray(wav)))

    pw = pce.packed_weights(cv.tokenizer_params, cfg_p)
    params = dict(cv.tokenizer_params)
    params["enc_packed"] = pw
    state = tokenizer_stream.init_stream_state(params, cfg_p)
    assert isinstance(state.backbone, pce.PackedEncState)
    toks = []
    for i in range(T):
        state, t = tokenizer_stream.encode_stream(
            params, cfg_p, state, jnp.asarray(wav[:, i * SPF:(i + 1) * SPF]))
        toks.append(np.asarray(t))
    got = np.concatenate(toks, axis=1)
    np.testing.assert_array_equal(got, offline)


def test_packed_enc_state_roundtrip(rng):
    cv, cfg, cfg_p = _cfgs()
    st = tokenizer_stream.init_stream_state(cv.tokenizer_params, cfg)
    # advance so tails are non-trivial
    wav = (rng.standard_normal((1, 3 * SPF)) * 0.2).astype(np.float32)
    for i in range(3):
        st, _ = tokenizer_stream.encode_stream(
            cv.tokenizer_params, cfg, st, jnp.asarray(wav[:, i * SPF:(i + 1) * SPF]))
    packed = pce.pack_enc_state(st.backbone, st.down, cfg_p)
    bb, dn = pce.unpack_enc_state(packed, cfg_p)
    for a, b in zip(jax.tree.flatten(bb)[0], jax.tree.flatten(st.backbone)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.flatten([d["block"] for d in dn])[0],
                    jax.tree.flatten([d["block"] for d in st.down])[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batched_packed_enc_falls_back(rng):
    """Batch > 1 on the packed layout unpacks to the XLA path and matches the
    dict layout token-for-token."""
    cv, cfg, cfg_p = _cfgs()
    B, T = 2, 4
    wav = (rng.standard_normal((B, T * SPF)) * 0.2).astype(np.float32)
    st_d = tokenizer_stream.init_stream_state(cv.tokenizer_params, cfg, batch=B)
    st_p = tokenizer_stream.init_stream_state(cv.tokenizer_params, cfg_p, batch=B)
    for i in range(T):
        chunk = jnp.asarray(wav[:, i * SPF:(i + 1) * SPF])
        st_d, t_d = tokenizer_stream.encode_stream(cv.tokenizer_params, cfg, st_d, chunk)
        st_p, t_p = tokenizer_stream.encode_stream(cv.tokenizer_params, cfg_p, st_p, chunk)
        np.testing.assert_array_equal(np.asarray(t_p), np.asarray(t_d))


def test_transfer_migrates_enc_layout(rng):
    """StreamSession.transfer re-lays-out the front-end state when the target
    converter enables the fused encoder, with no change in decoded audio."""
    from streamvoiceanon_tpu.config import SamplingConfig
    from streamvoiceanon_tpu.runtime.pipeline import VoiceConverter
    from streamvoiceanon_tpu.runtime.streaming import StreamSession
    from streamvoiceanon_tpu.utils.tiny import tiny_converter

    cv = tiny_converter(seed=0)
    cfg_p = drep(cv.cfg, tokenizer=drep(cv.cfg.tokenizer, use_pallas_encoder=True))
    cv_p = VoiceConverter(cfg=cfg_p, tokenizer_params=cv.tokenizer_params,
                          vocoder_params=cv.vocoder_params, arvc_params=cv.arvc_params)
    assert "enc_packed" in cv_p.tokenizer_params
    spf = cv.cfg.samples_per_frame
    rng2 = np.random.default_rng(7)
    ref = jnp.asarray(rng2.standard_normal((1, 8 * spf)) * 0.1, jnp.float32)
    src = (np.random.default_rng(8).standard_normal(9 * spf) * 0.1).astype(np.float32)

    def make_sess(conv):
        return StreamSession(
            conv, conv.cfg.stream, key=jax.random.PRNGKey(1),
            sampling=SamplingConfig(greedy=True),
            style=jnp.asarray(rng2.standard_normal((1, conv.cfg.arvc.style_dim)), jnp.float32),
            timbre=jnp.asarray(rng2.standard_normal((1, 32, conv.cfg.arvc.context_dim)), jnp.float32),
            ref_tokens=cv.content_tokens(ref), ref_codes=cv.audio_codes(ref))

    sess_ref = make_sess(cv)
    ref_outs = [sess_ref.process_chunk(src[i * spf:(i + 1) * spf]) for i in range(9)]

    sess = make_sess(cv)
    outs = [sess.process_chunk(src[i * spf:(i + 1) * spf]) for i in range(5)]
    sess = sess.transfer(cv_p, jax.devices("cpu")[0])
    assert isinstance(sess.fstate.tok.backbone, pce.PackedEncState)
    for i in range(5, 9):
        outs.append(sess.process_chunk(src[i * spf:(i + 1) * spf]))

    ref_cat = np.concatenate([np.asarray(o).ravel() for o in ref_outs])
    got_cat = np.concatenate([np.asarray(o).ravel() for o in outs])
    np.testing.assert_allclose(got_cat, ref_cat, atol=1e-5, rtol=1e-5)
