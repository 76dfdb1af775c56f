"""Fused HiFiGAN-head Pallas kernel vs the op-by-op XLA streaming path
(interpret mode on CPU; the same kernel compiles for TPU)."""

from dataclasses import replace as drep

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from streamvoiceanon_tpu.config import HiFiGANConfig
from streamvoiceanon_tpu.models import hifigan
from streamvoiceanon_tpu.ops import pallas_hifigan as ph


def _tiny_cfg(**kw):
    return HiFiGANConfig(
        num_mels=16, upsample_initial_channel=16,
        upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
        resblock_kernel_sizes=(3, 5), resblock_dilation_sizes=((1, 2), (1, 2)),
        pre_conv_kernel_size=5, post_conv_kernel_size=5, hop_length=4,
        **kw,
    )


def test_head_kernel_matches_dict_path(rng):
    """Chunked streaming through the fused kernel must equal the dict-state
    XLA path chunk-for-chunk (same params, same input)."""
    cfg = _tiny_cfg()
    cfg_p = _tiny_cfg(use_pallas_stream=True)
    p = hifigan.hifigan_init(jax.random.PRNGKey(0), cfg)

    st_d = hifigan.hifigan_init_stream(p, cfg, 1)
    st_p = hifigan.hifigan_init_stream(p, cfg_p, 1)
    assert isinstance(st_p, ph.PackedHeadState)
    pw = ph.packed_weights(p, cfg_p)

    T0 = 4
    for c in range(5):
        x = jnp.asarray(
            rng.standard_normal((1, T0, cfg.num_mels)).astype(np.float32))
        st_d, wav_d = hifigan.hifigan_apply_stream(p, cfg, st_d, x)
        st_p, wav_p = hifigan.hifigan_apply_stream(p, cfg_p, st_p, x, packed_w=pw)
        np.testing.assert_allclose(
            np.asarray(wav_p), np.asarray(wav_d), atol=1e-5, rtol=1e-5,
            err_msg=f"chunk {c}")
    # streamed tails stay equivalent: unpack and compare leaf-for-leaf
    ud = ph.unpack_head_state(st_p, cfg_p)
    flat_p, _ = jax.tree.flatten(ud)
    flat_d, _ = jax.tree.flatten(st_d)
    for a, b in zip(flat_p, flat_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_packed_state_roundtrip(rng):
    cfg = _tiny_cfg(use_pallas_stream=True)
    p = hifigan.hifigan_init(jax.random.PRNGKey(1), cfg)
    st = hifigan.hifigan_init_stream(p, cfg, 1)
    # advance a few chunks so tails are non-trivial
    pw = ph.packed_weights(p, cfg)
    for c in range(3):
        x = jnp.asarray(
            rng.standard_normal((1, 4, cfg.num_mels)).astype(np.float32))
        st, _ = hifigan.hifigan_apply_stream(p, cfg, st, x, packed_w=pw)
    back = ph.pack_head_state(ph.unpack_head_state(st, cfg), cfg)
    for a, b in zip(jax.tree.flatten(back)[0], jax.tree.flatten(st)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batched_packed_falls_back(rng):
    """Batch > 1 on the packed layout unpacks to the XLA path and matches the
    dict layout's numerics."""
    cfg = _tiny_cfg()
    cfg_p = _tiny_cfg(use_pallas_stream=True)
    p = hifigan.hifigan_init(jax.random.PRNGKey(2), cfg)
    st_d = hifigan.hifigan_init_stream(p, cfg, 3)
    st_p = hifigan.hifigan_init_stream(p, cfg_p, 3)
    for c in range(3):
        x = jnp.asarray(
            rng.standard_normal((3, 4, cfg.num_mels)).astype(np.float32))
        st_d, wav_d = hifigan.hifigan_apply_stream(p, cfg, st_d, x)
        st_p, wav_p = hifigan.hifigan_apply_stream(p, cfg_p, st_p, x)
        np.testing.assert_allclose(np.asarray(wav_p), np.asarray(wav_d),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_vocoder_stream_with_kernel(rng):
    """vocoder.decode_stream with the head flag must match the plain path
    sample-for-sample through the VoiceConverter plumbing (pre-packed
    weights via __post_init__)."""
    from streamvoiceanon_tpu.models import vocoder
    from streamvoiceanon_tpu.runtime.pipeline import VoiceConverter
    from streamvoiceanon_tpu.utils.tiny import tiny_converter

    cv = tiny_converter(seed=0)
    cfg_p = drep(cv.cfg, vocoder=drep(cv.cfg.vocoder, head=drep(
        cv.cfg.vocoder.head, use_pallas_stream=True)))
    cv_p = VoiceConverter(cfg=cfg_p, tokenizer_params=cv.tokenizer_params,
                          vocoder_params=cv.vocoder_params, arvc_params=cv.arvc_params)
    assert "head_packed" in cv_p.vocoder_params

    nq = cv.cfg.vocoder.quantizer.n_groups
    codes = rng.integers(0, 100, size=(3, 1, nq, 1)).astype(np.int32)

    st_a = vocoder.init_stream_state(cv.vocoder_params, cv.cfg.vocoder, 1)
    st_b = vocoder.init_stream_state(cv_p.vocoder_params, cfg_p.vocoder, 1)
    for c in range(3):
        st_a, wav_a = vocoder.decode_stream(
            cv.vocoder_params, cv.cfg.vocoder, st_a, jnp.asarray(codes[c]))
        st_b, wav_b = vocoder.decode_stream(
            cv_p.vocoder_params, cfg_p.vocoder, st_b, jnp.asarray(codes[c]))
        np.testing.assert_allclose(np.asarray(wav_b), np.asarray(wav_a),
                                   atol=1e-5, rtol=1e-5, err_msg=f"chunk {c}")


def test_transfer_migrates_head_layout(rng):
    """StreamSession.transfer re-lays-out the vocoder head state when the
    target converter enables the fused head kernel, with no change in
    decoded audio."""
    from streamvoiceanon_tpu.config import SamplingConfig
    from streamvoiceanon_tpu.runtime.pipeline import VoiceConverter
    from streamvoiceanon_tpu.runtime.streaming import StreamSession
    from streamvoiceanon_tpu.utils.tiny import tiny_converter

    cv = tiny_converter(seed=0)
    cfg_p = drep(cv.cfg, vocoder=drep(cv.cfg.vocoder, head=drep(
        cv.cfg.vocoder.head, use_pallas_stream=True)))
    cv_p = VoiceConverter(cfg=cfg_p, tokenizer_params=cv.tokenizer_params,
                          vocoder_params=cv.vocoder_params, arvc_params=cv.arvc_params)
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
    assert isinstance(sess.fstate.voc["head"], ph.PackedHeadState)
    for i in range(5, 9):
        outs.append(sess.process_chunk(src[i * spf:(i + 1) * spf]))

    ref_cat = np.concatenate([np.asarray(o).ravel() for o in ref_outs])
    got_cat = np.concatenate([np.asarray(o).ravel() for o in outs])
    np.testing.assert_allclose(got_cat, ref_cat, atol=1e-5, rtol=1e-5)
