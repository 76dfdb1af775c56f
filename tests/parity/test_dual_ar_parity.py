"""Parity of the dual-AR LM offline generate (greedy) and streaming
decode-one path against the PyTorch reference with converted random weights."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from streamvoiceanon_tpu.config import ARVCConfig, DualARConfig, SamplingConfig, replace
from streamvoiceanon_tpu.models import arvc, dual_ar
from streamvoiceanon_tpu.runtime import convert

das = pytest.importorskip("modules.dual_ar_stream")
from modules import arvc_wrapper as awref  # noqa: E402

GREEDY = SamplingConfig(greedy=True)


def small_cfg() -> ARVCConfig:
    d = DualARConfig(
        vocab_size=100,
        n_layer=2,
        n_head=4,
        dim=64,
        intermediate_size=128,
        head_dim=16,
        max_seq_len=256,
        dropout=0.0,
        codebook_size=50,
        num_codebooks=4,
        n_fast_layer=2,
        fast_dim=64,
        fast_n_head=4,
        fast_head_dim=16,
        fast_intermediate_size=128,
        delay=(0, 1, 2, 3, 4),
        cond_input_dim=64,
    )
    return ARVCConfig(decoder=d, context_dim=16, style_dim=24, model_dim=64)


def _greedy_sample(logits, previous_tokens=None, suppress_tokens=None, **kw):
    idx = torch.argmax(logits[0, -1], keepdim=True).to(torch.int)
    return idx, None


@pytest.fixture(scope="module")
def ref_and_params():
    cfg = small_cfg()
    d = cfg.decoder
    torch.manual_seed(0)
    margs = das.DualARModelArgs(
        vocab_size=d.vocab_size,
        n_layer=d.n_layer,
        n_head=d.n_head,
        dim=d.dim,
        intermediate_size=d.intermediate_size,
        head_dim=d.head_dim,
        max_seq_len=d.max_seq_len,
        dropout=0.0,
        tie_word_embeddings=False,
        codebook_size=d.codebook_size,
        num_codebooks=d.num_codebooks,
        n_fast_layer=d.n_fast_layer,
        fast_dim=d.fast_dim,
        fast_n_head=d.fast_n_head,
        fast_head_dim=d.fast_head_dim,
        fast_intermediate_size=d.fast_intermediate_size,
        delay=list(d.delay),
        cond_input_dim=d.cond_input_dim,
    )
    model = das.DualARTransformer(margs)
    wrapper = das.DualARWrapper(model)
    ref = awref.ARVCWrapper(
        embedding=torch.nn.Embedding(d.vocab_size, d.dim),
        decoder=wrapper,
        context_dim=cfg.context_dim,
        style_dim=cfg.style_dim,
        model_dim=cfg.model_dim,
    ).eval()
    params = arvc.prepare_params(convert.arvc(ref.state_dict(), cfg))
    return ref, params, cfg


def _setup_ref(ref, delay):
    ref.decoder.model.max_seq_len = -1  # force cache rebuild
    ref.decoder.model.max_batch_size = -1
    ref.setup_caches(max_batch_size=1, max_seq_len=256, dtype=torch.float32)
    ref.set_delay(delay=delay)
    return ref


@pytest.mark.parity
@pytest.mark.parametrize("delay", [0, 2])
def test_generate_greedy_parity(ref_and_params, rng, delay, monkeypatch):
    ref, params, cfg = ref_and_params
    monkeypatch.setattr(das, "sample", _greedy_sample)
    _setup_ref(ref, delay)

    d = cfg.decoder
    Tr, Ts = 6, 10
    ref_content = rng.integers(0, d.vocab_size, (1, Tr))
    ref_codes = rng.integers(0, d.codebook_size, (1, d.num_codebooks, Tr))
    src_content = rng.integers(0, d.vocab_size, (1, Ts))
    style = rng.standard_normal((1, cfg.style_dim)).astype(np.float32)
    timbre = rng.standard_normal((1, 32, cfg.context_dim)).astype(np.float32)

    with torch.no_grad():
        out_ref = ref.generate(
            torch.from_numpy(ref_content),
            torch.from_numpy(ref_codes),
            torch.from_numpy(src_content),
            torch.from_numpy(style),
            torch.from_numpy(timbre),
        ).numpy()

    out = arvc.generate(
        params,
        cfg,
        jnp.asarray(ref_content),
        jnp.asarray(ref_codes),
        jnp.asarray(src_content),
        jnp.asarray(style),
        jnp.asarray(timbre),
        jax.random.PRNGKey(0),
        sampling=GREEDY,
        delay=delay,
    )
    out = np.asarray(out)
    assert out.shape == out_ref.shape == (1, d.num_codebooks, Ts)
    match = (out == out_ref).mean()
    assert match == 1.0, f"code match rate {match}"


@pytest.mark.parity
def test_streaming_decode_parity(ref_and_params, rng, monkeypatch):
    """prefill_prompt -> prefill_src_condition4delay -> decode_one xN matches
    the reference streaming state machine frame-for-frame."""
    ref, params, cfg = ref_and_params
    monkeypatch.setattr(das, "sample", _greedy_sample)
    delay = 2
    _setup_ref(ref, delay)

    d = cfg.decoder
    Tr, Ts = 5, 8
    ref_content = rng.integers(0, d.vocab_size, (1, Tr))
    ref_codes = rng.integers(0, d.codebook_size, (1, d.num_codebooks, Tr))
    src_content = rng.integers(0, d.vocab_size, (1, Ts))
    style = rng.standard_normal((1, cfg.style_dim)).astype(np.float32)
    timbre = rng.standard_normal((1, 32, cfg.context_dim)).astype(np.float32)

    with torch.no_grad():
        ref.prefill_prompt(
            torch.from_numpy(ref_content),
            torch.from_numpy(ref_codes),
            torch.from_numpy(style),
            torch.from_numpy(timbre),
        )
        ref.prefill_src_condition4delay(torch.from_numpy(src_content[:, :delay]))
        ref_frames = []
        for t in range(delay, Ts):
            codes, pos = ref.decode_one(torch.from_numpy(src_content[:, t : t + 1]))
            ref_frames.append(codes.numpy())  # decode_one already drops the semantic token

    state = arvc.prefill_prompt(
        params, cfg, jnp.asarray(ref_content), jnp.asarray(ref_codes),
        jnp.asarray(style), jnp.asarray(timbre), delay=delay,
    )
    state = arvc.prefill_src_condition4delay(
        params, cfg, state, jnp.asarray(src_content[:, :delay]), delay
    )
    frames = []
    key = jax.random.PRNGKey(0)
    for t in range(delay, Ts):
        key, sub = jax.random.split(key)
        state, codes = arvc.decode_one(
            params, cfg, state, jnp.asarray(src_content[:, t : t + 1]), sub, GREEDY
        )
        frames.append(np.asarray(codes).T)  # (nq, 1)

    ours = np.stack(frames)
    theirs = np.stack(ref_frames)
    assert ours.shape == theirs.shape
    match = (ours == theirs).mean()
    assert match == 1.0, f"streaming code match rate {match}"
