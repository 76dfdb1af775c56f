"""Published-geometry (12L/768d) streaming decode parity vs the torch
reference — guards against dimension-dependent bugs that tiny configs hide."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from streamvoiceanon_tpu.config import ARVCConfig, SamplingConfig
from streamvoiceanon_tpu.models import arvc
from streamvoiceanon_tpu.runtime import convert

das = pytest.importorskip("modules.dual_ar_stream")
from modules import arvc_wrapper as awref  # noqa: E402

GREEDY = SamplingConfig(greedy=True)


def _greedy_sample(logits, previous_tokens=None, suppress_tokens=None, **kw):
    return torch.argmax(logits[0, -1], keepdim=True).to(torch.int), None


@pytest.mark.slow
@pytest.mark.parity
@pytest.mark.slow
def test_fullsize_streaming_decode_parity(rng, monkeypatch):
    monkeypatch.setattr(das, "sample", _greedy_sample)
    cfg = ARVCConfig()
    d = cfg.decoder
    torch.manual_seed(0)
    margs = das.DualARModelArgs(
        vocab_size=d.vocab_size, n_layer=d.n_layer, n_head=d.n_head, dim=d.dim,
        intermediate_size=d.intermediate_size, head_dim=d.head_dim,
        max_seq_len=d.max_seq_len, dropout=0.0, tie_word_embeddings=False,
        codebook_size=d.codebook_size, num_codebooks=d.num_codebooks,
        n_fast_layer=d.n_fast_layer, fast_dim=d.fast_dim,
        fast_n_head=d.fast_n_head, fast_head_dim=d.fast_head_dim,
        fast_intermediate_size=d.fast_intermediate_size,
        delay=list(d.delay), cond_input_dim=d.cond_input_dim,
    )
    ref = awref.ARVCWrapper(
        embedding=torch.nn.Embedding(d.vocab_size, d.dim),
        decoder=das.DualARWrapper(das.DualARTransformer(margs)),
        context_dim=cfg.context_dim, style_dim=cfg.style_dim, model_dim=d.dim,
    ).eval()
    ref.setup_caches(max_batch_size=1, max_seq_len=2048, dtype=torch.float32)
    ref.set_delay(delay=2)

    params = arvc.prepare_params(convert.arvc(ref.state_dict(), cfg))

    Tr, n_steps, delay = 24, 4, 2
    ref_content = rng.integers(0, d.vocab_size, (1, Tr))
    ref_codes = rng.integers(0, d.codebook_size, (1, d.num_codebooks, Tr))
    src = rng.integers(0, d.vocab_size, (1, delay + n_steps))
    style = rng.standard_normal((1, cfg.style_dim)).astype(np.float32)
    timbre = rng.standard_normal((1, 32, cfg.context_dim)).astype(np.float32)

    with torch.no_grad():
        ref.prefill_prompt(
            torch.from_numpy(ref_content), torch.from_numpy(ref_codes),
            torch.from_numpy(style), torch.from_numpy(timbre),
        )
        ref.prefill_src_condition4delay(torch.from_numpy(src[:, :delay]))
        want = []
        for t in range(delay, delay + n_steps):
            codes, _ = ref.decode_one(torch.from_numpy(src[:, t : t + 1]))
            want.append(codes.numpy())

    state = arvc.prefill_prompt(
        params, cfg, jnp.asarray(ref_content), jnp.asarray(ref_codes),
        jnp.asarray(style), jnp.asarray(timbre), delay=delay,
    )
    state = arvc.prefill_src_condition4delay(
        params, cfg, state, jnp.asarray(src[:, :delay]), delay
    )
    got = []
    for t in range(delay, delay + n_steps):
        state, codes = arvc.decode_one(
            params, cfg, state, jnp.asarray(src[:, t : t + 1]),
            jax.random.PRNGKey(t), GREEDY,
        )
        got.append(np.asarray(codes).T)

    match = (np.stack(got) == np.stack(want)).mean()
    assert match == 1.0, f"full-size code match rate {match}"


@pytest.mark.slow
@pytest.mark.parity
def test_fullsize_tokenizer_token_exact(rng):
    """Published-geometry tokenizer: token-exact encode vs torch."""
    import refstubs

    refstubs.install()
    from modules.vqgan.modules import bsq_no_upsample as bsqref
    from modules.vqgan.modules import firefly as fireref
    from modules.vqgan import windowed_transformer as wtref

    from streamvoiceanon_tpu.config import TokenizerConfig
    from streamvoiceanon_tpu.models import tokenizer
    from streamvoiceanon_tpu.ops import stft

    cfg = TokenizerConfig()
    torch.manual_seed(0)

    def wt():
        margs = wtref.ModelArgs(
            block_size=2048, n_layer=8, n_head=8, dim=512, intermediate_size=1536,
            head_dim=64, dropout_rate=0.0, attn_dropout_rate=0.0,
        )
        return wtref.WindowLimitedTransformer(margs, window_size=512, causal=True)

    class Ref(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = fireref.ConvNeXtEncoder(
                input_channels=160, depths=[3, 3, 9, 3], dims=[128, 256, 384, 512]
            )
            self.quantizer = bsqref.DownsampleBinarySphericalQuantize(
                input_dim=512, n_groups=1, codebook_size=8192,
                downsample_factor=[2, 2], pre_module=wt(), post_module=wt(),
            )

    ref = Ref().eval()
    params = jax.tree.map(jnp.asarray, __import__("streamvoiceanon_tpu.runtime.convert", fromlist=["tokenizer"]).tokenizer(ref.state_dict(), cfg))
    wav = (rng.standard_normal((1, 2048 * 24)) * 0.2).astype(np.float32)
    mel = stft.log_mel_spectrogram(jnp.asarray(wav), cfg.mel)
    with torch.no_grad():
        feats = ref.backbone(torch.from_numpy(np.swapaxes(np.asarray(mel), 1, 2).copy()))
        idx_ref = ref.quantizer.encode(feats).numpy()[0]
    toks = np.asarray(tokenizer.encode(params, cfg, jnp.asarray(wav)))
    assert (toks == idx_ref).mean() == 1.0


@pytest.mark.slow
@pytest.mark.parity
def test_fullsize_vocoder_decode_allclose(rng):
    """Published-geometry vocoder: codes -> waveform allclose vs torch."""
    import refstubs

    refstubs.install()
    from modules.vqgan.modules import firefly as fireref
    from modules.vqgan.modules import fsq as fsqref

    from streamvoiceanon_tpu.config import VocoderConfig
    from streamvoiceanon_tpu.models import vocoder
    from streamvoiceanon_tpu.runtime import convert as cvt

    cfg = VocoderConfig()
    torch.manual_seed(0)

    class Ref(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.head = fireref.HiFiGANGenerator(
                hop_length=512, upsample_rates=(8, 8, 2, 2, 2),
                upsample_kernel_sizes=(16, 16, 4, 4, 4),
                resblock_kernel_sizes=(3, 7, 11),
                resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
                num_mels=512, upsample_initial_channel=512,
                pre_conv_kernel_size=13, post_conv_kernel_size=13,
            )
            self.backbone = fireref.ConvNeXtEncoder(
                input_channels=160, depths=[3, 3, 9, 3], dims=[128, 256, 384, 512]
            )
            self.quantizer = fsqref.DownsampleFiniteScalarQuantize(
                input_dim=512, n_codebooks=1, n_groups=8, levels=[8, 5, 5, 5],
                downsample_factor=[2, 2],
            )

    ref = Ref().eval()
    params = jax.tree.map(jnp.asarray, cvt.vocoder(ref.state_dict(), cfg))
    codes = rng.integers(0, 1000, (1, 8, 6)).astype(np.int64)
    with torch.no_grad():
        want = ref.head(ref.quantizer.decode(torch.from_numpy(codes))).numpy()[:, 0]
    got = np.asarray(vocoder.decode(params, cfg, jnp.asarray(codes.astype(np.int32))))
    assert got.shape == want.shape == (1, 6 * 2048)
    np.testing.assert_allclose(got, want, atol=1e-2)
    assert np.abs(got - want).mean() < 1e-4
