"""End-to-end checkpoint pipeline: save torch state_dicts shaped exactly like
the published files (SURVEY.md §2.5), load through cli.build_converter_from_
ckpts, and check a conversion runs — validating key naming, weight-norm
resolution and layout transposes against the real load path."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import refstubs

refstubs.install()

das = pytest.importorskip("modules.dual_ar_stream")
from modules import arvc_wrapper as awref  # noqa: E402
from modules.vqgan.modules import bsq_no_upsample as bsqref  # noqa: E402
from modules.vqgan.modules import firefly as fireref  # noqa: E402
from modules.vqgan.modules import fsq as fsqref  # noqa: E402
from modules.vqgan import windowed_transformer as wtref  # noqa: E402
from modules.campplus import DTDNN as dtdnn  # noqa: E402
from modules.bicodec_speaker_encoder import ecapa_tdnn as ecapa_ref  # noqa: E402
from modules.bicodec_speaker_encoder import perceiver_encoder as pe_ref  # noqa: E402
from modules.bicodec_speaker_encoder.fsq import residual_fsq as rfsq_ref  # noqa: E402


@pytest.mark.slow
@pytest.mark.parity
def test_full_checkpoint_load_path(tmp_path, rng):
    torch.manual_seed(0)

    # ---- build reference modules at PUBLISHED geometry and save state_dicts
    def wt():
        margs = wtref.ModelArgs(
            block_size=2048, n_layer=8, n_head=8, dim=512, intermediate_size=1536,
            head_dim=64, dropout_rate=0.1, attn_dropout_rate=0.1,
        )
        return wtref.WindowLimitedTransformer(margs, window_size=512, causal=True)

    class Tok(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = fireref.ConvNeXtEncoder(
                input_channels=160, depths=[3, 3, 9, 3], dims=[128, 256, 384, 512]
            )
            self.quantizer = bsqref.DownsampleBinarySphericalQuantize(
                input_dim=512, n_groups=1, codebook_size=8192,
                downsample_factor=[2, 2], pre_module=wt(), post_module=wt(),
            )

    class Voc(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = fireref.ConvNeXtEncoder(
                input_channels=160, depths=[3, 3, 9, 3], dims=[128, 256, 384, 512]
            )
            self.head = fireref.HiFiGANGenerator(
                hop_length=512, upsample_rates=(8, 8, 2, 2, 2),
                upsample_kernel_sizes=(16, 16, 4, 4, 4),
                resblock_kernel_sizes=(3, 7, 11),
                resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
                num_mels=512, upsample_initial_channel=512,
                pre_conv_kernel_size=13, post_conv_kernel_size=13,
            )
            self.quantizer = fsqref.DownsampleFiniteScalarQuantize(
                input_dim=512, n_codebooks=1, n_groups=8, levels=[8, 5, 5, 5],
                downsample_factor=[2, 2],
            )

    margs = das.DualARModelArgs(
        vocab_size=8192, n_layer=12, n_head=12, dim=768, intermediate_size=2304,
        head_dim=64, max_seq_len=2048, dropout=0.1, tie_word_embeddings=False,
        codebook_size=1000, num_codebooks=8, n_fast_layer=4, fast_dim=768,
        fast_n_head=12, fast_head_dim=64, fast_intermediate_size=2304,
        delay=list(range(9)), cond_input_dim=768,
    )
    arvc_ref = awref.ARVCWrapper(
        embedding=torch.nn.Embedding(8192, 768),
        decoder=das.DualARWrapper(das.DualARTransformer(margs)),
        context_dim=128, style_dim=192, model_dim=768,
    )
    campplus_ref = dtdnn.CAMPPlus(feat_dim=80, embedding_size=192)

    class Spk(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.speaker_encoder = ecapa_ref.ECAPA_TDNN_GLOB_c512(
                feat_dim=128, embed_dim=1024
            )
            self.perceiver_sampler = pe_ref.PerceiverResampler(
                dim=128, dim_context=1536, num_latents=32
            )
            self.quantizer = rfsq_ref.ResidualFSQ(
                levels=[4] * 6, num_quantizers=1, dim=128,
                is_channel_first=True, quantize_dropout=False,
            )

    torch.save(Tok().state_dict(), tmp_path / "asr_s2s_bsq_8192_causal_down_whisper.pth")
    torch.save(Voc().state_dict(), tmp_path / "firefly-gan-vq-fsq-8x1024-21hz-generator.pth")
    torch.save(arvc_ref.state_dict(), tmp_path / "dual_ar_delay_0_8.pth")
    torch.save(campplus_ref.state_dict(), tmp_path / "campplus_cn_common.bin")
    torch.save(Spk().state_dict(), tmp_path / "spark_speaker_encoder.pth")

    # ---- key-coverage contract (VERDICT r2 next #7): every key of every
    # published-geometry state_dict must be consumed by its converter — the
    # strict counterpart of the reference's silent strict=False load
    # (infer_arvc.py:70-83,160-165)
    from streamvoiceanon_tpu.config import PipelineConfig
    from streamvoiceanon_tpu.models import campplus as campplus_mod
    from streamvoiceanon_tpu.models import speaker_encoder as spk_mod
    from streamvoiceanon_tpu.runtime import convert

    cfg = PipelineConfig()
    manifests = {
        "tokenizer": (convert.tokenizer, Tok().state_dict(), cfg.tokenizer),
        "vocoder": (convert.vocoder, Voc().state_dict(), cfg.vocoder),
        "arvc": (convert.arvc, arvc_ref.state_dict(), cfg.arvc),
        "campplus": (campplus_mod.convert, campplus_ref.state_dict(), cfg.campplus),
        "speaker": (spk_mod.convert, Spk().state_dict(), cfg.speaker),
    }
    for name, (fn, sd, ccfg) in manifests.items():
        assert len(sd) > 0
        _, leftover = convert.convert_with_coverage(fn, sd, ccfg)
        assert leftover == [], f"{name}: unconsumed checkpoint keys {leftover[:20]}"

    # ---- load through the CLI's checkpoint path (strict mode) and convert
    from streamvoiceanon_tpu.cli import build_converter_from_ckpts

    cv = build_converter_from_ckpts(str(tmp_path))
    assert cv.campplus_params is not None and cv.speaker_params is not None

    wav = (rng.standard_normal(8 * 2048) * 0.1).astype(np.float32)
    toks = cv.content_tokens(jnp.asarray(wav)[None])
    codes = cv.audio_codes(jnp.asarray(wav)[None])
    assert toks.shape == (1, 8) and codes.shape == (1, 8, 8)
    w16 = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    style = cv.style_vector(jnp.asarray(w16)[None])
    timbre = cv.timbre_latents(jnp.asarray(w16)[None])
    assert style.shape == (1, 192) and timbre.shape == (1, 32, 128)
    assert np.isfinite(np.asarray(style)).all()


def test_coverage_dict_mechanics():
    """CoverageDict tracking survives subset/rename views; convert_strict
    refuses a state_dict with an orphan key and names it."""
    import numpy as np
    import pytest as _pt

    from streamvoiceanon_tpu.runtime.convert import (
        CoverageDict, convert_strict, convert_with_coverage,
    )

    sd = {"a.weight": np.ones(2), "decoder.b.weight": np.ones(2),
          "decoder.extra": np.ones(1), "bn.num_batches_tracked": np.ones(1)}

    def conv(d):
        sub = d.subset("decoder.") if isinstance(d, CoverageDict) else d
        return {"a": d["a.weight"], "b": sub["b.weight"]}

    params, leftover = convert_with_coverage(conv, sd)
    # the orphan under the stripped prefix is reported with its ORIGINAL key;
    # torch bookkeeping buffers are ignored by default
    assert leftover == ["decoder.extra"]
    with _pt.raises(KeyError, match="decoder.extra"):
        convert_strict(conv, sd)

    # rename view forwards reads to original names too
    cov = CoverageDict({"xvector.w": np.ones(1)})
    renamed = cov.rename(lambda k: k.replace("xvector.", ""))
    _ = renamed["w"]
    assert cov.unread() == []
