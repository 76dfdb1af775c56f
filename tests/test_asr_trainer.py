"""ASR (content-encoder) trainer smoke test on tiny models."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

import tinymodels
from streamvoiceanon_tpu.config import ConvNeXtConfig, replace
from streamvoiceanon_tpu.models import asr_decoder, tokenizer
from streamvoiceanon_tpu.train.asr_trainer import ASRTrainer, ASRTrainerConfig


@pytest.mark.slow
def test_asr_trainer_step():
    cfg = tinymodels.tiny_config()
    tok_cfg = replace(
        cfg.tokenizer,
        head=ConvNeXtConfig(
            input_channels=32, depths=(1, 1), dims=(24, 40), gin_channels=0
        ),
    )
    cfg = replace(cfg, tokenizer=tok_cfg)
    acfg = asr_decoder.ASRDecoderConfig(
        hidden_dim=32, num_heads=2, depth=1, block_size=128, in_channels=32,
        n_vocab=60, bos_id=50, eos_id=49,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tok_params = tokenizer.init(k1, tok_cfg, with_head=True)
    asr_params = asr_decoder.init(k2, acfg)

    trainer = ASRTrainer(cfg, acfg, ASRTrainerConfig(), tok_params, asr_params)
    B, frames = 2, 6
    waves = np.random.default_rng(0).standard_normal((B, frames * 2048)).astype(np.float32) * 0.1
    n_lat = frames
    teacher_T = frames * 4  # w2v rate ~ 4x token rate in this tiny setup
    batch = {
        "waves": waves,
        "teacher_feats": np.random.default_rng(1).standard_normal(
            (B, teacher_T, 40)
        ).astype(np.float32),
        "teacher_lens": np.array([teacher_T, teacher_T - 4]),
        "latent_lens": np.array([n_lat, n_lat - 1]),
        "text": np.random.default_rng(2).integers(0, 40, (B, 5)),
        "text_lens": np.array([5, 4]),
    }
    aux1 = trainer.train_step(batch)
    aux2 = trainer.train_step(batch)
    assert np.isfinite(aux1["loss"]) and np.isfinite(aux2["loss"])
    assert aux2["loss"] != aux1["loss"]  # parameters actually updated


def test_asr_trainer_from_dataloader():
    """End-to-end: the trainer consumes `train.data.batches` output directly
    — transcripts are cleaned/normalized/tokenized inside the pipeline
    (hf_stream_dataloader.py:163-241 equivalent), no hand-built text
    tensors."""
    from streamvoiceanon_tpu.train import data as datalib
    from streamvoiceanon_tpu.train.text import TextTokenizer

    cfg = tinymodels.tiny_config()
    tok_cfg = replace(
        cfg.tokenizer,
        head=ConvNeXtConfig(
            input_channels=32, depths=(1, 1), dims=(24, 40), gin_channels=0
        ),
    )
    cfg = replace(cfg, tokenizer=tok_cfg)
    acfg = asr_decoder.ASRDecoderConfig(
        hidden_dim=32, num_heads=2, depth=1, block_size=2048, in_channels=32,
        n_vocab=51866, bos_id=50528, eos_id=50527,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tok_params = tokenizer.init(k1, tok_cfg, with_head=True)
    asr_params = asr_decoder.init(k2, acfg)

    def teacher_fn(waves, wave_lens):
        # frozen-teacher stand-in: deterministic features at ~4x token rate
        B, T = waves.shape
        n = T // 2048 * 4
        feats = np.asarray(waves).reshape(B, T // 512, 512)[:, :n].mean(-1)
        feats = np.repeat(feats[:, :n, None], 40, axis=-1)
        return feats.astype(np.float32), np.asarray(wave_lens) // 512

    trainer = ASRTrainer(cfg, acfg, ASRTrainerConfig(), tok_params, asr_params,
                         teacher_fn=teacher_fn)
    dcfg = datalib.DataConfig(batch_size=2)
    src = datalib.attach_text_ids(
        datalib.synthetic_dataset(dcfg, seed=0, frames=(4, 8)),
        TextTokenizer(bos_id=50528, eos_id=50527),
    )
    it = datalib.batches(src, dcfg)
    b = next(it)
    assert "text" in b and "text_lens" in b and b["text"].ndim == 2
    aux = trainer.train_step(b)
    assert np.isfinite(aux["loss"])
    aux2 = trainer.train_step(next(it))
    assert np.isfinite(aux2["loss"])
