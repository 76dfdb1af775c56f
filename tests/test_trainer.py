"""Trainer smoke tests: two sharded steps on synthetic data + checkpoint
save/restore round trip."""

import pytest
import numpy as np

import jax.numpy as jnp

import tinymodels
from streamvoiceanon_tpu.train import data as data_mod
from streamvoiceanon_tpu.train.arvc_trainer import ARVCTrainer, TrainerConfig


@pytest.mark.slow
def test_arvc_trainer_steps(tmp_path):
    cv = tinymodels.tiny_converter()
    tcfg = TrainerConfig(
        log_dir=str(tmp_path), log_interval=1, save_interval=10_000,
        n_model_shards=2,
    )
    trainer = ARVCTrainer(
        cv.cfg, tcfg, cv.arvc_params, cv.tokenizer_params, cv.vocoder_params
    )
    dcfg = data_mod.DataConfig(batch_size=4)
    src = data_mod.synthetic_dataset(dcfg, frames=(4, 8))
    losses = []
    for i, batch in enumerate(data_mod.batches(src, dcfg)):
        if i >= 2:
            break
        aux = trainer.train_step(batch)
        assert np.isfinite(aux["loss"])
        losses.append(aux["loss"])
    assert len(losses) == 2

    # checkpoint round trip
    path = trainer.save_checkpoint(str(tmp_path / "ckpt_test"))
    before = jnp.asarray(trainer.state.params["embedding"]).copy()
    trainer.state.params["embedding"] = jnp.zeros_like(before)
    trainer.load_checkpoint(path)
    np.testing.assert_allclose(
        np.asarray(trainer.state.params["embedding"]), np.asarray(before)
    )
