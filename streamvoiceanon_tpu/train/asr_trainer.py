"""Content-encoder (ASR) trainer.

TPU-native equivalent of trainers/asr_trainer.py:30-409: trains the tokenizer
encoder and the ASR decoder head jointly with (a) seq2seq CE over BSQ latents
+ whisper-tokenized text and (b) an L1 distillation loss against frozen
w2v-BERT layer-17 features, with per-model grad clipping (10.0) and AdamW.

The w2v-BERT teacher (modules/wav2vec/w2v_bert2.py) needs the HF checkpoint
`facebook/w2v-bert-2.0`; in network-less environments pass precomputed
teacher features in the batch instead.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from streamvoiceanon_tpu.config import PipelineConfig
from streamvoiceanon_tpu.models import asr_decoder, tokenizer
from streamvoiceanon_tpu.parallel import mesh as meshlib


@dataclasses.dataclass
class ASRTrainerConfig:
    lr: float = 1e-4
    clip: float = 10.0  # per-model clip (asr_trainer.py:333-345)
    ce_weight: float = 1.0
    l1_weight: float = 1.0
    log_dir: str = "runs/asr"
    seed: int = 0


class ASRTrainer:
    def __init__(
        self,
        cfg: PipelineConfig,
        acfg: asr_decoder.ASRDecoderConfig,
        tcfg: ASRTrainerConfig,
        tokenizer_params: Dict,
        asr_params: Dict,
        teacher_fn=None,
    ):
        """`teacher_fn(waves, wave_lens) -> (feats, feat_lens)` computes the
        frozen w2v-BERT distillation targets (asr_trainer.py:301-303) for
        batches that come straight off the dataloader; precomputed
        `teacher_feats`/`teacher_lens` in the batch take precedence."""
        self.cfg = cfg
        self.acfg = acfg
        self.tcfg = tcfg
        self.teacher_fn = teacher_fn
        self.mesh = meshlib.make_mesh()
        self.params = {
            "tokenizer": meshlib.replicate(tokenizer_params, self.mesh),
            "asr": meshlib.replicate(asr_params, self.mesh),
        }
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(tcfg.clip),
            optax.adamw(tcfg.lr, b1=0.9, b2=0.98, eps=1e-6, weight_decay=0.01),
        )
        self.opt_state = self.optimizer.init(self.params)
        self.step_count = 0

    @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(1, 2))
    def _step(self, params, opt_state, batch):
        def loss_fn(p):
            pred, vq = tokenizer.forward(
                p["tokenizer"], self.cfg.tokenizer, batch["waves"],
                target_len=batch["teacher_feats"].shape[1], g=batch.get("style"),
            )
            # masked L1 distillation (asr_trainer.py:321-325)
            mask = (
                jnp.arange(pred.shape[1])[None, :] < batch["teacher_lens"][:, None]
            ).astype(pred.dtype)[..., None]
            l1 = jnp.sum(jnp.abs(pred - batch["teacher_feats"]) * mask) / jnp.maximum(
                jnp.sum(mask) * pred.shape[-1], 1.0
            )
            s2s = asr_decoder.forward(
                p["asr"], self.acfg, vq["latents"], batch["latent_lens"],
                batch["text"], batch["text_lens"],
            )
            loss = self.tcfg.ce_weight * s2s + self.tcfg.l1_weight * l1
            return loss, {"s2s_loss": s2s, "l1_loss": l1}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, dict(aux, loss=loss)

    def train_step(self, batch: Dict) -> Dict:
        """Accepts either a fully prepared batch (tests) or a raw dataloader
        batch from `train.data.batches` (waves/wave_lens/frame_lens/text/
        text_lens) — latent lengths default to the frame lengths and teacher
        features are computed by `teacher_fn`."""
        batch = dict(batch)
        if "latent_lens" not in batch and "frame_lens" in batch:
            batch["latent_lens"] = batch["frame_lens"]
        if "teacher_feats" not in batch:
            if self.teacher_fn is None:
                raise ValueError(
                    "batch lacks teacher_feats and no teacher_fn was given"
                )
            feats, lens = self.teacher_fn(batch["waves"], batch["wave_lens"])
            batch["teacher_feats"], batch["teacher_lens"] = feats, lens
        keep = {"waves", "teacher_feats", "teacher_lens", "latent_lens",
                "text", "text_lens", "style"}
        batch = {k: jnp.asarray(v) for k, v in batch.items() if k in keep}
        with self.mesh:
            self.params, self.opt_state, aux = self._step(
                self.params, self.opt_state, batch
            )
        self.step_count += 1
        return {k: float(v) for k, v in aux.items()}
