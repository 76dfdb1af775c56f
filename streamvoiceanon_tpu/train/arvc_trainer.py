"""ARVC (voice-conversion LM) trainer.

The TPU-native equivalent of trainers/arvc_trainer.py:30-501: per batch the
frozen feature extractors produce codec targets, content conditions, and
speaker embeddings; the dual-AR LM is trained with codebook + semantic CE
under MuonAdamW with exponential-decay LR and grad clipping; checkpoints go
through Orbax; metrics to tensorboard (if available) and a JSONL log.

Distribution: the batch is sharded over the mesh 'data' axis; gradients are
all-reduced by XLA (no DDP wrapper — SURVEY.md §2.4).  Multi-host runs call
jax.distributed.initialize() before building the trainer and feed
process-local batches.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from streamvoiceanon_tpu.audio import fbank as fbank_mod
from streamvoiceanon_tpu.audio.resample import resample
from streamvoiceanon_tpu.config import PipelineConfig
from streamvoiceanon_tpu.models import arvc, campplus, speaker_encoder, tokenizer, vocoder
from streamvoiceanon_tpu.parallel import mesh as meshlib
from streamvoiceanon_tpu.train import muon as muon_mod
from streamvoiceanon_tpu.train.step import TrainState


@dataclasses.dataclass
class TrainerConfig:
    lr: float = 1e-4
    gamma: float = 0.999997
    min_lr: float = 1e-5
    clip: float = 1000.0
    codebook_loss_weight: float = 1.0
    semantic_loss_weight: float = 1.0
    log_interval: int = 10
    save_interval: int = 4000
    log_dir: str = "runs/arvc"
    seed: int = 0
    n_model_shards: int = 1


class ARVCTrainer:
    def __init__(
        self,
        cfg: PipelineConfig,
        tcfg: TrainerConfig,
        arvc_params: Dict,
        tokenizer_params: Dict,
        vocoder_params: Dict,
        campplus_params: Optional[Dict] = None,
        speaker_params: Optional[Dict] = None,
    ):
        self.cfg = cfg
        self.tcfg = tcfg
        self.mesh = meshlib.make_mesh(n_model=tcfg.n_model_shards)
        self.frozen = {
            "tokenizer": meshlib.replicate(tokenizer_params, self.mesh),
            "vocoder": meshlib.replicate(vocoder_params, self.mesh),
            "campplus": meshlib.replicate(campplus_params, self.mesh)
            if campplus_params is not None else None,
            "speaker": meshlib.replicate(speaker_params, self.mesh)
            if speaker_params is not None else None,
        }

        specs = jax.tree.map(lambda _: meshlib.P(), arvc_params)
        specs["model"] = meshlib.dual_ar_param_specs(arvc_params["model"])
        params = meshlib.shard_params(arvc_params, self.mesh, specs)

        schedule = muon_mod.exp_decay_schedule(tcfg.lr, tcfg.gamma, tcfg.min_lr)
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(tcfg.clip),
            muon_mod.muon_adamw(lr=tcfg.lr),
            optax.scale_by_schedule(schedule),
        )
        self.state = TrainState(params, self.optimizer.init(params), jnp.int32(0))
        self.key = jax.random.PRNGKey(tcfg.seed)
        self.metrics_path = os.path.join(tcfg.log_dir, "metrics.jsonl")
        os.makedirs(tcfg.log_dir, exist_ok=True)
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(tcfg.log_dir)
        except Exception:
            pass

    # ------------------------------------------------------------------

    def _features(self, waves: jax.Array, frame_lens: jax.Array) -> Dict:
        """Frozen feature extraction (arvc_trainer.py:346-363)."""
        w16 = resample(waves, self.cfg.sample_rate, self.cfg.resample_rate)
        content = tokenizer.encode(self.frozen["tokenizer"], self.cfg.tokenizer, waves)
        codes = vocoder.encode(self.frozen["vocoder"], self.cfg.vocoder, waves)[0]
        if self.frozen["campplus"] is not None:
            feat = fbank_mod.fbank(w16)
            feat = feat - jnp.mean(feat, axis=1, keepdims=True)
            lens = jnp.full((feat.shape[0],), feat.shape[1] // 2, jnp.int32)
            style = campplus.apply(self.frozen["campplus"], self.cfg.campplus, feat, lens)
        else:
            style = jnp.zeros((waves.shape[0], self.cfg.arvc.style_dim))
        if self.frozen["speaker"] is not None:
            lens16 = jnp.full((w16.shape[0],), w16.shape[1], jnp.int32)
            timbre, _ = speaker_encoder.tokenize_wav(
                self.frozen["speaker"], self.cfg.speaker, w16, lens16
            )
        else:
            timbre = jnp.zeros((waves.shape[0], 32, self.cfg.arvc.context_dim))
        return {
            "content": content,
            "base_target": content,  # next-content-token target (arvc_trainer.py:374)
            "target": codes,
            "x_lens": frame_lens.astype(jnp.int32),
            "style": style,
            "timbre": timbre,
        }

    @functools.partial(jax.jit, static_argnums=(0, 3), donate_argnums=(1,))
    def _step(self, state: TrainState, batch: Dict, delay: int):
        def loss_fn(params):
            cb, tok = arvc.forward_train(
                params, self.cfg.arvc, batch["content"], batch["base_target"],
                batch["target"], batch["x_lens"], batch["style"], batch["timbre"],
                delay,
            )
            loss = (
                self.tcfg.codebook_loss_weight * cb
                + self.tcfg.semantic_loss_weight * tok
            )
            return loss, {"codebook_loss": cb, "token_loss": tok}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        aux = dict(aux, loss=loss, grad_norm=optax.global_norm(grads))
        return TrainState(params, opt_state, state.step + 1), aux

    def train_step(self, batch: Dict) -> Dict:
        """One step: host batch dict with `waves` (B, T) and `frame_lens`."""
        waves = meshlib.shard_batch(jnp.asarray(batch["waves"]), self.mesh)
        frame_lens = meshlib.shard_batch(jnp.asarray(batch["frame_lens"]), self.mesh)
        with self.mesh:
            feats = self._features(waves, frame_lens)
            self.key, sub = jax.random.split(self.key)
            delay = int(
                np.asarray(
                    jax.random.choice(sub, jnp.asarray(self.cfg.arvc.decoder.delay))
                )
            )
            self.state, aux = self._step(self.state, feats, delay)
        return {k: float(v) for k, v in aux.items()}

    # ------------------------------------------------------------------

    def train(self, data: Iterator[Dict], max_steps: int = 1000) -> None:
        t0 = time.time()
        for i, batch in enumerate(data):
            if i >= max_steps:
                break
            aux = self.train_step(batch)
            step = int(self.state.step)
            if step % self.tcfg.log_interval == 0:
                rec = dict(aux, step=step, wall=time.time() - t0)
                with open(self.metrics_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                if self._tb is not None:
                    for k, v in aux.items():
                        self._tb.add_scalar(f"train/{k}", v, step)
            if step % self.tcfg.save_interval == 0:
                self.save_checkpoint()

    # ------------------------------------------------------------------

    def save_checkpoint(self, path: Optional[str] = None, keep_last: int = 1) -> str:
        """Orbax save with keep-last-N rotation (arvc_trainer.py:479-500)."""
        import shutil

        import orbax.checkpoint as ocp

        step = int(self.state.step)
        base = os.path.abspath(self.tcfg.log_dir)
        path = path or os.path.join(base, f"ckpt_{step}")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, self.state.params, force=True)
        ckptr.wait_until_finished()
        if keep_last:
            old = sorted(
                (d for d in os.listdir(base)
                 if d.startswith("ckpt_") and d.split("_")[1].isdigit()),
                key=lambda d: int(d.split("_")[1]),
            )[:-keep_last]
            for d in old:
                shutil.rmtree(os.path.join(base, d), ignore_errors=True)
        return path

    def load_checkpoint(self, path: str) -> None:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(path, self.state.params)
        tail = path.rstrip("/").rsplit("_", 1)[-1]
        step = int(tail) if tail.isdigit() else 0
        self.state = TrainState(restored, self.state.opt_state, jnp.int32(step))

    def resume_latest(self) -> Optional[str]:
        """Resume from the highest-step checkpoint in log_dir (the reference's
        glob-latest behavior, arvc_trainer.py:203-241)."""
        base = os.path.abspath(self.tcfg.log_dir)
        cands = [d for d in os.listdir(base) if d.startswith("ckpt_")] if os.path.isdir(base) else []
        if not cands:
            return None
        latest = max(cands, key=lambda d: int(d.split("_")[1]))
        path = os.path.join(base, latest)
        self.load_checkpoint(path)
        return path

    def log_audio_sample(self, batch: Dict, step: Optional[int] = None) -> None:
        """Periodic reconstruction logging (arvc_trainer.py:446-477): run the
        model's offline generate on the first utterance of the batch and log
        the vocoded audio to tensorboard."""
        if self._tb is None:
            return
        from streamvoiceanon_tpu.models import arvc as arvc_mod
        from streamvoiceanon_tpu.models import vocoder as voc_mod

        waves = jnp.asarray(batch["waves"][:1])
        with self.mesh:
            feats = self._features(waves, jnp.asarray(batch["frame_lens"][:1]))
            codes = arvc_mod.generate(
                self.state.params, self.cfg.arvc, feats["content"][:, :16],
                feats["target"][:, :, :16], feats["content"], feats["style"],
                feats["timbre"], jax.random.PRNGKey(0),
            )
            wav = voc_mod.decode(self.frozen["vocoder"], self.cfg.vocoder, codes)
        self._tb.add_audio(
            "train/reconstruction", np.asarray(wav)[0, :, None],
            step if step is not None else int(self.state.step),
            sample_rate=self.cfg.sample_rate,
        )
