"""ASV_eval^anon: training a speaker-verification model on anonymized data.

Framework equivalent of the reference's eval_post step
(`anon/evaluation/privacy/asv/train_asv_eval.py:25-57` +
`asv_train/train_speaker_embeddings.py`): a speaker-embedding network is
(re)trained on anonymized enrollment-domain speech with an angular-margin
speaker classifier, then used for the AA (informed attacker) EER.  The
reference fine-tunes a pretrained speechbrain ECAPA with AAM-softmax on
random 3 s chunks of anonymized libri-360; here the backbone is the
framework's CAMPPlus (frozen BatchNorm statistics, standard fine-tuning
practice) with a trainable projection head, AAM-softmax loss, Adam, and
random fixed-length chunk sampling — all jitted, TPU-resident, and
shardable over the 'data' mesh axis.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from streamvoiceanon_tpu.audio import fbank as fbank_mod
from streamvoiceanon_tpu.config import CAMPPlusConfig
from streamvoiceanon_tpu.models import campplus


@dataclasses.dataclass
class ASVTrainConfig:
    chunk_seconds: float = 3.0          # sentence_len in the sb recipe
    sample_rate: int = 16000
    batch_size: int = 32
    steps: int = 200
    lr: float = 1e-3
    margin: float = 0.2                 # AAM-softmax additive angular margin
    scale: float = 30.0                 # AAM-softmax scale
    emb_dim: int = 192
    finetune_backbone: bool = False     # False: train projection+classifier only
    weight_decay: float = 1e-4
    seed: int = 0


def init_head(key, cfg: ASVTrainConfig, n_speakers: int) -> Dict:
    kp, kc = jax.random.split(key)
    return {
        # residual projection: identity-at-init adaptation of the embedding
        "proj_w": jax.random.normal(kp, (cfg.emb_dim, cfg.emb_dim), jnp.float32) * 1e-3
        + jnp.eye(cfg.emb_dim, dtype=jnp.float32),
        "proj_b": jnp.zeros((cfg.emb_dim,), jnp.float32),
        # AAM class centers (normalized at use)
        "centers": jax.random.normal(kc, (n_speakers, cfg.emb_dim), jnp.float32)
        * (1.0 / np.sqrt(cfg.emb_dim)),
        # running cohort mean, subtracted before cosine scoring (standard
        # x-vector embedding mean normalization; non-trainable)
        "emb_mean": jnp.zeros((cfg.emb_dim,), jnp.float32),
    }


def embed(params: Dict, cp_cfg: CAMPPlusConfig, feat: jax.Array,
          feat_lens: Optional[jax.Array] = None) -> jax.Array:
    """Adapted speaker embedding: CAMPPlus -> projection -> cohort mean
    subtraction (B, emb_dim)."""
    e = campplus.apply(params["backbone"], cp_cfg, feat, feat_lens)
    e = e @ params["head"]["proj_w"] + params["head"]["proj_b"]
    return e - params["head"]["emb_mean"]


def aam_softmax_loss(head: Dict, emb: jax.Array, labels: jax.Array,
                     margin: float, scale: float) -> jax.Array:
    """Additive-angular-margin softmax (the sb recipe's compute_cost):
    cos(theta_y + m) on the target class, scaled CE over cosine logits."""
    e = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)
    c = head["centers"]
    c = c / (jnp.linalg.norm(c, axis=-1, keepdims=True) + 1e-8)
    cos = e @ c.T  # (B, S)
    cos_y = jnp.take_along_axis(cos, labels[:, None], axis=1)[:, 0]
    sin_y = jnp.sqrt(jnp.clip(1.0 - cos_y**2, 1e-6, 1.0))
    cos_margin = cos_y * np.cos(margin) - sin_y * np.sin(margin)
    # easy-margin guard for theta + m > pi
    cos_margin = jnp.where(cos_y > -np.cos(margin), cos_margin, cos_y - margin * np.sin(margin))
    logits = cos.at[jnp.arange(cos.shape[0]), labels].set(cos_margin) * scale
    return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(logits, labels))


def _chunk_batch(rng: np.random.Generator, wavs: List[np.ndarray],
                 labels: np.ndarray, cfg: ASVTrainConfig) -> Tuple[np.ndarray, np.ndarray]:
    """Random fixed-length chunks (asv_dataset.py:44-53 random_chunk)."""
    n_samp = int(cfg.chunk_seconds * cfg.sample_rate)
    idx = rng.integers(len(wavs), size=cfg.batch_size)
    out = np.zeros((cfg.batch_size, n_samp), np.float32)
    for row, i in enumerate(idx):
        w = wavs[i]
        if len(w) <= n_samp:
            out[row, : len(w)] = w
        else:
            s = rng.integers(len(w) - n_samp)
            out[row] = w[s : s + n_samp]
    return out, labels[idx]


def train_asv_eval(
    campplus_params: Dict,
    cp_cfg: CAMPPlusConfig,
    utterances: Sequence,               # evals.anonymize.Utterance (anonymized!)
    cfg: ASVTrainConfig = ASVTrainConfig(),
    utt_sample_rate: int = 44100,
    history: Optional[list] = None,
) -> Dict:
    """Returns trained params {'backbone','head'}; use with `embed` /
    `extract_embeddings` for the AA attack scoring (ASV_eval^anon).
    Per-step AAM losses are appended to `history` when given."""
    from streamvoiceanon_tpu.audio.resample import resample

    speakers = sorted({u.speaker for u in utterances})
    spk_index = {s: i for i, s in enumerate(speakers)}
    wavs = []
    labels = []
    for u in utterances:
        w = np.asarray(
            resample(jnp.asarray(u.wav, jnp.float32)[None], utt_sample_rate, cfg.sample_rate)
        )[0]
        wavs.append(w.astype(np.float32))
        labels.append(spk_index[u.speaker])
    labels = np.asarray(labels, np.int32)

    key = jax.random.PRNGKey(cfg.seed)
    params = {
        "backbone": jax.tree.map(jnp.asarray, campplus_params),
        "head": init_head(key, cfg, len(speakers)),
    }
    emb_mean = params["head"].pop("emb_mean")  # running stat, not optimized
    trainable = (
        params if cfg.finetune_backbone else {"head": params["head"]}
    )
    tx = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
    opt_state = tx.init(trainable)

    def loss_fn(tr, frozen_backbone, feat):
        p = tr if cfg.finetune_backbone else {"backbone": frozen_backbone, **tr}
        wav_b, lab_b = feat
        f = fbank_mod.fbank(wav_b)
        f = f - jnp.mean(f, axis=1, keepdims=True)
        lens = jnp.full((wav_b.shape[0],), f.shape[1] // 2, jnp.int32)
        e = campplus.apply(p["backbone"], cp_cfg, f, lens)
        e = e @ p["head"]["proj_w"] + p["head"]["proj_b"]
        # center by the batch mean (running version is applied at inference)
        batch_mean = jax.lax.stop_gradient(jnp.mean(e, axis=0))
        loss = aam_softmax_loss(p["head"], e - batch_mean, lab_b, cfg.margin, cfg.scale)
        return loss, batch_mean

    @jax.jit
    def step(tr, s, emb_mean, frozen_backbone, wav_b, lab_b):
        (loss, batch_mean), g = jax.value_and_grad(loss_fn, has_aux=True)(
            tr, frozen_backbone, (wav_b, lab_b)
        )
        updates, s = tx.update(g, s, tr)
        emb_mean = 0.9 * emb_mean + 0.1 * batch_mean
        return optax.apply_updates(tr, updates), s, emb_mean, loss

    rng = np.random.default_rng(cfg.seed)
    frozen = params["backbone"]
    losses = []
    for _ in range(cfg.steps):
        wav_b, lab_b = _chunk_batch(rng, wavs, labels, cfg)
        trainable, opt_state, emb_mean, loss = step(
            trainable, opt_state, emb_mean, frozen,
            jnp.asarray(wav_b), jnp.asarray(lab_b),
        )
        losses.append(loss)

    out = trainable if cfg.finetune_backbone else {"backbone": frozen, "head": trainable["head"]}
    out["head"]["emb_mean"] = emb_mean
    if history is not None:
        history.extend(float(l) for l in losses)
    return out


def extract_embeddings(
    params: Dict, cp_cfg: CAMPPlusConfig, utterances: Sequence,
    sample_rate: int = 44100,
    center: bool = True,
) -> np.ndarray:
    """Adapted embeddings (B, emb_dim) for scoring — the ASV_eval^anon
    counterpart of evals.anonymize.speaker_embeddings.  With `center`, the
    set mean is additionally subtracted (per-cohort mean normalization, the
    standard x-vector scoring practice)."""
    from streamvoiceanon_tpu.audio.resample import resample

    out = []
    for u in utterances:
        w16 = resample(jnp.asarray(u.wav, jnp.float32)[None], sample_rate, 16000)
        f = fbank_mod.fbank(w16)
        f = f - jnp.mean(f, axis=1, keepdims=True)
        lens = jnp.full((1,), f.shape[1] // 2, jnp.int32)
        out.append(np.asarray(embed(params, cp_cfg, f, lens))[0])
    embs = np.stack(out)
    if center:
        embs = embs - embs.mean(axis=0)
    return embs
