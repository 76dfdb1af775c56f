"""ECAPA-TDNN ASV_eval^anon: the VPC-protocol informed attacker.

The reference's eval_post retrains a speechbrain ECAPA(-small) speaker
encoder from scratch with AAM-softmax on anonymized libri-360 and scores the
AA condition with it (`anon/evaluation/privacy/asv/asv_train/
train_speaker_embeddings.py`, hparams ecapa/xvector;
`speechbrain_vectors.py:1-80`).  This module is the native equivalent,
reusing the framework's ECAPA blocks (`models/speaker_encoder.py`
ecapa_latents — SE-Res2 TDNN) and adding what the BiCodec timbre encoder
replaces with a Perceiver: global-context attentive statistics pooling +
embedding head (speechbrain AttentiveStatisticsPooling semantics), then
AAM-softmax training on random 3 s chunks.

Batch norm runs in true train mode (batch statistics) during training, with
EMA running stats written back into the param tree so inference uses the
standard stored-stat path (`speaker_encoder._bn`).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from streamvoiceanon_tpu.audio import fbank as fbank_mod
from streamvoiceanon_tpu.evals.asv_train import _chunk_batch, aam_softmax_loss
from streamvoiceanon_tpu.models import speaker_encoder as se


@dataclasses.dataclass
class ECAPAASVConfig:
    in_dim: int = 80                 # kaldi fbank features
    channels: int = 512              # ECAPA-small (the VPC eval hparams)
    latent_dim: int = 1536           # multi-scale aggregation width
    attn_dim: int = 128              # ASTP bottleneck
    se_dim: int = 128                # squeeze-excite bottleneck
    emb_dim: int = 192
    res2_scale: int = 8
    # training
    chunk_seconds: float = 3.0
    sample_rate: int = 16000
    batch_size: int = 32
    steps: int = 300
    lr: float = 1e-3
    margin: float = 0.2
    scale: float = 30.0
    weight_decay: float = 1e-4
    bn_momentum: float = 0.9
    seed: int = 0


# ---------------------------------------------------------------------------
# Init (random — the VPC protocol trains the attacker from scratch)
# ---------------------------------------------------------------------------


def _bn_init(c: int) -> Dict:
    return {"mean": jnp.zeros((c,)), "var": jnp.ones((c,)),
            "w": jnp.ones((c,)), "b": jnp.zeros((c,))}


def init_backbone(key, cfg: ECAPAASVConfig) -> Dict:
    """Random init matching the `se.ecapa_latents` tree."""
    C, W = cfg.channels, cfg.channels // cfg.res2_scale

    def conv(k, kw, cin, cout):
        return jax.random.normal(k, (kw, cin, cout), jnp.float32) * np.sqrt(
            2.0 / (kw * cin))

    def res2_layer(k):
        ks = jax.random.split(k, 4 + cfg.res2_scale)
        return {
            "conv1_w": conv(ks[0], 1, C, C), "conv1_b": jnp.zeros((C,)),
            "bn1": _bn_init(C),
            "res2": [
                {"w": conv(ks[4 + i], 3, W, W), "b": jnp.zeros((W,)),
                 "bn": _bn_init(W)}
                for i in range(cfg.res2_scale - 1)
            ],
            "conv2_w": conv(ks[1], 1, C, C), "conv2_b": jnp.zeros((C,)),
            "bn2": _bn_init(C),
            "se1_w": jax.random.normal(ks[2], (C, cfg.se_dim)) * np.sqrt(2.0 / C),
            "se1_b": jnp.zeros((cfg.se_dim,)),
            "se2_w": jax.random.normal(ks[3], (cfg.se_dim, C)) * np.sqrt(
                2.0 / cfg.se_dim),
            "se2_b": jnp.zeros((C,)),
        }

    ks = jax.random.split(key, 6)
    return {
        "layer1_w": conv(ks[0], 5, cfg.in_dim, C),
        "layer1_b": jnp.zeros((C,)),
        "layer1_bn": _bn_init(C),
        "layer2": res2_layer(ks[1]),
        "layer3": res2_layer(ks[2]),
        "layer4": res2_layer(ks[3]),
        "conv_w": conv(ks[4], 1, 3 * C, cfg.latent_dim),
        "conv_b": jnp.zeros((cfg.latent_dim,)),
    }


def init_head(key, cfg: ECAPAASVConfig, n_speakers: int) -> Dict:
    """ASTP + embedding fc + AAM class centers."""
    L = cfg.latent_dim
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "attn1_w": jax.random.normal(k1, (3 * L, cfg.attn_dim)) * np.sqrt(
            2.0 / (3 * L)),
        "attn1_b": jnp.zeros((cfg.attn_dim,)),
        "attn2_w": jax.random.normal(k2, (cfg.attn_dim, L)) * np.sqrt(
            2.0 / cfg.attn_dim),
        "attn2_b": jnp.zeros((L,)),
        "pool_bn": _bn_init(2 * L),
        "fc_w": jax.random.normal(k3, (2 * L, cfg.emb_dim)) * np.sqrt(
            1.0 / (2 * L)),
        "fc_b": jnp.zeros((cfg.emb_dim,)),
        "centers": jax.random.normal(jax.random.fold_in(k3, 1),
                                     (n_speakers, cfg.emb_dim))
        * (1.0 / np.sqrt(cfg.emb_dim)),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _astp(head: Dict, x: jax.Array, mask: Optional[jax.Array],
          bn_fn) -> jax.Array:
    """Global-context attentive statistics pooling (speechbrain
    AttentiveStatisticsPooling): attention over [x; mean; std] context,
    attention-weighted mean+std, BN, fc -> embedding."""
    B, T, L = x.shape
    if mask is None:
        w0 = jnp.full((B, T, 1), 1.0 / T)
    else:
        m = mask.astype(x.dtype)[..., None]
        w0 = m / jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
    mean = jnp.sum(x * w0, axis=1, keepdims=True)
    std = jnp.sqrt(jnp.clip(
        jnp.sum(x * x * w0, axis=1, keepdims=True) - mean**2, 1e-9))
    ctx = jnp.concatenate(
        [x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(std, x.shape)],
        axis=-1)
    a = jnp.tanh(ctx @ head["attn1_w"] + head["attn1_b"])
    a = a @ head["attn2_w"] + head["attn2_b"]
    if mask is not None:
        a = jnp.where(mask[..., None] > 0, a, -jnp.inf)
    a = jax.nn.softmax(a, axis=1)
    mu = jnp.sum(x * a, axis=1)
    sg = jnp.sqrt(jnp.clip(jnp.sum(x * x * a, axis=1) - mu**2, 1e-9))
    pooled = jnp.concatenate([mu, sg], axis=-1)[:, None]  # (B, 1, 2L)
    pooled = bn_fn(head["pool_bn"], pooled)[:, 0]
    return pooled @ head["fc_w"] + head["fc_b"]


def embed(params: Dict, cfg: ECAPAASVConfig, feat: jax.Array,
          mask: Optional[jax.Array] = None) -> jax.Array:
    """feat (B, T, 80) kaldi fbank -> embedding (B, emb_dim) with stored-stat
    batch norm (inference mode)."""
    lat = se.ecapa_latents(params["backbone"], feat)
    return _astp(params["head"], lat, mask, se._bn)


def _forward_train(params: Dict, cfg: ECAPAASVConfig, feat: jax.Array):
    """Training forward with batch-stat BN; returns (emb, bn_stats list in
    call order — see `_bn_paths`)."""
    stats: List[Tuple[jax.Array, jax.Array]] = []

    def bn_train(p, x, eps=1e-5):
        axes = tuple(range(x.ndim - 1))
        m = jnp.mean(x, axis=axes)
        v = jnp.var(x, axis=axes)
        stats.append((m, v))
        return (x - m) * jax.lax.rsqrt(v + eps) * p["w"] + p["b"]

    lat = se.ecapa_latents(params["backbone"], feat, bn_fn=bn_train)
    emb_out = _astp(params["head"], lat, None, bn_train)
    return emb_out, stats


def _bn_paths(cfg: ECAPAASVConfig) -> List[Tuple[str, ...]]:
    """BN leaves in the exact call order of `_forward_train`."""
    paths: List[Tuple[str, ...]] = [("backbone", "layer1_bn")]
    for layer in ("layer2", "layer3", "layer4"):
        paths.append(("backbone", layer, "bn1"))
        paths.extend(("backbone", layer, "res2", i, "bn")
                     for i in range(cfg.res2_scale - 1))
        paths.append(("backbone", layer, "bn2"))
    paths.append(("head", "pool_bn"))
    return paths


def _set_path(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node[k]
    node[path[-1]] = value


def _get_path(tree, path):
    node = tree
    for k in path:
        node = node[k]
    return node


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------


def train_ecapa_asv(
    utterances: Sequence,               # evals.anonymize.Utterance (anonymized!)
    cfg: ECAPAASVConfig = None,
    utt_sample_rate: int = 44100,
    history: Optional[list] = None,
) -> Dict:
    """AAM-softmax from random init on anonymized chunks; returns params
    {'backbone','head'} with EMA BN stats baked in for `embed`."""
    from streamvoiceanon_tpu.audio.resample import resample

    if cfg is None:
        cfg = ECAPAASVConfig()
    speakers = sorted({u.speaker for u in utterances})
    spk_index = {s: i for i, s in enumerate(speakers)}
    wavs, labels = [], []
    for u in utterances:
        w = np.asarray(
            resample(jnp.asarray(u.wav, jnp.float32)[None], utt_sample_rate,
                     cfg.sample_rate))[0]
        wavs.append(w.astype(np.float32))
        labels.append(spk_index[u.speaker])
    labels = np.asarray(labels, np.int32)

    k0, k1 = jax.random.split(jax.random.PRNGKey(cfg.seed))
    params = {"backbone": init_backbone(k0, cfg),
              "head": init_head(k1, cfg, len(speakers))}
    tx = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
    opt_state = tx.init(params)
    paths = _bn_paths(cfg)

    def loss_fn(p, wav_b, lab_b):
        f = fbank_mod.fbank(wav_b)
        f = f - jnp.mean(f, axis=1, keepdims=True)
        e, stats = _forward_train(p, cfg, f)
        loss = aam_softmax_loss(p["head"], e, lab_b, cfg.margin, cfg.scale)
        return loss, [(jax.lax.stop_gradient(m), jax.lax.stop_gradient(v))
                      for m, v in stats]

    @jax.jit
    def step(p, s, wav_b, lab_b):
        (loss, stats), g = jax.value_and_grad(loss_fn, has_aux=True)(
            p, wav_b, lab_b)
        updates, s = tx.update(g, s, p)
        return optax.apply_updates(p, updates), s, loss, stats

    rng = np.random.default_rng(cfg.seed)
    mom = cfg.bn_momentum
    for _ in range(cfg.steps):
        wav_b, lab_b = _chunk_batch(rng, wavs, labels, cfg)
        params, opt_state, loss, stats = step(
            params, opt_state, jnp.asarray(wav_b), jnp.asarray(lab_b))
        assert len(stats) == len(paths)
        for path, (m, v) in zip(paths, stats):
            bn = _get_path(params, path)
            bn["mean"] = mom * bn["mean"] + (1 - mom) * m
            bn["var"] = mom * bn["var"] + (1 - mom) * v
        if history is not None:
            history.append(float(loss))
    return params


def extract_embeddings(
    params: Dict, cfg: ECAPAASVConfig, utterances: Sequence,
    sample_rate: int = 44100, center: bool = True,
) -> np.ndarray:
    """Embeddings (B, emb_dim) for AA scoring; cohort-mean centered like
    `asv_train.extract_embeddings`."""
    from streamvoiceanon_tpu.audio.resample import resample

    out = []
    for u in utterances:
        w16 = resample(jnp.asarray(u.wav, jnp.float32)[None], sample_rate,
                       cfg.sample_rate)
        f = fbank_mod.fbank(w16)
        f = f - jnp.mean(f, axis=1, keepdims=True)
        out.append(np.asarray(embed(params, cfg, f))[0])
    embs = np.stack(out)
    if center:
        embs = embs - embs.mean(axis=0)
    return embs
