"""ASR_eval^w2v: VPC-grade utility-evaluation recognizer on the native
w2v-BERT conformer.

The reference's utility-WER attacker is a speechbrain EncoderASR /
EncoderDecoderASR — a wav2vec2-family encoder with a CTC head, fine-tuned on
(anonymized) LibriSpeech (`anon/evaluation/utility/asr/speechbrain_asr/
inference.py:16-68`, `speechbrain_asr/asr_train/train.py:82-137` — joint
CTC+NLL on a transformer encoder).  This module is the framework-native
equivalent: the same conformer backbone as the distillation teacher
(`models/w2v_bert_native.py`, Wav2Vec2-BERT architecture) with a char-CTC
head, trained in JAX with static shapes.

Two operating points:
* sandbox / tests: `W2VASRConfig.tiny()` geometry trained from random init
  (`w2v_bert_native.init_params`) on the synthetic eval fixtures;
* production: `from_hf_encoder(state_dict)` plugs real published w2v-BERT
  weights into the encoder (the head is always trained on the eval data),
  giving an attacker comparable to the VPC2024 protocol's.

The char-CTC vocab/decode utilities are shared with the compact recognizer
(`evals/asr_eval_train.py`), and the returned transcriber plugs into
`evals.wer.evaluate_asr` unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from streamvoiceanon_tpu.evals.asr_eval_train import (
    BLANK,
    build_vocab,
    encode_text,
    greedy_ctc_decode,
)
from streamvoiceanon_tpu.models import w2v_bert_native as w2v


@dataclasses.dataclass
class W2VASRConfig:
    encoder: w2v.W2VBertConfig = dataclasses.field(
        default_factory=lambda: w2v.W2VBertConfig(
            hidden=144, n_layers=2, n_heads=4, intermediate=288, conv_kernel=15
        )
    )
    steps: int = 300
    batch_size: int = 8
    lr: float = 1e-3
    encoder_lr_scale: float = 1.0  # <1 when fine-tuning pretrained weights
    max_frames: int = 256          # padded 50 Hz stacked-feature frames
    max_label_len: int = 128
    sample_rate: int = 16000
    seed: int = 0

    @staticmethod
    def full() -> "W2VASRConfig":
        """Published w2v-BERT 2.0 geometry (conformer 24L/1024d)."""
        return W2VASRConfig(encoder=w2v.W2VBertConfig(),
                            encoder_lr_scale=0.05, lr=3e-4)


def init_asr_params(key, cfg: W2VASRConfig, vocab_size: int,
                    encoder_params: Optional[Dict] = None) -> Dict:
    """Encoder (random or pretrained) + fresh CTC head (vocab + blank)."""
    k_enc, k_head = jax.random.split(key)
    enc = encoder_params if encoder_params is not None else w2v.init_params(
        k_enc, cfg.encoder)
    H = cfg.encoder.hidden
    return {
        "encoder": enc,
        "ctc": {
            "w": jax.random.normal(k_head, (H, vocab_size + 1), jnp.float32)
            * np.sqrt(2.0 / H),
            "b": jnp.zeros((vocab_size + 1,), jnp.float32),
        },
    }


def from_hf_encoder(state_dict: Dict, key, cfg: W2VASRConfig,
                    vocab_size: int) -> Dict:
    """Real Wav2Vec2BertModel weights -> eval-ASR params (fresh head)."""
    enc = w2v.convert(state_dict, cfg.encoder)
    return init_asr_params(key, cfg, vocab_size, encoder_params=enc)


def forward(params: Dict, cfg: W2VASRConfig, feats: jax.Array,
            mask: jax.Array) -> jax.Array:
    """feats (B, T, 160), mask (B, T) -> CTC logits (B, T, V+1)."""
    h = w2v.apply(params["encoder"], cfg.encoder, feats, mask)
    return h @ params["ctc"]["w"] + params["ctc"]["b"]


def _feature_batch(wavs, cfg: W2VASRConfig, max_frames: int):
    """Padded stacked-fbank batch via the teacher featurization (50 Hz)."""
    B = len(wavs)
    out = np.zeros((B, max_frames, cfg.encoder.feat_dim), np.float32)
    mask = np.zeros((B, max_frames), np.int32)
    for i, w in enumerate(wavs):
        f, m = w2v.stacked_features(jnp.asarray(w, jnp.float32)[None])
        f, m = np.asarray(f)[0], np.asarray(m)[0]
        n = min(int(m.sum()), max_frames)
        out[i, :n] = f[:n]
        mask[i, :n] = 1
    return out, mask


def train_asr_eval_w2v(
    utterances: Sequence,            # evals.anonymize.Utterance
    texts: Dict[str, str],           # utt_id -> transcript
    cfg: W2VASRConfig = None,
    utt_sample_rate: int = 16000,
    encoder_params: Optional[Dict] = None,
    history: list | None = None,
) -> Tuple[Dict, Dict[str, int]]:
    """Trains the conformer CTC eval recognizer; returns (params, vocab).
    `encoder_params` (e.g. from `w2v.convert`) switches to fine-tuning with
    `encoder_lr_scale` on the backbone."""
    from streamvoiceanon_tpu.audio.resample import resample

    if cfg is None:
        cfg = W2VASRConfig()
    vocab = build_vocab([texts[u.utt_id] for u in utterances])
    wavs, labels = [], []
    for u in utterances:
        w = np.asarray(
            resample(jnp.asarray(u.wav, jnp.float32)[None], utt_sample_rate,
                     cfg.sample_rate)
        )[0]
        wavs.append(w)
        labels.append(encode_text(texts[u.utt_id], vocab))

    params = init_asr_params(jax.random.PRNGKey(cfg.seed), cfg, len(vocab),
                             encoder_params=encoder_params)

    lab = np.zeros((len(labels), cfg.max_label_len), np.int32)
    lab_pad = np.ones((len(labels), cfg.max_label_len), np.float32)
    for i, l in enumerate(labels):
        n = min(len(l), cfg.max_label_len)
        lab[i, :n] = l[:n]
        lab_pad[i, :n] = 0.0
    feats, masks = _feature_batch(wavs, cfg, cfg.max_frames)

    tx = optax.multi_transform(
        {
            "enc": optax.adamw(cfg.lr * cfg.encoder_lr_scale,
                               weight_decay=1e-5),
            "head": optax.adamw(cfg.lr, weight_decay=1e-5),
        },
        param_labels={"encoder": jax.tree.map(lambda _: "enc",
                                              params["encoder"]),
                      "ctc": jax.tree.map(lambda _: "head", params["ctc"])},
    )
    opt_state = tx.init(params)

    def loss_fn(p, f, m, y, ypad):
        logits = forward(p, cfg, f, m)
        logit_pad = 1.0 - m.astype(jnp.float32)
        per = optax.ctc_loss(logits, logit_pad, y, ypad, blank_id=BLANK)
        label_lens = jnp.maximum(jnp.sum(1.0 - ypad, axis=-1), 1.0)
        return jnp.mean(per / label_lens)

    @jax.jit
    def step(p, s, f, m, y, ypad):
        loss, g = jax.value_and_grad(loss_fn)(p, f, m, y, ypad)
        updates, s = tx.update(g, s, p)
        return optax.apply_updates(p, updates), s, loss

    rng = np.random.default_rng(cfg.seed)
    n = len(wavs)
    for _ in range(cfg.steps):
        idx = rng.integers(n, size=min(cfg.batch_size, n))
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(feats[idx]), jnp.asarray(masks[idx]),
            jnp.asarray(lab[idx]), jnp.asarray(lab_pad[idx]),
        )
        if history is not None:
            history.append(float(loss))
    return params, vocab


def make_transcriber_w2v(params: Dict, vocab: Dict[str, int],
                         cfg: W2VASRConfig = None) -> Callable:
    """Returns `transcriber(wav, sr) -> text` for evals.wer.evaluate_asr."""
    from streamvoiceanon_tpu.audio.resample import resample

    if cfg is None:
        cfg = W2VASRConfig()
    fwd = jax.jit(lambda p, f, m: forward(p, cfg, f, m))

    def transcriber(wav: np.ndarray, sr: int) -> str:
        w = np.asarray(
            resample(jnp.asarray(wav, jnp.float32)[None], sr, cfg.sample_rate)
        )[0]
        # 64-frame (1.28 s) buckets: few compile variants, no truncation
        n_frames = max(len(w) // 320, 1)
        bucket = int(np.ceil(n_frames / 64)) * 64
        feats, mask = _feature_batch([w], cfg, bucket)
        logits = fwd(params, jnp.asarray(feats), jnp.asarray(mask))
        return greedy_ctc_decode(np.asarray(logits)[0],
                                 np.asarray(mask)[0].astype(bool), vocab)

    return transcriber
