"""Speech-emotion-recognition utility evaluation (IEMOCAP-style).

Framework equivalent of the reference SER eval
(`anon/evaluation/utility/ser/evaluate_ser.py:36-99`): fold-wise
classification of each speaker's utterances with the classifier trained on
the complementary folds, scored as UAR (unweighted average recall = macro
recall * 100) plus per-emotion accuracy, over original and anonymized
copies of each dataset; results as pandas tables + CSVs.

The reference loads pretrained speechbrain wav2vec2 classifiers; here the
classifier is a small trainable JAX head over a pluggable embedding
(default: the framework's CAMPPlus speaker embedding, whose front half is a
generic utterance encoder), so the whole loop — train fold models, evaluate
fold-wise — runs natively on TPU with no external checkpoints.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Callable, Dict, Mapping, Sequence

import numpy as np

import jax
import jax.numpy as jnp
import optax


# ---------------------------------------------------------------------------
# Metrics (evaluate_ser.py:77-81)
# ---------------------------------------------------------------------------


def uar(y_true: Sequence[int], y_pred: Sequence[int]) -> float:
    """Unweighted average recall in percent (macro recall * 100)."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    recalls = []
    for c in np.unique(y_true):
        mask = y_true == c
        recalls.append(float(np.mean(y_pred[mask] == c)))
    return round(100.0 * float(np.mean(recalls)), 3)


def accuracy(y_true: Sequence[int], y_pred: Sequence[int]) -> float:
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    return round(100.0 * float(np.mean(y_true == y_pred)), 3) if len(y_true) else 0.0


# ---------------------------------------------------------------------------
# Native emotion-classifier head
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SERHeadConfig:
    emb_dim: int = 192
    hidden: int = 128
    n_classes: int = 4
    lr: float = 1e-3
    steps: int = 300
    weight_decay: float = 1e-4


def init_head(key, cfg: SERHeadConfig) -> Dict:
    k1, k2 = jax.random.split(key)
    s1 = 1.0 / np.sqrt(cfg.emb_dim)
    s2 = 1.0 / np.sqrt(cfg.hidden)
    return {
        "w1": jax.random.normal(k1, (cfg.emb_dim, cfg.hidden), jnp.float32) * s1,
        "b1": jnp.zeros((cfg.hidden,), jnp.float32),
        "w2": jax.random.normal(k2, (cfg.hidden, cfg.n_classes), jnp.float32) * s2,
        "b2": jnp.zeros((cfg.n_classes,), jnp.float32),
    }


def head_logits(params: Dict, emb: jax.Array) -> jax.Array:
    h = jnp.tanh(emb @ params["w1"] + params["b1"])
    return h @ params["w2"] + params["b2"]


def train_head(
    key, cfg: SERHeadConfig, embs: np.ndarray, labels: np.ndarray
) -> Dict:
    """Full-batch Adam training of the head (fold models are tiny)."""
    params = init_head(key, cfg)
    tx = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
    opt_state = tx.init(params)
    x = jnp.asarray(embs, jnp.float32)
    y = jnp.asarray(labels, jnp.int32)

    def loss_fn(p):
        logits = head_logits(p, x)
        return jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(logits, y)
        )

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(g, s, p)
        return optax.apply_updates(p, updates), s, loss

    for _ in range(cfg.steps):
        params, opt_state, _ = step(params, opt_state)
    return jax.tree.map(np.asarray, params)


def classify(params: Dict, embs: np.ndarray) -> np.ndarray:
    return np.asarray(jnp.argmax(head_logits(params, jnp.asarray(embs)), axis=-1))


def campplus_embed_fn(campplus_params, cp_cfg) -> Callable[[np.ndarray, int], np.ndarray]:
    """Default embedding for SER: the CAMPPlus utterance vector (its D-TDNN
    front half is a generic utterance encoder)."""
    from streamvoiceanon_tpu.audio import fbank as fbank_mod

    def embed(wav: np.ndarray, sr: int) -> np.ndarray:
        from streamvoiceanon_tpu.audio.resample import resample
        from streamvoiceanon_tpu.models import campplus

        w16 = resample(jnp.asarray(wav, jnp.float32)[None], sr, 16000)
        f = fbank_mod.fbank(w16)
        f = f - jnp.mean(f, axis=1, keepdims=True)
        lens = jnp.full((1,), f.shape[1] // 2, jnp.int32)
        return np.asarray(campplus.apply(
            jax.tree.map(jnp.asarray, campplus_params), cp_cfg, f, lens))[0]

    return embed


# ---------------------------------------------------------------------------
# Fold-wise dataset evaluation (evaluate_ser.py:36-99)
# ---------------------------------------------------------------------------


def train_fold_classifiers(
    key,
    cfg: SERHeadConfig,
    embs: Mapping[str, np.ndarray],
    utt2emo: Mapping[str, str],
    utt2spk: Mapping[str, str],
    spk2fold: Mapping[str, str],
    emotions: Sequence[str],
) -> Dict[str, Dict]:
    """Leave-fold-out training: the classifier for fold f is trained on all
    utterances whose speaker is NOT in fold f (the standard IEMOCAP
    session-fold protocol behind the reference's per-fold checkpoints)."""
    emo_index = {e: i for i, e in enumerate(emotions)}
    folds = sorted(set(spk2fold.values()))
    out = {}
    for i, fold in enumerate(folds):
        ids = [
            u for u in embs
            if spk2fold[utt2spk[u]] != fold and utt2emo[u] in emo_index
        ]
        x = np.stack([embs[u] for u in ids])
        y = np.asarray([emo_index[utt2emo[u]] for u in ids])
        out[fold] = train_head(jax.random.fold_in(key, i), cfg, x, y)
    return out


def evaluate_ser(
    eval_datasets: Sequence[str],
    eval_data_dir: Path,
    classifiers: Mapping[str, Dict],
    embed_fn: Callable[[np.ndarray, int], np.ndarray],
    emotions: Sequence[str],
    results_dir: Path,
    anon_data_suffix: str = "_anon",
    sample_rate: int = 16000,
):
    """UAR per (test_set, fold) + per-emotion accuracy, mirroring
    evaluate_ser.py:42-99: each speaker's utterances are scored by the
    classifier of that speaker's fold; results DataFrame rows carry
    dataset / split / fold / original-vs-anon / UAR / ACC_<emotion>."""
    import pandas as pd

    from streamvoiceanon_tpu.audio.io import read_wav
    from streamvoiceanon_tpu.evals.kaldi import read_kaldi_format

    eval_data_dir = Path(eval_data_dir)
    results_dir = Path(results_dir)
    emo_index = {e: i for i, e in enumerate(emotions)}
    test_sets = list(eval_datasets) + [f"{d}{anon_data_suffix}" for d in eval_datasets]
    rows = []
    for test_set in test_sets:
        data_path = eval_data_dir / test_set
        scp = read_kaldi_format(data_path / "wav.scp")
        utt2spk = read_kaldi_format(data_path / "utt2spk")
        utt2emo = read_kaldi_format(data_path / "utt2emo")
        spk2fold = read_kaldi_format(data_path / "spk2fold")
        embs = {}
        for utt_id, wav_path in scp.items():
            wav, _sr = read_wav(wav_path, target_sr=sample_rate)
            embs[utt_id] = np.asarray(embed_fn(np.asarray(wav), sample_rate))
        for spk, fold in sorted(spk2fold.items()):
            ids = [u for u in scp if utt2spk[u] == spk and utt2emo[u] in emo_index]
            if not ids:
                continue
            pred = classify(classifiers[fold], np.stack([embs[u] for u in ids]))
            ref = np.asarray([emo_index[utt2emo[u]] for u in ids])
            per_emo = {
                f"ACC_{e}": accuracy(ref[ref == emo_index[e]], pred[ref == emo_index[e]])
                for e in emotions
                if np.any(ref == emo_index[e])
            }
            info = test_set.split("_")
            rows.append(
                {
                    "dataset": info[0],
                    "split": info[1] if len(info) > 1 else "_",
                    "fold": fold,
                    "ser": "anon" if anon_data_suffix in test_set else "original",
                    "UAR": uar(ref, pred),
                    **per_emo,
                }
            )
    df = pd.DataFrame(rows)
    acc_cols = [c for c in df.columns if c.startswith("ACC_")]
    mean = df.groupby(["dataset", "split", "ser"]).agg(
        {"UAR": "mean", **{c: "mean" for c in acc_cols}}
    )
    mean.reset_index(inplace=True)
    results_dir.mkdir(parents=True, exist_ok=True)
    df.to_csv(results_dir / f"results_folds{anon_data_suffix}.csv")
    mean.to_csv(results_dir / f"results{anon_data_suffix}.csv")
    return mean
