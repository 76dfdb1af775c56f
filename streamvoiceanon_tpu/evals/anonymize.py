"""Anonymization pipeline + privacy evaluation orchestration.

The framework-side equivalent of the reference `anon/` harness core
(run_anonymization.py:33-60 + evaluate_asv, SURVEY.md §2.3): convert every
utterance of a dataset against target-speaker references with noise-mixed
embeddings, then score speaker verification EER (OO / OA / AA attack
scenarios) with the framework's own CAMPPlus embeddings, plus
Cllr/linkability/ZEBRA.

Dataset format: a list of (utt_id, speaker_id, wav) records — adapters for
kaldi-style wav.scp/utt2spk directories included (anon/utils/data_io.py
equivalent)."""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from streamvoiceanon_tpu.audio import fbank as fbank_mod
from streamvoiceanon_tpu.audio.io import read_wav
from streamvoiceanon_tpu.audio.resample import resample
from streamvoiceanon_tpu.evals import privacy_metrics as pm
from streamvoiceanon_tpu.models import campplus


@dataclasses.dataclass
class Utterance:
    utt_id: str
    speaker: str
    wav: np.ndarray  # @ pipeline sample rate


def load_kaldi_dir(path: str, sample_rate: int = 44100) -> List[Utterance]:
    """Reads wav.scp + utt2spk (kaldi layout, anon/utils/data_io.py:14-43)."""
    from streamvoiceanon_tpu.evals.kaldi import read_kaldi_format

    scp = read_kaldi_format(os.path.join(path, "wav.scp"))
    out = []
    for utt, spk in read_kaldi_format(os.path.join(path, "utt2spk")).items():
        wav, _ = read_wav(scp[utt], target_sr=sample_rate)
        out.append(Utterance(utt, spk, wav))
    return out


def anonymize_dataset(
    converter,
    utterances: Sequence[Utterance],
    target_refs: Sequence[np.ndarray],
    *,
    alpha: float = 0.7,
    delay: int = 2,
    seed: int = 0,
    per_speaker_targets: bool = True,
) -> List[Utterance]:
    """Converts each utterance to the target speaker(s) with noise mixing.

    With `per_speaker_targets`, each source speaker is deterministically
    assigned one target reference (consistent pseudo-speaker per speaker,
    the VPC-style anonymization policy)."""
    rng = np.random.default_rng(seed)
    speakers = sorted({u.speaker for u in utterances})
    spk_target = {
        s: target_refs[rng.integers(len(target_refs))] if per_speaker_targets else None
        for s in speakers
    }
    out = []
    spk_index = {s: i for i, s in enumerate(speakers)}
    base_key = jax.random.PRNGKey(seed)
    for u in utterances:
        ref = spk_target[u.speaker] if per_speaker_targets else target_refs[
            rng.integers(len(target_refs))
        ]
        # deterministic per-speaker key (str hash() is process-salted)
        key = jax.random.fold_in(base_key, spk_index[u.speaker])
        wav = converter.infer(u.wav, [ref], delay=delay, alpha=alpha, key=key)
        out.append(Utterance(u.utt_id, u.speaker, np.asarray(wav)))
    return out


def anonymize_kaldi_dir(
    converter,
    data_dir: str,
    out_dir: str,
    target_refs: Sequence[np.ndarray],
    *,
    alpha: float = 0.7,
    delay: int = 2,
    seed: int = 0,
    sample_rate: int = 44100,
) -> None:
    """Anonymizes a kaldi-format dataset dir into `<out_dir>` (the
    run_anonymization.py pipeline step): converts every wav, writes
    `<utt_id>.wav` files plus wav.scp/utt2spk, and copies any side tables
    (text, utt2emo, spk2fold, spk2gender) verbatim."""
    import shutil

    from streamvoiceanon_tpu.audio.io import write_wav
    from streamvoiceanon_tpu.evals.kaldi import save_kaldi_format

    utts = load_kaldi_dir(data_dir, sample_rate=sample_rate)
    anon = anonymize_dataset(
        converter, utts, target_refs, alpha=alpha, delay=delay, seed=seed
    )
    os.makedirs(out_dir, exist_ok=True)
    wav_dir = os.path.join(out_dir, "wav")
    os.makedirs(wav_dir, exist_ok=True)
    scp, u2s = {}, {}
    for u in anon:
        path = os.path.join(wav_dir, f"{u.utt_id}.wav")
        write_wav(path, u.wav, sample_rate)
        scp[u.utt_id] = path
        u2s[u.utt_id] = u.speaker
    save_kaldi_format(scp, os.path.join(out_dir, "wav.scp"))
    save_kaldi_format(u2s, os.path.join(out_dir, "utt2spk"))
    for side in ("text", "utt2emo", "spk2fold", "spk2gender"):
        src = os.path.join(data_dir, side)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(out_dir, side))


def speaker_embeddings(
    campplus_params, cfg, utterances: Sequence[Utterance], sample_rate: int = 44100
) -> np.ndarray:
    """CAMPPlus embeddings (B, 192) for scoring."""
    embs = []
    for u in utterances:
        w16 = resample(jnp.asarray(u.wav)[None], sample_rate, 16000)
        feat = fbank_mod.fbank(w16)
        feat = feat - jnp.mean(feat, axis=1, keepdims=True)
        lens = jnp.full((1,), feat.shape[1] // 2, jnp.int32)
        embs.append(np.asarray(campplus.apply(campplus_params, cfg, feat, lens))[0])
    return np.stack(embs)


def asv_scenarios(
    enroll_orig: Sequence[Utterance],
    trial_orig: Sequence[Utterance],
    trial_anon: Sequence[Utterance],
    campplus_params,
    cfg,
    enroll_anon: Optional[Sequence[Utterance]] = None,
    distance: str = "cosine",
    emb_cache: Optional[Dict[int, Tuple[np.ndarray, np.ndarray]]] = None,
    sample_rate: int = 44100,
) -> Dict[str, Dict[str, float]]:
    """EER + Cllr + linkability for the VPC attack scenarios
    (evaluate_asv.py:26-46):
      OO: original enroll vs original trials (baseline)
      OA: original enroll vs anonymized trials (ignorant attacker)
      AA: anonymized enroll vs anonymized trials (informed attacker)
    `distance` selects the scoring backend: 'cosine' or 'plda' (two-covariance
    PLDA trained per scenario on the enrollment cohort, asv.py backends).
    """
    def emb_and_labels(utts):
        # labels travel WITH each cohort: no cross-dir ordering assumption.
        # emb_cache (keyed by cohort object identity) lets a caller scoring
        # many (enroll, trial) pairs embed each cohort once.
        if emb_cache is not None and id(utts) in emb_cache:
            return emb_cache[id(utts)]
        out = (
            speaker_embeddings(campplus_params, cfg, utts, sample_rate=sample_rate),
            np.asarray([u.speaker for u in utts]),
        )
        if emb_cache is not None:
            emb_cache[id(utts)] = out
        return out

    e_o = emb_and_labels(enroll_orig)
    t_o = emb_and_labels(trial_orig)
    t_a = emb_and_labels(trial_anon)

    def scores(e, t):
        (e_emb, e_lab), (t_emb, t_lab) = e, t
        if distance == "plda":
            from streamvoiceanon_tpu.evals.plda import train_plda

            s = train_plda(e_emb, e_lab).score(e_emb, t_emb)
        else:
            s = pm.cosine_scores(e_emb, t_emb)
        same = e_lab[:, None] == t_lab[None, :]
        return s[same], s[~same]

    out = {}
    pairs = {"OO": (e_o, t_o), "OA": (e_o, t_a)}
    if enroll_anon is not None:
        pairs["AA"] = (emb_and_labels(enroll_anon), t_a)
    for name, (e, t) in pairs.items():
        tar, non = scores(e, t)
        dece, max_llr, tag = pm.zebra(tar, non)
        out[name] = {
            "eer": pm.eer(tar, non)[0],
            "cllr_min": pm.min_cllr(tar, non),
            "linkability": pm.linkability(tar, non),
            "zebra_dece": dece,
            "zebra_max_llr": max_llr,
        }
    return out
