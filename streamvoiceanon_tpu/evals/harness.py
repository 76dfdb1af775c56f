"""Evaluation orchestration + results summary.

Framework equivalent of the reference `anon/run_evaluation.py` driver
(step selection :34-51, eval_pre/eval_post sequencing :106-211, results
summary :54-88) re-expressed as a typed config + pure functions: select
privacy (ASV, with optional ASV_eval^anon retraining) and utility (SER,
ASR) steps, run them over kaldi-format dataset dirs, and write the
`results_summary` text file with the same section layout.
"""

from __future__ import annotations

import dataclasses
from datetime import datetime
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class ASVStep:
    """Privacy step config (run_evaluation.py:106-152)."""

    enrolls: Sequence[str]          # kaldi dir names (original); _anon suffixed
    trials: Sequence[str]
    train_asv_on_anon: bool = False  # eval_post: retrain ASV on anonymized data
    train_dirs: Sequence[str] = ()   # kaldi dirs for retraining (e.g. libri-360_anon)
    distance: str = "cosine"         # 'cosine' | 'plda'
    # ASV_eval^anon attacker family (asv_train/train_speaker_embeddings.py
    # hparams): 'campplus' fine-tunes the pretrained CAMPPlus head;
    # 'ecapa' trains an ECAPA-TDNN from random init (the VPC protocol).
    anon_backbone: str = "campplus"  # 'campplus' | 'ecapa'
    ecapa_cfg: Optional[object] = None  # evals.ecapa_asv.ECAPAASVConfig override
    campplus_cfg: Optional[object] = None  # evals.asv_train.ASVTrainConfig override


@dataclasses.dataclass
class SERStep:
    datasets: Sequence[str]
    emotions: Sequence[str] = ("neu", "hap", "sad", "ang")


@dataclasses.dataclass
class ASRStep:
    datasets: Sequence[str]


@dataclasses.dataclass
class EvalConfig:
    data_dir: Path
    results_dir: Path
    anon_data_suffix: str = "_anon"
    asv: Optional[ASVStep] = None
    ser: Optional[SERStep] = None
    asr: Optional[ASRStep] = None
    sample_rate: int = 44100


def _load(data_dir: Path, name: str, sample_rate: int):
    from streamvoiceanon_tpu.evals.anonymize import load_kaldi_dir

    return load_kaldi_dir(str(Path(data_dir) / name), sample_rate=sample_rate)


def run_asv_step(
    cfg: EvalConfig, step: ASVStep, campplus_params, cp_cfg,
):
    """OO/OA/AA EER table over each (enroll, trial) pair; with
    `train_asv_on_anon`, the AA condition is additionally scored with an
    ASV model retrained on anonymized data (ASV_eval^anon, eval_post)."""
    import pandas as pd

    from streamvoiceanon_tpu.evals import asv_train as at
    from streamvoiceanon_tpu.evals.anonymize import asv_scenarios
    from streamvoiceanon_tpu.evals import privacy_metrics as pm

    rows: List[Dict] = []
    trained = None
    ecapa_model = None
    ecapa_cfg = None
    if step.train_asv_on_anon and step.train_dirs:
        train_utts = []
        for d in step.train_dirs:
            train_utts.extend(_load(cfg.data_dir, d, cfg.sample_rate))
        if step.anon_backbone == "ecapa":
            from streamvoiceanon_tpu.evals import ecapa_asv as ea

            ecapa_cfg = step.ecapa_cfg or ea.ECAPAASVConfig()
            ecapa_model = ea.train_ecapa_asv(train_utts, ecapa_cfg,
                                             utt_sample_rate=cfg.sample_rate)
        else:
            at_cfg = step.campplus_cfg or at.ASVTrainConfig()
            trained = at.train_asv_eval(campplus_params, cp_cfg, train_utts,
                                        at_cfg,
                                        utt_sample_rate=cfg.sample_rate)

    dir_cache: Dict[str, list] = {}
    emb_cache: Dict = {}

    def load_cached(name: str):
        if name not in dir_cache:
            dir_cache[name] = _load(cfg.data_dir, name, cfg.sample_rate)
        return dir_cache[name]

    for enroll_name in step.enrolls:
        for trial_name in step.trials:
            enroll = load_cached(enroll_name)
            trial = load_cached(trial_name)
            enroll_anon = load_cached(enroll_name + cfg.anon_data_suffix)
            trial_anon = load_cached(trial_name + cfg.anon_data_suffix)
            res = asv_scenarios(enroll, trial, trial_anon, campplus_params,
                                cp_cfg, enroll_anon=enroll_anon,
                                distance=step.distance, emb_cache=emb_cache,
                                sample_rate=cfg.sample_rate)
            cond_names = {"OO": ("original", "original"),
                          "OA": ("original", "anon"),
                          "AA": ("anon", "anon")}
            for cond, metrics in res.items():
                e_kind, t_kind = cond_names[cond]
                rows.append({
                    "dataset": trial_name.split("_")[0],
                    "split": "_".join(trial_name.split("_")[1:]) or "_",
                    "enrollment": e_kind, "trial": t_kind,
                    "EER": round(100.0 * metrics["eer"], 3),
                    "cllr_min": round(metrics["cllr_min"], 4),
                    "linkability": round(metrics["linkability"], 4),
                    "model": "ASV_eval",
                })
            if trained is not None or ecapa_model is not None:
                if ecapa_model is not None:
                    from streamvoiceanon_tpu.evals import ecapa_asv as ea

                    e_emb = ea.extract_embeddings(
                        ecapa_model, ecapa_cfg, enroll_anon,
                        sample_rate=cfg.sample_rate)
                    t_emb = ea.extract_embeddings(
                        ecapa_model, ecapa_cfg, trial_anon,
                        sample_rate=cfg.sample_rate)
                else:
                    e_emb = at.extract_embeddings(trained, cp_cfg, enroll_anon,
                                                  sample_rate=cfg.sample_rate)
                    t_emb = at.extract_embeddings(trained, cp_cfg, trial_anon,
                                                  sample_rate=cfg.sample_rate)
                labels_e = np.asarray([u.speaker for u in enroll_anon])
                labels_t = np.asarray([u.speaker for u in trial_anon])
                if step.distance == "plda":
                    from streamvoiceanon_tpu.evals.plda import train_plda

                    s = train_plda(e_emb, labels_e).score(e_emb, t_emb)
                else:
                    s = pm.cosine_scores(e_emb, t_emb)
                same = labels_e[:, None] == labels_t[None, :]
                tar, non = s[same], s[~same]
                rows.append({
                    "dataset": trial_name.split("_")[0],
                    "split": "_".join(trial_name.split("_")[1:]) or "_",
                    "enrollment": "anon", "trial": "anon",
                    "EER": round(100.0 * pm.eer(tar, non)[0], 3),
                    "cllr_min": round(pm.min_cllr(tar, non), 4),
                    "linkability": round(pm.linkability(tar, non), 4),
                    "model": "ASV_eval_anon",
                    "backbone": step.anon_backbone,
                })
    df = pd.DataFrame(rows)
    out = Path(cfg.results_dir)
    out.mkdir(parents=True, exist_ok=True)
    df.to_csv(out / f"asv_results{cfg.anon_data_suffix}.csv")
    return df


def run_evaluation(
    cfg: EvalConfig,
    campplus_params=None,
    cp_cfg=None,
    transcriber: Optional[Callable] = None,
    ser_classifiers=None,
    ser_embed_fn=None,
) -> Dict:
    """Runs the selected steps and writes the results summary
    (run_evaluation.py:213-216).  Returns {'asv': df, 'ser': df, 'asr': df}
    for whichever steps were configured."""
    results: Dict = {}
    errors: List[BaseException] = []

    def step(name, fn):
        # a failing step must not lose the completed steps' summary
        try:
            results[name] = fn()
        except Exception as e:  # noqa: BLE001 — re-raised after the summary
            errors.append(e)

    if cfg.asv is not None:
        step("asv", lambda: run_asv_step(cfg, cfg.asv, campplus_params, cp_cfg))
    if cfg.ser is not None:
        from streamvoiceanon_tpu.evals.ser import (
            SERHeadConfig,
            campplus_embed_fn,
            evaluate_ser,
            train_fold_classifiers,
        )

        if ser_embed_fn is None:
            ser_embed_fn = campplus_embed_fn(campplus_params, cp_cfg)

        def fit_fold_heads(dataset: str):
            # leave-fold-out heads fit on that dataset's ORIGINAL data (the
            # reference ships pretrained fold checkpoints; here in place)
            import jax as _jax

            from streamvoiceanon_tpu.audio.io import read_wav
            from streamvoiceanon_tpu.evals.kaldi import read_kaldi_format

            d = Path(cfg.data_dir) / dataset
            scp = read_kaldi_format(d / "wav.scp")
            utt2spk = read_kaldi_format(d / "utt2spk")
            utt2emo = read_kaldi_format(d / "utt2emo")
            spk2fold = read_kaldi_format(d / "spk2fold")
            embs = {}
            for u, p in scp.items():
                wav, sr = read_wav(p)
                embs[u] = ser_embed_fn(np.asarray(wav), sr)
            head_cfg = SERHeadConfig(
                emb_dim=next(iter(embs.values())).shape[-1],
                n_classes=len(cfg.ser.emotions),
            )
            return train_fold_classifiers(
                _jax.random.PRNGKey(0), head_cfg, embs, utt2emo, utt2spk,
                spk2fold, list(cfg.ser.emotions),
            )

        def run_ser():
            # fold protocols are per-dataset: heads supplied by the caller
            # apply to every set; otherwise each dataset gets its own fit
            import pandas as pd

            frames = []
            for ds in cfg.ser.datasets:
                clfs = (ser_classifiers if ser_classifiers is not None
                        else fit_fold_heads(ds))
                frames.append(
                    evaluate_ser(
                        [ds], Path(cfg.data_dir), clfs,
                        embed_fn=ser_embed_fn, emotions=list(cfg.ser.emotions),
                        results_dir=Path(cfg.results_dir) / "ser" / ds,
                        anon_data_suffix=cfg.anon_data_suffix,
                    )
                )
            return pd.concat(frames, ignore_index=True)

        step("ser", run_ser)
    if cfg.asr is not None:
        from streamvoiceanon_tpu.evals.wer import evaluate_asr

        step("asr", lambda: evaluate_asr(
            list(cfg.asr.datasets), Path(cfg.data_dir), transcriber,
            results_dir=Path(cfg.results_dir) / "asr",
            anon_data_suffix=cfg.anon_data_suffix,
        ))
    if results:
        save_result_summary(
            Path(cfg.results_dir) / "results_summary.txt", results
        )
    if errors:
        raise errors[0]
    return results


def make_submission(
    summary_paths: Sequence[Path],
    results_dir: Path,
    out_zip: Path,
    anon_data_suffix: str = "_anon",
) -> Path:
    """Merges result summaries and zips the per-metric artifacts — the
    02_run.sh:40-50 'Merge results' step: `result_for_rank` = concatenated
    summaries, plus every results CSV / summary under `results_dir` that
    carries the anon suffix."""
    import zipfile

    out_zip = Path(out_zip)
    out_zip.parent.mkdir(parents=True, exist_ok=True)
    rank_file = out_zip.parent / f"result_for_rank{anon_data_suffix}"
    with open(rank_file, "w") as f:
        for i, p in enumerate(summary_paths):
            if i:
                f.write("\n")
            f.write(Path(p).read_text())

    results_dir = Path(results_dir)
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as z:
        z.write(rank_file, rank_file.name)
        for p in sorted(results_dir.rglob("*")):
            if p.is_file() and (anon_data_suffix in p.name
                                or p.name == "results_summary.txt"):
                z.write(p, p.relative_to(results_dir.parent))
    return out_zip


def save_result_summary(out_path: Path, results: Dict) -> None:
    """Text summary with the reference's section layout
    (run_evaluation.py:54-88)."""
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "w") as f:
        f.write(f"---- Time: {datetime.today().strftime('%d-%m-%y_%H:%M')} ----\n")
        f.write(
            "NOTE: metrics are comparable across systems evaluated under this\n"
            "harness.  They are only comparable to published VPC2024 numbers\n"
            "when the evaluation models (ASV_eval / ASR_eval) are loaded from\n"
            "the published checkpoints rather than trained in-framework.\n"
        )
        if "ser" in results:
            f.write("\n---- SER results ----\n")
            f.write(results["ser"].sort_values(by=["dataset", "split"]).to_string())
            f.write("\n")
        if "asv" in results:
            df = results["asv"]
            f.write("\n---- ASV_eval results ----\n")
            f.write(
                df[df["model"] == "ASV_eval"]
                .sort_values(by=["dataset", "split"]).to_string()
            )
            f.write("\n")
            anon = df[df["model"] == "ASV_eval_anon"]
            if len(anon):
                f.write("\n---- ASV_eval^anon results ----\n")
                f.write(anon.sort_values(by=["dataset", "split"]).to_string())
                f.write("\n")
        if "asr" in results:
            f.write("\n---- ASR results ----\n")
            f.write(results["asr"].sort_values(by=["dataset", "split"]).to_string())
            f.write("\n")
