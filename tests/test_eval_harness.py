"""Eval-harness tests: kaldi IO, WER scoring + ASR driver, fold-wise SER,
ASV_eval^anon training, and the anonymize -> ASV-scenarios e2e loop
(reference anon/ harness, SURVEY.md §2.3)."""

import numpy as np
import pytest

from streamvoiceanon_tpu.evals.kaldi import (
    combine_asr_data,
    read_kaldi_format,
    save_kaldi_format,
)
from streamvoiceanon_tpu.evals.wer import ErrorRateStats, align_tokens, compute_wer


# ---------------------------------------------------------------------------
# kaldi IO
# ---------------------------------------------------------------------------


def test_kaldi_roundtrip_and_combine(tmp_path):
    data = {"utt2": "spk b", "utt1": "spk a"}
    save_kaldi_format(data, tmp_path / "d1" / "text")
    back = read_kaldi_format(tmp_path / "d1" / "text")
    assert back == data
    # sorted on disk
    lines = (tmp_path / "d1" / "text").read_text().splitlines()
    assert lines[0].startswith("utt1")

    save_kaldi_format({"utt3": "c"}, tmp_path / "d2" / "text")
    save_kaldi_format({"utt1": "spkX", "utt2": "spkX"}, tmp_path / "d1" / "utt2spk")
    save_kaldi_format({"utt3": "spkY"}, tmp_path / "d2" / "utt2spk")
    combine_asr_data([tmp_path / "d1", tmp_path / "d2"], tmp_path / "both")
    merged = read_kaldi_format(tmp_path / "both" / "text")
    assert set(merged) == {"utt1", "utt2", "utt3"}
    spk2utt = read_kaldi_format(tmp_path / "both" / "spk2utt")
    assert spk2utt["spkX"] == "utt1 utt2" and spk2utt["spkY"] == "utt3"


# ---------------------------------------------------------------------------
# WER
# ---------------------------------------------------------------------------


def test_align_and_wer_known_values():
    ali = align_tokens(["a", "b", "c"], ["a", "x", "c", "d"])
    ops = [op for op, _, _ in ali]
    assert ops == ["=", "S", "=", "I"]

    stats = ErrorRateStats()
    stats.append(["u1"], predict=[["a", "x", "c", "d"]], target=[["a", "b", "c"]])
    t = stats.summarize("all")
    assert t["substitutions"] == 1 and t["insertions"] == 1 and t["deletions"] == 0
    assert t["error_rate"] == pytest.approx(100.0 * 2 / 3)

    # deletion-only case
    stats2 = ErrorRateStats()
    stats2.append(["u2"], predict=[[]], target=[["a", "b"]])
    assert stats2.summarize("error_rate") == pytest.approx(100.0)


def test_compute_wer_writes_details(tmp_path):
    refs = {"u1": "the cat sat", "u2": "hello world"}
    hyps = {"u1": "the cat sat", "u2": "hello word"}
    stats = compute_wer(refs, hyps, tmp_path / "wer")
    assert stats.summarize("error_rate") == pytest.approx(100.0 * 1 / 5)
    txt = (tmp_path / "wer").read_text()
    assert txt.startswith("%WER") and "u2" in txt and "ops:" in txt


def test_evaluate_asr_driver_and_caching(tmp_path):
    from streamvoiceanon_tpu.audio.io import write_wav
    from streamvoiceanon_tpu.evals.wer import evaluate_asr

    sr = 16000
    rng = np.random.default_rng(0)
    texts = {"u1": "one two three", "u2": "four five"}
    for name in ("libri_dev", "libri_dev_anon"):
        d = tmp_path / "data" / name
        scp = {}
        for u in texts:
            wav = (rng.standard_normal(sr // 4) * 0.05).astype(np.float32)
            write_wav(str(tmp_path / f"{name}_{u}.wav"), wav, sr)
            scp[u] = str(tmp_path / f"{name}_{u}.wav")
        save_kaldi_format(scp, d / "wav.scp")
        save_kaldi_format(texts, d / "text")

    calls = {"n": 0}

    def transcriber(wav, sr):
        calls["n"] += 1
        return "one two three" if calls["n"] % 2 else "four five wrong"

    df = evaluate_asr(
        ["libri_dev"], tmp_path / "data", transcriber,
        results_dir=tmp_path / "results", anon_data_suffix="_anon",
    )
    assert set(df["asr"]) == {"original", "anon"}
    assert calls["n"] == 4
    assert (tmp_path / "results" / "libri_dev" / "wer").exists()

    # second run reuses cached hypotheses — transcriber not called again
    df2 = evaluate_asr(
        ["libri_dev"], tmp_path / "data", transcriber,
        results_dir=tmp_path / "results", anon_data_suffix="_anon",
    )
    assert calls["n"] == 4
    assert list(df2["WER"]) == list(df["WER"])


# ---------------------------------------------------------------------------
# SER
# ---------------------------------------------------------------------------


def _band_energy_embed(wav: np.ndarray, sr: int, dim: int = 8) -> np.ndarray:
    spec = np.abs(np.fft.rfft(wav)) ** 2
    bands = np.array_split(spec, dim)
    e = np.array([float(np.sum(b)) for b in bands])
    return np.log1p(e) / 10.0


def test_ser_fold_uar(tmp_path):
    """Synthetic 'emotions' = sine frequencies; fold-wise training must
    recover them (UAR ~ 100 on clean data)."""
    import jax

    from streamvoiceanon_tpu.audio.io import write_wav
    from streamvoiceanon_tpu.evals import ser
    from streamvoiceanon_tpu.evals.kaldi import save_kaldi_format

    sr = 16000
    emotions = ["neu", "hap", "sad"]
    freqs = {"neu": 200.0, "hap": 1200.0, "sad": 3000.0}
    rng = np.random.default_rng(1)
    t = np.arange(sr // 4) / sr

    scp, utt2spk, utt2emo = {}, {}, {}
    for spk, fold in [("spkA", "1"), ("spkB", "2")]:
        for ei, emo in enumerate(emotions):
            for j in range(4):
                u = f"{spk}_{emo}_{j}"
                wav = np.sin(2 * np.pi * freqs[emo] * t) + 0.01 * rng.standard_normal(len(t))
                path = tmp_path / f"{u}.wav"
                write_wav(str(path), wav.astype(np.float32), sr)
                scp[u] = str(path)
                utt2spk[u] = spk
                utt2emo[u] = emo
    d = tmp_path / "data" / "IEMOCAP_test"
    save_kaldi_format(scp, d / "wav.scp")
    save_kaldi_format(utt2spk, d / "utt2spk")
    save_kaldi_format(utt2emo, d / "utt2emo")
    save_kaldi_format({"spkA": "1", "spkB": "2"}, d / "spk2fold")
    # anon copy: same wavs (suffix dataset must exist)
    da = tmp_path / "data" / "IEMOCAP_test_anon"
    for f in ("wav.scp", "utt2spk", "utt2emo", "spk2fold"):
        (da).mkdir(parents=True, exist_ok=True)
        (da / f).write_text((d / f).read_text())

    embs = {u: _band_energy_embed(*__import__(
        "streamvoiceanon_tpu.audio.io", fromlist=["read_wav"]
    ).read_wav(p, target_sr=sr)) for u, p in scp.items()}

    cfg = ser.SERHeadConfig(emb_dim=8, hidden=16, n_classes=3, steps=200)
    clfs = ser.train_fold_classifiers(
        jax.random.PRNGKey(0), cfg, embs, utt2emo, utt2spk,
        {"spkA": "1", "spkB": "2"}, emotions,
    )
    assert set(clfs) == {"1", "2"}

    mean = ser.evaluate_ser(
        ["IEMOCAP_test"], tmp_path / "data", clfs,
        embed_fn=_band_energy_embed, emotions=emotions,
        results_dir=tmp_path / "ser_results", anon_data_suffix="_anon",
    )
    orig = mean[mean["ser"] == "original"]
    assert float(orig["UAR"].iloc[0]) > 90.0
    assert (tmp_path / "ser_results" / "results_anon.csv").exists()


def test_uar_macro_recall():
    from streamvoiceanon_tpu.evals.ser import uar

    # class 0: 2/2 right, class 1: 0/2 right -> UAR 50
    assert uar([0, 0, 1, 1], [0, 0, 0, 0]) == pytest.approx(50.0)


# ---------------------------------------------------------------------------
# ASV_eval^anon training
# ---------------------------------------------------------------------------


def _tiny_campplus():
    from streamvoiceanon_tpu.config import CAMPPlusConfig
    from streamvoiceanon_tpu.utils import randparams as rp

    cfg = CAMPPlusConfig(
        embedding_size=32, growth_rate=8, bn_size=2, init_channels=16,
        block_layers=(2, 2), block_kernels=(3, 3), block_dilations=(1, 2),
    )
    return rp.campplus_params_np(cfg, seed=0), cfg


def test_asv_train_learns_speakers():
    import jax.numpy as jnp

    from streamvoiceanon_tpu.evals.anonymize import Utterance
    from streamvoiceanon_tpu.evals import asv_train

    params_np, cp_cfg = _tiny_campplus()
    sr = 16000
    rng = np.random.default_rng(0)
    t = np.arange(sr) / sr
    utts = []
    freqs = {"spk0": 220.0, "spk1": 1500.0, "spk2": 3500.0}
    for spk, f0 in freqs.items():
        for j in range(3):
            wav = np.sin(2 * np.pi * f0 * t) + 0.02 * rng.standard_normal(len(t))
            utts.append(Utterance(f"{spk}_{j}", spk, wav.astype(np.float32)))

    cfg = asv_train.ASVTrainConfig(
        chunk_seconds=0.5, batch_size=6, steps=60, lr=3e-4, scale=15.0,
        margin=0.1, emb_dim=cp_cfg.embedding_size, finetune_backbone=True,
    )
    history = []
    model = asv_train.train_asv_eval(
        params_np, cp_cfg, utts, cfg, utt_sample_rate=sr, history=history
    )
    assert "head" in model and "backbone" in model
    # AAM loss goes down
    assert np.mean(history[-10:]) < np.mean(history[:10])

    embs = asv_train.extract_embeddings(model, cp_cfg, utts, sample_rate=sr)
    labels = np.asarray([u.speaker for u in utts])
    e = embs / np.linalg.norm(embs, axis=-1, keepdims=True)
    sim = e @ e.T
    same = labels[:, None] == labels[None, :]
    off_diag = ~np.eye(len(utts), dtype=bool)
    # trained embeddings: same-speaker similarity exceeds cross-speaker
    assert sim[same & off_diag].mean() > sim[~same].mean() + 0.05


# ---------------------------------------------------------------------------
# anonymize -> ASV e2e
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_anonymize_asv_e2e():
    """Full privacy loop on the tiny pipeline: anonymize a toy dataset with
    the converter, then score OO/OA/AA with the framework's ASV backend
    (run_anonymization.py + evaluate_asv equivalents)."""
    import dataclasses as dc

    from tests.tinymodels import tiny_converter

    from streamvoiceanon_tpu.config import (
        CAMPPlusConfig,
        SpeakerEncoderConfig,
        replace,
    )
    from streamvoiceanon_tpu.evals.anonymize import (
        Utterance,
        anonymize_dataset,
        asv_scenarios,
    )
    from streamvoiceanon_tpu.utils import randparams as rp

    cv = tiny_converter()
    # attach tiny speaker models so converter.infer can embed references
    cp_cfg192 = CAMPPlusConfig(
        embedding_size=192, growth_rate=8, bn_size=2, init_channels=16,
        block_layers=(2, 2), block_kernels=(3, 3), block_dilations=(1, 2),
    )
    spk_cfg = SpeakerEncoderConfig(ecapa_channels=64)
    cv = dc.replace(
        cv,
        cfg=replace(cv.cfg, campplus=cp_cfg192, speaker=spk_cfg),
        campplus_params=rp.campplus_params_np(cp_cfg192, seed=5),
        speaker_params=rp.speaker_encoder_params_np(spk_cfg, seed=6),
    )
    spf = cv.cfg.samples_per_frame
    rng = np.random.default_rng(0)

    def speaker_wav(f0, seed, n_frames=8):
        t = np.arange(n_frames * spf) / 44100.0
        r = np.random.default_rng(seed)
        return (np.sin(2 * np.pi * f0 * t) + 0.05 * r.standard_normal(len(t))).astype(
            np.float32
        )

    enroll = [Utterance(f"e{s}", f"spk{s}", speaker_wav(200 + 400 * s, s)) for s in range(2)]
    trials = [
        Utterance(f"t{s}_{i}", f"spk{s}", speaker_wav(200 + 400 * s, 10 + 2 * s + i))
        for s in range(2)
        for i in range(2)
    ]
    target_refs = [speaker_wav(3000, 99, n_frames=8)]

    trial_anon = anonymize_dataset(cv, trials, target_refs, alpha=0.5, delay=1, seed=0)
    enroll_anon = anonymize_dataset(cv, enroll, target_refs, alpha=0.5, delay=1, seed=0)
    assert all(len(u.wav) > 0 for u in trial_anon)

    params_np, cp_cfg = _tiny_campplus()
    out = asv_scenarios(
        enroll, trials, trial_anon, params_np, cp_cfg, enroll_anon=enroll_anon
    )
    assert set(out) == {"OO", "OA", "AA"}
    for metrics in out.values():
        assert np.isfinite(metrics["eer"]) and 0.0 <= metrics["eer"] <= 0.5
        assert np.isfinite(metrics["linkability"])


def test_ecapa_asv_train_learns_speakers():
    """ECAPA ASV_eval^anon (VPC protocol: AAM-softmax from random init,
    train_speaker_embeddings.py equivalence): loss decreases and trained
    embeddings separate speakers."""
    from streamvoiceanon_tpu.evals.anonymize import Utterance
    from streamvoiceanon_tpu.evals import ecapa_asv as ea

    sr = 16000
    rng = np.random.default_rng(0)
    t = np.arange(sr) / sr
    utts = []
    freqs = {"spk0": 220.0, "spk1": 1500.0, "spk2": 3500.0}
    for spk, f0 in freqs.items():
        for j in range(3):
            wav = np.sin(2 * np.pi * f0 * t) + 0.02 * rng.standard_normal(len(t))
            utts.append(Utterance(f"{spk}_{j}", spk, wav.astype(np.float32)))

    cfg = ea.ECAPAASVConfig(
        channels=16, latent_dim=32, attn_dim=16, se_dim=8, emb_dim=24,
        chunk_seconds=0.5, batch_size=6, steps=60, lr=3e-4, scale=15.0,
        margin=0.1,
    )
    history = []
    model = ea.train_ecapa_asv(utts, cfg, utt_sample_rate=sr, history=history)
    assert np.mean(history[-10:]) < np.mean(history[:10])

    embs = ea.extract_embeddings(model, cfg, utts, sample_rate=sr)
    labels = np.asarray([u.speaker for u in utts])
    e = embs / np.linalg.norm(embs, axis=-1, keepdims=True)
    sim = e @ e.T
    same = labels[:, None] == labels[None, :]
    off_diag = ~np.eye(len(utts), dtype=bool)
    assert sim[same & off_diag].mean() > sim[~same].mean() + 0.05
