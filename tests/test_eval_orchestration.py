"""run_evaluation-equivalent orchestration, plots, and text-norm additions."""

import numpy as np
import pytest

from streamvoiceanon_tpu.evals.kaldi import save_kaldi_format


def _write_speaker_dirs(tmp_path, sr=16000):
    """Two-speaker enroll/trial kaldi dirs + 'anonymized' copies (noise-mixed
    toward a shared carrier so speakers become less separable)."""
    from streamvoiceanon_tpu.audio.io import write_wav

    rng = np.random.default_rng(0)
    t = np.arange(sr) / sr

    def wav_for(spk, j, anon=False):
        f0 = 300.0 if spk == "spkA" else 2500.0
        w = np.sin(2 * np.pi * f0 * t) + 0.02 * rng.standard_normal(len(t))
        if anon:
            carrier = np.sin(2 * np.pi * 1200.0 * t)
            w = 0.3 * w + 0.7 * carrier
        return w.astype(np.float32)

    for name, anon in [("libri_dev_enrolls", False), ("libri_dev_trials", False),
                       ("libri_dev_enrolls_anon", True), ("libri_dev_trials_anon", True)]:
        d = tmp_path / "data" / name
        scp, u2s = {}, {}
        for spk in ("spkA", "spkB"):
            for j in range(3):
                u = f"{spk}_{name}_{j}"
                p = tmp_path / f"{u}.wav"
                write_wav(str(p), wav_for(spk, j, anon), sr)
                scp[u] = str(p)
                u2s[u] = spk
        save_kaldi_format(scp, d / "wav.scp")
        save_kaldi_format(u2s, d / "utt2spk")
    return sr


def test_run_evaluation_asv_and_asr(tmp_path):
    from tests.test_eval_harness import _tiny_campplus

    from streamvoiceanon_tpu.evals.harness import (
        ASRStep,
        ASVStep,
        EvalConfig,
        run_evaluation,
    )

    sr = _write_speaker_dirs(tmp_path)
    params_np, cp_cfg = _tiny_campplus()

    # ASR dirs reuse the trial wavs
    from streamvoiceanon_tpu.evals.kaldi import read_kaldi_format

    for name in ("libri_dev_trials", "libri_dev_trials_anon"):
        scp = read_kaldi_format(tmp_path / "data" / name / "wav.scp")
        save_kaldi_format({u: "some words here" for u in scp},
                          tmp_path / "data" / name / "text")

    cfg = EvalConfig(
        data_dir=tmp_path / "data", results_dir=tmp_path / "results",
        asv=ASVStep(enrolls=["libri_dev_enrolls"], trials=["libri_dev_trials"]),
        asr=ASRStep(datasets=["libri_dev_trials"]),
        sample_rate=sr,
    )
    results = run_evaluation(
        cfg, campplus_params=params_np, cp_cfg=cp_cfg,
        transcriber=lambda w, s: "some words here",
    )
    asv = results["asv"]
    assert {"original", "anon"} <= set(asv["trial"])
    assert (asv["EER"] >= 0).all() and (asv["EER"] <= 50).all()
    assert (results["asr"]["WER"] == 0.0).all()
    summary = (tmp_path / "results" / "results_summary.txt").read_text()
    assert "---- ASV_eval results ----" in summary
    assert "---- ASR results ----" in summary
    assert (tmp_path / "results" / "asv_results_anon.csv").exists()


def test_anonymize_kaldi_dir(tmp_path):
    """run_anonymization-equivalent dataset pass writes a complete anon dir."""
    from tests.tinymodels import tiny_converter

    from streamvoiceanon_tpu.audio.io import write_wav
    from streamvoiceanon_tpu.evals.anonymize import anonymize_kaldi_dir
    from streamvoiceanon_tpu.evals.kaldi import read_kaldi_format

    import dataclasses as dc

    from streamvoiceanon_tpu.config import (
        CAMPPlusConfig,
        SpeakerEncoderConfig,
        replace,
    )
    from streamvoiceanon_tpu.utils import randparams as rp

    cv = tiny_converter()
    cp_cfg = CAMPPlusConfig(
        embedding_size=192, growth_rate=8, bn_size=2, init_channels=16,
        block_layers=(2, 2), block_kernels=(3, 3), block_dilations=(1, 2),
    )
    spk_cfg = SpeakerEncoderConfig(ecapa_channels=64)
    cv = dc.replace(
        cv,
        cfg=replace(cv.cfg, campplus=cp_cfg, speaker=spk_cfg),
        campplus_params=rp.campplus_params_np(cp_cfg, seed=5),
        speaker_params=rp.speaker_encoder_params_np(spk_cfg, seed=6),
    )
    sr = 44100
    spf = cv.cfg.samples_per_frame
    rng = np.random.default_rng(0)
    d = tmp_path / "libri_dev"
    scp = {}
    for i in range(2):
        wav = (rng.standard_normal(6 * spf) * 0.1).astype(np.float32)
        p = tmp_path / f"u{i}.wav"
        write_wav(str(p), wav, sr)
        scp[f"u{i}"] = str(p)
    save_kaldi_format(scp, d / "wav.scp")
    save_kaldi_format({"u0": "spkA", "u1": "spkB"}, d / "utt2spk")
    save_kaldi_format({"u0": "hello", "u1": "world"}, d / "text")

    target = (rng.standard_normal(8 * spf) * 0.1).astype(np.float32)
    anonymize_kaldi_dir(cv, str(d), str(tmp_path / "libri_dev_anon"), [target],
                        alpha=0.5, delay=1, seed=0)
    out = tmp_path / "libri_dev_anon"
    anon_scp = read_kaldi_format(out / "wav.scp")
    assert set(anon_scp) == {"u0", "u1"}
    from streamvoiceanon_tpu.audio.io import read_wav

    w, _ = read_wav(anon_scp["u0"], target_sr=sr)
    assert len(w) > 0
    assert (out / "text").read_text() == (d / "text").read_text()
    assert read_kaldi_format(out / "utt2spk")["u1"] == "spkB"


def test_plots_smoke(tmp_path):
    from streamvoiceanon_tpu.evals.plots import plot_all

    rng = np.random.default_rng(0)
    tar = rng.normal(1.0, 0.5, 300)
    non = rng.normal(-1.0, 0.5, 1000)
    paths = plot_all(tar, non, tmp_path, prefix="t")
    for p in paths:
        assert p.exists() and p.stat().st_size > 1000


def test_chinese_fraction_and_phone():
    from streamvoiceanon_tpu.utils.text import normalize_chinese

    assert normalize_chinese("占1/3左右") == "占三分之一左右"
    out = normalize_chinese("电话010-12345678")
    assert "零一零一二三四五六七八" == out.replace("电话", "")
    assert normalize_chinese("3/4拍") == "四分之三拍"


def test_asr_eval_train_overfit_and_transcribe(tmp_path):
    """Native ASR_eval (CTC) memorizes a tiny train set -> WER 0 through the
    full evaluate_asr driver (train_asr_eval.py equivalence)."""
    from streamvoiceanon_tpu.audio.io import write_wav
    from streamvoiceanon_tpu.evals import asr_eval_train as aet
    from streamvoiceanon_tpu.evals.anonymize import Utterance
    from streamvoiceanon_tpu.evals.wer import evaluate_asr

    sr = 16000
    rng = np.random.default_rng(0)
    t = np.arange(sr // 2) / sr
    wavs = {
        "u1": (np.sin(2 * np.pi * 300 * t) + 0.02 * rng.standard_normal(len(t))).astype(np.float32),
        "u2": (np.sin(2 * np.pi * 2000 * t) + 0.02 * rng.standard_normal(len(t))).astype(np.float32),
    }
    texts = {"u1": "ab", "u2": "ba"}
    utts = [Utterance(u, u, w) for u, w in wavs.items()]

    cfg = aet.ASREvalConfig(dim=64, n_layers=1, n_heads=2, steps=250,
                            batch_size=2, max_frames=64, max_label_len=8)
    hist = []
    params, vocab = aet.train_asr_eval(utts, texts, cfg, utt_sample_rate=sr,
                                       history=hist)
    assert hist[-1] < hist[0]
    transcriber = aet.make_transcriber(params, vocab, cfg)
    assert transcriber(wavs["u1"], sr) == "ab"
    assert transcriber(wavs["u2"], sr) == "ba"

    # end-to-end through the WER driver
    for name in ("tiny_dev", "tiny_dev_anon"):
        d = tmp_path / "data" / name
        scp = {}
        for u, w in wavs.items():
            p = tmp_path / f"{name}_{u}.wav"
            write_wav(str(p), w, sr)
            scp[u] = str(p)
        save_kaldi_format(scp, d / "wav.scp")
        save_kaldi_format(texts, d / "text")
    df = evaluate_asr(["tiny_dev"], tmp_path / "data", transcriber,
                      results_dir=tmp_path / "res", anon_data_suffix="_anon")
    assert (df["WER"] == 0.0).all()


def test_asv_plda_distance(tmp_path):
    from tests.test_eval_harness import _tiny_campplus

    from streamvoiceanon_tpu.evals.harness import ASVStep, EvalConfig, run_evaluation

    sr = _write_speaker_dirs(tmp_path)
    params_np, cp_cfg = _tiny_campplus()
    cfg = EvalConfig(
        data_dir=tmp_path / "data", results_dir=tmp_path / "results_plda",
        asv=ASVStep(enrolls=["libri_dev_enrolls"], trials=["libri_dev_trials"],
                    distance="plda"),
        sample_rate=sr,
    )
    asv = run_evaluation(cfg, campplus_params=params_np, cp_cfg=cp_cfg)["asv"]
    assert len(asv) == 3
    assert (asv["EER"] >= 0).all() and (asv["EER"] <= 50).all()


def test_make_submission(tmp_path):
    import zipfile

    from streamvoiceanon_tpu.evals.harness import make_submission

    res = tmp_path / "results"
    (res / "asr").mkdir(parents=True)
    (res / "results_summary.txt").write_text("---- pre ----\n")
    (res / "asr" / "results_anon.csv").write_text("a,b\n1,2\n")
    post = tmp_path / "post_summary.txt"
    post.write_text("---- post ----\n")

    z = make_submission([res / "results_summary.txt", post], res,
                        tmp_path / "sub" / "result_for_submission_anon.zip")
    names = zipfile.ZipFile(z).namelist()
    assert "result_for_rank_anon" in names
    assert any(n.endswith("results_anon.csv") for n in names)
    rank = (tmp_path / "sub" / "result_for_rank_anon").read_text()
    assert "pre" in rank and "post" in rank


def test_run_evaluation_ser_autotrain(tmp_path):
    """SER step with no supplied classifiers: fold heads are trained in place
    on the original data (harness auto-train path) with an embed_fn."""
    from streamvoiceanon_tpu.audio.io import write_wav
    from streamvoiceanon_tpu.evals.harness import EvalConfig, SERStep, run_evaluation

    sr = 16000
    emotions = ["neu", "hap"]
    freqs = {"neu": 250.0, "hap": 2200.0}
    rng = np.random.default_rng(2)
    t = np.arange(sr // 4) / sr
    for name in ("IEMOCAP_test", "IEMOCAP_test_anon"):
        d = tmp_path / "data" / name
        scp, u2s, u2e = {}, {}, {}
        for spk, fold in (("sA", "1"), ("sB", "2")):
            for emo in emotions:
                for j in range(3):
                    u = f"{spk}_{emo}_{j}_{name}"
                    w = np.sin(2 * np.pi * freqs[emo] * t) + 0.01 * rng.standard_normal(len(t))
                    p = tmp_path / f"{u}.wav"
                    write_wav(str(p), w.astype(np.float32), sr)
                    scp[u], u2s[u], u2e[u] = str(p), spk, emo
        save_kaldi_format(scp, d / "wav.scp")
        save_kaldi_format(u2s, d / "utt2spk")
        save_kaldi_format(u2e, d / "utt2emo")
        save_kaldi_format({"sA": "1", "sB": "2"}, d / "spk2fold")

    def band_embed(w, s, dim=8):
        spec = np.abs(np.fft.rfft(w)) ** 2
        return np.log1p(np.array([float(b.sum()) for b in np.array_split(spec, dim)])) / 10.0

    cfg = EvalConfig(
        data_dir=tmp_path / "data", results_dir=tmp_path / "results",
        ser=SERStep(datasets=["IEMOCAP_test"], emotions=tuple(emotions)),
        sample_rate=sr,
    )
    res = run_evaluation(cfg, ser_embed_fn=band_embed)
    orig = res["ser"][res["ser"]["ser"] == "original"]
    assert float(orig["UAR"].iloc[0]) > 90.0
    assert "---- SER results ----" in (tmp_path / "results" / "results_summary.txt").read_text()


def test_transcriber_no_truncation_on_long_audio():
    """Inference pads to a per-utterance bucket: content past the training
    window (max_frames) still reaches the decoder."""
    import jax

    from streamvoiceanon_tpu.evals import asr_eval_train as aet

    cfg = aet.ASREvalConfig(dim=32, n_layers=1, n_heads=2, max_frames=64)
    params = aet.init_params(jax.random.PRNGKey(0), cfg, vocab_size=3)
    vocab = {"a": 1, "b": 2, "c": 3}
    tr = aet.make_transcriber(params, vocab, cfg)
    # 12 s @16k = ~1200 frames >> max_frames 64; must not raise and must
    # process all frames (decode sees > 64//4 positions)
    wav = np.random.default_rng(0).standard_normal(12 * 16000).astype(np.float32)
    out = tr(wav, 16000)
    assert isinstance(out, str)


def test_asr_eval_w2v_overfit_and_transcribe(tmp_path):
    """Conformer (w2v-BERT backbone) ASR_eval memorizes the tiny train set ->
    WER 0 through the full evaluate_asr driver.  Matches the reference's
    speechbrain EncoderASR attacker family (speechbrain_asr/inference.py:16-68)
    with the backbone shared with the distillation teacher."""
    from streamvoiceanon_tpu.audio.io import write_wav
    from streamvoiceanon_tpu.evals import asr_eval_w2v as aw
    from streamvoiceanon_tpu.evals.anonymize import Utterance
    from streamvoiceanon_tpu.evals.wer import evaluate_asr
    from streamvoiceanon_tpu.models.w2v_bert_native import W2VBertConfig

    sr = 16000
    rng = np.random.default_rng(0)
    t = np.arange(sr // 2) / sr
    wavs = {
        "u1": (np.sin(2 * np.pi * 300 * t) + 0.02 * rng.standard_normal(len(t))).astype(np.float32),
        "u2": (np.sin(2 * np.pi * 2000 * t) + 0.02 * rng.standard_normal(len(t))).astype(np.float32),
    }
    texts = {"u1": "ab", "u2": "ba"}
    utts = [Utterance(u, u, w) for u, w in wavs.items()]

    cfg = aw.W2VASRConfig(
        encoder=W2VBertConfig(hidden=64, n_layers=1, n_heads=2,
                              intermediate=128, conv_kernel=7),
        steps=250, batch_size=2, max_frames=32, max_label_len=8,
    )
    hist = []
    params, vocab = aw.train_asr_eval_w2v(utts, texts, cfg, utt_sample_rate=sr,
                                          history=hist)
    assert hist[-1] < hist[0]
    transcriber = aw.make_transcriber_w2v(params, vocab, cfg)
    assert transcriber(wavs["u1"], sr) == "ab"
    assert transcriber(wavs["u2"], sr) == "ba"

    for name in ("tiny_dev", "tiny_dev_anon"):
        d = tmp_path / "data" / name
        scp = {}
        for u, w in wavs.items():
            p = tmp_path / f"{name}_{u}.wav"
            write_wav(str(p), w, sr)
            scp[u] = str(p)
        save_kaldi_format(scp, d / "wav.scp")
        save_kaldi_format(texts, d / "text")
    df = evaluate_asr(["tiny_dev"], tmp_path / "data", transcriber,
                      results_dir=tmp_path / "res", anon_data_suffix="_anon")
    assert (df["WER"] == 0.0).all()


def test_asv_eval_anon_both_backbones(tmp_path):
    """eval_post ASV_eval^anon via run_evaluation with BOTH attacker
    families: fine-tuned CAMPPlus head and from-scratch ECAPA (the VPC
    protocol, asv_train/train_speaker_embeddings.py hparams ecapa)."""
    from tests.test_eval_harness import _tiny_campplus

    from streamvoiceanon_tpu.evals.ecapa_asv import ECAPAASVConfig
    from streamvoiceanon_tpu.evals.harness import ASVStep, EvalConfig, run_evaluation

    from streamvoiceanon_tpu.evals.asv_train import ASVTrainConfig

    sr = _write_speaker_dirs(tmp_path)
    params_np, cp_cfg = _tiny_campplus()
    tiny_campplus_train = ASVTrainConfig(
        chunk_seconds=0.5, batch_size=4, steps=30, lr=3e-4, scale=15.0,
        margin=0.1, emb_dim=cp_cfg.embedding_size,
    )
    tiny_ecapa = ECAPAASVConfig(
        channels=16, latent_dim=32, attn_dim=16, se_dim=8, emb_dim=24,
        chunk_seconds=0.5, batch_size=4, steps=30, lr=3e-4, scale=15.0,
        margin=0.1,
    )
    for backbone in ("campplus", "ecapa"):
        cfg = EvalConfig(
            data_dir=tmp_path / "data",
            results_dir=tmp_path / f"results_{backbone}",
            asv=ASVStep(
                enrolls=["libri_dev_enrolls"], trials=["libri_dev_trials"],
                train_asv_on_anon=True, train_dirs=["libri_dev_enrolls_anon"],
                anon_backbone=backbone,
                ecapa_cfg=tiny_ecapa if backbone == "ecapa" else None,
                campplus_cfg=tiny_campplus_train,
            ),
            sample_rate=sr,
        )
        asv = run_evaluation(cfg, campplus_params=params_np, cp_cfg=cp_cfg)["asv"]
        anon = asv[asv["model"] == "ASV_eval_anon"]
        assert len(anon) == 1 and (anon["backbone"] == backbone).all()
        assert (anon["EER"] >= 0).all() and (anon["EER"] <= 100).all()
        summary = (tmp_path / f"results_{backbone}" /
                   "results_summary.txt").read_text()
        assert "ASV_eval^anon results" in summary
