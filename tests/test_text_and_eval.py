"""Text utilities + anonymization evaluation orchestration tests."""

import numpy as np

from streamvoiceanon_tpu.utils import text as T


def test_clean_text():
    # emoji stripped; the reference keeps surrounding whitespace (clean.py:25-38)
    assert T.clean_text("  hello‘world’ 😀 ") == "hello'world' "
    assert T.clean_text("a,,,b") == "a,b"


def test_repetition_found():
    assert T.repetition_found("ababababababababababababab")
    assert not T.repetition_found("the quick brown fox")


def test_number_to_chinese():
    assert T.number_to_chinese(0) == "零"
    assert T.number_to_chinese(10) == "十"
    assert T.number_to_chinese(14) == "十四"
    assert T.number_to_chinese(105) == "一百零五"
    assert T.number_to_chinese(10203) == "一万零二百零三"
    assert T.number_to_chinese(200000000) == "两亿"  # reference-exact (两 alt)


def test_normalize_chinese():
    assert T.normalize_chinese("涨了12.5%") == "涨了百分之十二点五"
    assert "一九九九年" in T.normalize_chinese("1999年")
    assert T.normalize_chinese("5元") == "五元"
    out = T.normalize_chinese("电话13800138000")
    assert "一三八零零一三八零零零" in out  # digit-wise, reference-exact


def test_asv_scenarios_on_synthetic_speakers(rng):
    """OO EER should be much lower than OA ('anonymized' =噪 random audio)."""
    import torch

    import pytest

    dtdnn = pytest.importorskip("modules.campplus.DTDNN")
    from streamvoiceanon_tpu.config import CAMPPlusConfig
    from streamvoiceanon_tpu.evals.anonymize import Utterance, asv_scenarios
    from streamvoiceanon_tpu.models import campplus

    torch.manual_seed(0)
    ref = dtdnn.CAMPPlus(feat_dim=80, embedding_size=192).eval()
    params = campplus.convert(ref.state_dict(), CAMPPlusConfig())

    sr = 44100

    def speaker_wav(spk_seed, utt_seed, n=sr):
        # per-speaker comb-filtered noise -> consistent spectral signature
        r = np.random.default_rng(1000 + spk_seed)
        f0 = 100 + 60 * spk_seed
        t = np.arange(n) / sr
        tone = sum(np.sin(2 * np.pi * f0 * (k + 1) * t) / (k + 1) for k in range(6))
        noise = np.random.default_rng(utt_seed).standard_normal(n) * 0.05
        return (0.1 * tone + noise).astype(np.float32)

    enroll = [Utterance(f"e{s}", f"spk{s}", speaker_wav(s, 10 + s)) for s in range(4)]
    trials = [
        Utterance(f"t{s}_{i}", f"spk{s}", speaker_wav(s, 100 + 10 * s + i))
        for s in range(4)
        for i in range(3)
    ]
    anon = [
        Utterance(u.utt_id, u.speaker,
                  np.random.default_rng(hash(u.utt_id) & 0xFFFF).standard_normal(sr).astype(np.float32) * 0.1)
        for u in trials
    ]
    out = asv_scenarios(enroll, trials, anon, params, CAMPPlusConfig())
    assert out["OO"]["eer"] <= 0.25
    assert out["OA"]["eer"] >= out["OO"]["eer"]
    assert 0 <= out["OO"]["linkability"] <= 1
