"""Gate the bench serving-precision defaults on measured accuracy.

bench.py serves with bf16 DSP weights (`_dsp_dtype`) and bf16 serving state
(`_state_dtype`: LM KV cache + stream tails) — the perf configuration.  The
BASELINE bar is waveform allclose atol 1e-2 vs the f32 path (BASELINE.md),
stated for unit-scale audio; with random weights the scale-free equivalent
is relative error vs the f32 signal.  This test runs the full-geometry
three-variant comparison (benchmarks/bf16_accuracy.py) on a short stream
and asserts the shipped configuration stays inside the bar, so the bench
default and the verified-accuracy configuration are the same thing
(VERDICT r3 weak #4).

Reference precision precedent: fp16 autocast on the reference's serving
path (evaluations/infer_arvc.py:349).
"""

import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2] / "benchmarks"))

import bf16_accuracy  # noqa: E402


@pytest.mark.slow
def test_bf16_serving_within_baseline_bar():
    out = bf16_accuracy.run(n_chunks=16, delay=2, log=lambda *a: None)

    # vocoder precision alone (same codes): the direct analogue of the
    # BASELINE waveform-allclose bar, relative to the f32 signal peak
    assert out["within_baseline_bar"], out
    assert out["vocoder_same_codes_rel_max"] <= 1e-2, out

    for name in ("bf16", "serve"):
        v = out["variants"][name]
        # greedy token agreement: bf16 rounding may flip rare borderline
        # content tokens (measured flip rate 1.6% over 64 chunks, and the
        # flipped frames' f32 decision margins are ~0.3% of the typical LFQ
        # projection magnitude — `content_flip_margins` below).  A single
        # flip makes the greedy AR trajectory diverge from there on (chaotic
        # continuation, not accumulating error — the teacher-forced gate
        # below is the direct evidence), so the gated quantities are the
        # flip rate, the flip margins, the per-step agreement, the agreeing
        # prefix, and the waveform error — NOT the post-flip codec match.
        assert v["content_token_match_rate"] >= 0.93, (name, out)
        assert v["matching_prefix_chunks"] >= 4, (name, out)
        # over the agreeing prefix, the waveform sits inside the bar
        assert v["e2e_matching_prefix_rel_max"] <= 1e-2, (name, out)

    # teacher-forced per-step agreement: with the f32 trajectory forced into
    # every bf16-state step, per-step codec frames must agree (no
    # accumulating precision error — divergence is chaotic-only).
    tf = out["teacher_forced"]
    assert tf["per_step_codec_agreement"] >= 0.99, out

    # any flipped content token must have had (near-)zero f32 decision
    # margin: the flip is a coin-toss on a borderline bit, not a systematic
    # precision failure (measured max margin 0.3% of typical at 64 chunks)
    fm = out["content_flip_margins"]
    if fm["n_flipped_frames"]:
        assert fm["max_margin_over_typical"] <= 0.05, out
