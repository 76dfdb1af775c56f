"""PLDA backend + sinc resampler correctness."""

import numpy as np

import jax.numpy as jnp

from streamvoiceanon_tpu.audio.resample import resample
from streamvoiceanon_tpu.evals import privacy_metrics as pm
from streamvoiceanon_tpu.evals.plda import train_plda


def _speaker_data(rng, n_spk=8, n_utt=12, d=16):
    # latent speaker means + within-speaker noise, embedded in D dims
    V = rng.standard_normal((4, d))  # speaker subspace rank 4
    embs, labels = [], []
    for s in range(n_spk):
        y = rng.standard_normal(4) @ V
        for _ in range(n_utt):
            embs.append(y + 0.6 * rng.standard_normal(d))
            labels.append(s)
    return np.asarray(embs), np.asarray(labels)


def test_plda_beats_chance_and_orders_scores(rng):
    embs, labels = _speaker_data(rng)
    # train on first 6 speakers, eval on held-out 2
    train_mask = labels < 6
    model = train_plda(embs[train_mask], labels[train_mask], n_iter=5)
    ev = ~train_mask
    e, l = embs[ev], labels[ev]
    scores = model.score(e, e)
    same = l[:, None] == l[None, :]
    off = ~np.eye(len(l), dtype=bool)
    tar = scores[same & off]
    non = scores[~same]
    eer, _ = pm.eer(tar, non)
    assert eer < 0.2, f"PLDA EER too high: {eer}"
    assert tar.mean() > non.mean()


def test_resample_preserves_tone_frequency(rng):
    sr1, sr2 = 44100, 16000
    t = np.arange(sr1) / sr1
    f0 = 440.0
    wav = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    out = np.asarray(resample(jnp.asarray(wav)[None], sr1, sr2))[0]
    assert len(out) == int(np.ceil(len(wav) * sr2 / sr1))
    # dominant DFT bin must sit at 440 Hz
    spec = np.abs(np.fft.rfft(out[1000:-1000] * np.hanning(len(out) - 2000)))
    freq = np.fft.rfftfreq(len(out) - 2000, 1 / sr2)
    assert abs(freq[np.argmax(spec)] - f0) < 2.0
    # amplitude preserved within passband
    assert 0.9 < np.abs(out[2000:-2000]).max() <= 1.05


def test_resample_identity():
    wav = np.random.default_rng(0).standard_normal((1, 1000)).astype(np.float32)
    out = resample(jnp.asarray(wav), 16000, 16000)
    np.testing.assert_array_equal(np.asarray(out), wav)
