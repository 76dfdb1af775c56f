"""Parity of privacy metrics against the reference numpy implementations."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/anon/evaluation/privacy/asv/metrics")

from streamvoiceanon_tpu.evals import privacy_metrics as pm


@pytest.fixture(scope="module")
def scores(rng=None):
    r = np.random.default_rng(7)
    tar = r.normal(1.2, 0.8, 400)
    non = r.normal(-0.5, 1.0, 2500)
    return tar, non


def _ref_helpers():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_helpers", "/root/reference/anon/evaluation/privacy/asv/metrics/helpers.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parity
def test_pav_optimal_llr_parity(scores):
    tar, non = scores
    ref = _ref_helpers()
    t_ref, n_ref = ref.optimal_llr(tar, non)
    t, n = pm.optimal_llr(tar, non)
    np.testing.assert_allclose(t, t_ref, atol=1e-9)
    np.testing.assert_allclose(n, n_ref, atol=1e-9)


@pytest.mark.parity
def test_cllr_parity(scores):
    tar, non = scores
    ref = _ref_helpers()
    t_ref, n_ref = ref.optimal_llr(tar, non)

    def ref_cllr(t, n):
        from scipy.special import expit

        c1 = (-np.log(expit(t))).mean() / np.log(2)
        c2 = (-np.log(expit(-n))).mean() / np.log(2)
        return (c1 + c2) / 2

    np.testing.assert_allclose(pm.cllr(tar, non), ref_cllr(tar, non), atol=1e-12)
    np.testing.assert_allclose(pm.min_cllr(tar, non), ref_cllr(t_ref, n_ref), atol=1e-9)


@pytest.mark.parity
def test_linkability_parity(scores):
    tar, non = scores
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_link_mod",
        "/root/reference/anon/evaluation/privacy/asv/metrics/linkability.py",
    )
    # linkability.py imports drawing utils; bypass by transcribing its body
    n_bins = min(len(tar) // 10, 100)
    edges = np.linspace(min(tar.min(), non.min()), max(tar.max(), non.max()), n_bins + 1)
    centers = (edges[1:] + edges[:-1]) / 2
    y1 = np.histogram(tar, bins=edges, density=True)[0]
    y2 = np.histogram(non, bins=edges, density=True)[0]
    lr = np.divide(y1, y2, out=np.ones_like(y1), where=y2 != 0)
    d = 2 * (lr / (1 + lr)) - 1
    d[lr <= 1] = 0
    d[(y2 == 0) & (y1 != 0)] = 1
    want = np.trapezoid(d * y1, x=centers)
    np.testing.assert_allclose(pm.linkability(tar, non), want, atol=1e-12)


@pytest.mark.parity
def test_zebra_parity(scores):
    tar, non = scores
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_zebra", "/root/reference/anon/evaluation/privacy/asv/metrics/zebra.py"
    )
    zeb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(zeb)
    ref = _ref_helpers()
    t_llr, n_llr = ref.optimal_llr(tar, non)
    want_dece = zeb.dece(t_llr, n_llr)
    want_max = zeb.max_abs_LLR(t_llr, n_llr)
    dece, max_abs, tag = pm.zebra(tar, non)
    np.testing.assert_allclose(dece, want_dece, atol=1e-9)
    np.testing.assert_allclose(max_abs, want_max, atol=1e-9)
    assert tag in "0ABCDEF"


def test_eer_sanity():
    r = np.random.default_rng(0)
    tar = r.normal(2.0, 1.0, 1000)
    non = r.normal(-2.0, 1.0, 1000)
    e, _ = pm.eer(tar, non)
    assert 0.0 < e < 0.05
    # symmetric overlap -> ~50%
    e2, _ = pm.eer(r.normal(0, 1, 1000), r.normal(0, 1, 1000))
    assert 0.4 < e2 < 0.6


def test_asv_eer_from_embeddings():
    r = np.random.default_rng(1)
    centers = r.normal(0, 1, (10, 32))
    enroll = centers + r.normal(0, 0.2, (10, 32))
    trial = np.repeat(centers, 5, axis=0) + r.normal(0, 0.2, (50, 32))
    labels_e = np.arange(10)
    labels_t = np.repeat(np.arange(10), 5)
    e = pm.asv_eer_from_embeddings(enroll, trial, labels_e, labels_t)
    assert e < 0.1
