"""Metric-harness regression tests with analytic oracles (SURVEY.md §4)."""

import numpy as np
import pytest

from faceposegenerator_tpu.evaluation.metrics import (
    frechet_distance,
    frechet_distance_inf,
    kernel_distance,
    mmd2_polynomial,
    prdc,
    vendi_score,
    per_class_vendi,
    authpct,
    inception_score_from_logits,
    sliced_wasserstein,
)
from faceposegenerator_tpu.evaluation.eer import get_eer_stats
from faceposegenerator_tpu.evaluation import pairs


def test_fd_zero_for_identical():
    x = np.random.default_rng(0).standard_normal((500, 16))
    assert frechet_distance(x, x) == pytest.approx(0.0, abs=1e-6)


def test_fd_mean_shift_analytic():
    """Same covariance, shifted mean: FD = ||Δμ||²."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((20000, 8))
    shift = np.full(8, 0.5)
    fd = frechet_distance(x, x + shift)
    assert fd == pytest.approx(float(shift @ shift), rel=0.05)


def test_fd_vs_scipy_sqrtm():
    import scipy.linalg

    rng = np.random.default_rng(2)
    x = rng.standard_normal((300, 6))
    y = 0.5 * rng.standard_normal((300, 6)) + 0.3
    mu1, s1 = x.mean(0), np.cov(x, rowvar=False)
    mu2, s2 = y.mean(0), np.cov(y, rowvar=False)
    covmean = scipy.linalg.sqrtm(s1 @ s2).real
    ref = float((mu1 - mu2) @ (mu1 - mu2) + np.trace(s1 + s2 - 2 * covmean))
    assert frechet_distance(x, y) == pytest.approx(ref, rel=1e-4)


def test_fd_inf_close_to_fd_for_big_n():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4000, 8))
    y = rng.standard_normal((4000, 8)) + 0.3
    fd = frechet_distance(x, y)
    fdinf = frechet_distance_inf(x, y, num_points=8, min_batch=1000)
    assert abs(fdinf - fd) < fd  # extrapolation stays in a sane range


def test_kid_zero_for_same_distribution():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2000, 16))
    y = rng.standard_normal((2000, 16))
    kid, _ = kernel_distance(x, y, n_subsets=20, subset_size=500)
    assert abs(kid) < 0.01
    z = rng.standard_normal((2000, 16)) + 1.0
    kid2, _ = kernel_distance(x, z, n_subsets=20, subset_size=500)
    assert kid2 > kid + 0.5


def test_mmd_unbiased_nonnegative_for_distinct():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((200, 8))
    y = rng.standard_normal((200, 8)) + 2.0
    assert mmd2_polynomial(x, y) > 0


def test_prdc_identical_sets():
    x = np.random.default_rng(6).standard_normal((200, 16))
    out = prdc(x, x.copy(), nearest_k=5)
    assert out["precision"] == 1.0
    assert out["recall"] == 1.0
    assert out["coverage"] == 1.0
    assert out["density"] > 0.9


def test_prdc_disjoint_sets():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((200, 16))
    y = rng.standard_normal((200, 16)) + 100.0
    out = prdc(x, y)
    assert out["precision"] == 0.0 and out["recall"] == 0.0
    assert out["coverage"] == 0.0


def test_prdc_realism_is_per_sample_vector():
    """The reference returns realism PER generated sample (aligned with file
    order — `dgm_eval/metrics/prdc.py:104-110`), not an aggregate scalar."""
    rng = np.random.default_rng(8)
    real = rng.standard_normal((100, 8))
    fake = rng.standard_normal((60, 8))
    out = prdc(real, fake, realism=True)
    r = np.asarray(out["realism"])
    assert r.shape == (60,)
    assert (r > 0).all()

    # oracle: literal reference formula
    from sklearn.metrics import pairwise_distances as pd

    d_rr = pd(real.astype(np.float32), real.astype(np.float32))
    d_rf = pd(real.astype(np.float32), fake.astype(np.float32))
    r_real = np.partition(d_rr, 5, axis=1)[:, 5]
    mask = r_real < np.median(r_real)
    expected = (r_real[mask, None] / d_rf[mask, :]).max(axis=0)
    np.testing.assert_allclose(r, expected, rtol=1e-5)


def test_vendi_extremes():
    eye = np.eye(16)
    assert vendi_score(eye, normalize=False) == pytest.approx(16.0, rel=1e-6)
    same = np.tile(np.ones(8), (10, 1))
    assert vendi_score(same) == pytest.approx(1.0, abs=1e-6)


def test_per_class_vendi():
    feats = np.concatenate([np.eye(4), np.tile(np.ones(4), (4, 1))])
    labels = np.array([0, 0, 0, 0, 1, 1, 1, 1])
    out = per_class_vendi(feats, labels)
    assert out["per_class"]["0"] == pytest.approx(4.0, rel=1e-5)
    assert out["per_class"]["1"] == pytest.approx(1.0, abs=1e-6)


def test_authpct_copies_vs_novel():
    rng = np.random.default_rng(9)
    real = rng.standard_normal((100, 8))
    copies = real + 1e-9
    assert authpct(real, copies) < 5.0
    novel = real + rng.standard_normal((100, 8)) * 10
    assert authpct(real, novel) > 90.0


def test_inception_score_extremes():
    uniform = np.zeros((100, 10))
    mean, _ = inception_score_from_logits(uniform, splits=5)
    assert mean == pytest.approx(1.0, abs=1e-5)
    confident = np.tile(np.eye(10), (10, 1)) * 50  # every split sees all classes
    mean2, _ = inception_score_from_logits(confident, splits=5)
    assert mean2 == pytest.approx(10.0, rel=1e-3)


def test_sliced_wasserstein_shift():
    rng = np.random.default_rng(10)
    x = rng.standard_normal((1000, 8))
    assert sliced_wasserstein(x, x) == pytest.approx(0.0, abs=1e-9)
    y = x + 1.0
    assert sliced_wasserstein(x, y) > 0.1


def test_eer_separable_and_overlapping():
    gen = np.linspace(0.8, 1.0, 200)
    imp = np.linspace(0.0, 0.2, 500)
    st = get_eer_stats(gen, imp)
    assert st.eer == pytest.approx(0.0, abs=1e-3)
    assert st.auc == pytest.approx(1.0, abs=1e-3)
    assert st.fdr > 10

    rng = np.random.default_rng(11)
    same = rng.standard_normal(2000)
    st2 = get_eer_stats(same, rng.standard_normal(2000))
    assert 0.45 < st2.eer < 0.55
    # FDR formula: (gmean-imean)^2/(gstd^2+istd^2)
    expect = (st2.gmean - st2.imean) ** 2 / (st2.gstd**2 + st2.istd**2)
    assert st2.fdr == pytest.approx(expect, rel=1e-9)


def test_pair_builders():
    rng = np.random.default_rng(12)
    by_id = {
        "0": rng.standard_normal((10, 8)),
        "1": rng.standard_normal((10, 8)),
        "2": rng.standard_normal((3, 8)),  # below min_samples → dropped
    }
    g, i = pairs.among_synth_pairs(by_id, min_samples=8, samples_skip=0)
    assert len(g) == 2 * (10 * 9 // 2)
    assert len(i) == 100  # one cross-id block, no skip

    g2, i2 = pairs.synth_vs_real_pairs(
        {"0": rng.standard_normal((4, 8)), "1": rng.standard_normal((4, 8))},
        {"0": rng.standard_normal((5, 8)), "1": rng.standard_normal((5, 8))},
        samples_skip=0,
    )
    assert len(g2) == 40 and len(i2) == 40

    grouped = pairs.group_by_identity(
        np.arange(8).reshape(4, 2), ["1_a.png", "1_b.png", "2_a.png", "2_b.png"]
    )
    assert set(grouped) == {"1", "2"} and grouped["1"].shape == (2, 2)
