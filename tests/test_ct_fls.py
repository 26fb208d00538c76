"""C_T and FLS metric behavior tests with synthetic oracles."""

import numpy as np
import pytest

from faceposegenerator_tpu.evaluation.metrics import ct_score, fls
from faceposegenerator_tpu.evaluation.dgm import compute_scores


def _gauss(n, d=8, shift=0.0, seed=0):
    return np.random.default_rng(seed).standard_normal((n, d)) + shift


def test_ct_copying_is_negative():
    train = _gauss(400, seed=0)
    test = _gauss(200, seed=1)
    copies = train[:200] + 1e-4  # near-exact training copies
    out = ct_score(train, test, copies, num_cells=3)
    assert out["ct"] < -2.0  # strong data-copying signal
    calibrated = _gauss(200, seed=2)
    out2 = ct_score(train, test, calibrated, num_cells=3)
    assert abs(out2["ct"]) < 3.0
    assert out2["ct"] > out["ct"]


def test_ct_mode_collapse_counts_cells():
    train = np.concatenate([_gauss(200, shift=0, seed=0), _gauss(200, shift=8, seed=1)])
    test = np.concatenate([_gauss(100, shift=0, seed=2), _gauss(100, shift=8, seed=3)])
    gen = _gauss(200, shift=0, seed=4)  # only covers one mode
    out = ct_score(train, test, gen, num_cells=2)
    assert out["ct_mode"] >= 1


def test_fls_prefers_matching_distribution():
    train = _gauss(300, seed=0)
    test = _gauss(300, seed=1)
    good = _gauss(300, seed=2)
    bad = _gauss(300, shift=5.0, seed=3)
    s_good = fls(train, test, good)
    s_bad = fls(train, test, bad)
    assert s_good["fls"] > s_bad["fls"]


def test_fls_overfit_detects_copies():
    train = _gauss(300, seed=0)
    test = _gauss(300, seed=1)
    copies = train[:300] + 1e-5
    s = fls(train, test, copies)
    honest = fls(train, test, _gauss(300, seed=2))
    assert s["fls_overfit"] > honest["fls_overfit"]
    assert s["fls_overfit"] > 0.1


def test_compute_scores_ct_fls_dispatch():
    train = _gauss(200, seed=0)
    test = _gauss(100, seed=1)
    gen = _gauss(100, seed=2)
    out = compute_scores(["ct", "fls"], train, gen, reps_test=test)
    assert "ct" in out and "fls" in out and "fls_overfit" in out
    # silently skipped without a test set (reference behavior)
    out2 = compute_scores(["ct", "fls", "fd"], train, gen)
    assert "ct" not in out2 and "fd" in out2
