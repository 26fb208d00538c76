"""Analysis plot/table helpers."""

import os

import numpy as np

from faceposegenerator_tpu.evaluation.analysis import (
    mean_std_latex_table,
    plot_det,
    plot_distributions,
    plot_roc,
)
from faceposegenerator_tpu.evaluation.eer import get_eer_stats


def test_plots_and_table(tmp_path):
    rng = np.random.default_rng(0)
    st = {
        "A": get_eer_stats(rng.normal(1, 0.2, 500), rng.normal(0, 0.2, 500)),
        "B": get_eer_stats(rng.normal(0.5, 0.3, 500), rng.normal(0, 0.3, 500)),
    }
    roc = str(tmp_path / "roc.png")
    det = str(tmp_path / "det.png")
    plot_roc(st, roc)
    plot_det(st, det)
    dist = str(tmp_path / "dist.png")
    plot_distributions({"gen": rng.normal(1, 0.2, 500), "imp": rng.normal(0, 0.2, 500)}, dist)
    # matplotlib present → png files; absent → npz fallback
    assert any(os.path.exists(p) or os.path.exists(os.path.splitext(p)[0] + ".npz") for p in (roc,))
    assert any(os.path.exists(p) or os.path.exists(os.path.splitext(p)[0] + ".npz") for p in (dist,))

    tex = mean_std_latex_table(
        {"ID-Booth": {"pitch": [1.0, 2.0], "yaw": [0.0, 4.0]}},
        ["pitch", "yaw", "roll"],
        str(tmp_path / "t.tex"),
    )
    assert "ID-Booth" in tex and "\\pm" in tex and "--" in tex
    assert os.path.exists(tmp_path / "t.tex")
