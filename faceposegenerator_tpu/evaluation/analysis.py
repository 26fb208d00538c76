"""Analysis plots & tables (matplotlib-gated, npz fallback).

Behavioral rebuild of the reference's analysis extras (SURVEY.md §2.4:
`Evaluation/PyEER_analysis/analysis_scripts/` distribution/log plots and the
pose notebook's KDE plots + LaTeX tables): per-dataset score/pose
distribution plots, DET/ROC curves from EER stats, and mean±std LaTeX table
emission.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

from .eer import EERStats


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_roc(stats: Dict[str, EERStats], path: str):
    """ROC curves (TAR vs FMR, log x) for several runs on one axis."""
    try:
        plt = _plt()
    except ImportError:
        np.savez(
            os.path.splitext(path)[0] + ".npz",
            **{f"{k}_fmr": s.fmr for k, s in stats.items()},
            **{f"{k}_fnmr": s.fnmr for k, s in stats.items()},
        )
        return
    fig, ax = plt.subplots(figsize=(6, 5))
    for name, s in stats.items():
        order = np.argsort(s.fmr)
        ax.plot(np.maximum(s.fmr[order], 1e-6), 1 - s.fnmr[order], label=f"{name} (EER {s.eer:.3f})")
    ax.set_xscale("log")
    ax.set_xlabel("FMR")
    ax.set_ylabel("TAR (1-FNMR)")
    ax.legend()
    fig.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path)
    plt.close(fig)


def plot_det(stats: Dict[str, EERStats], path: str):
    """DET curves (FNMR vs FMR, log-log)."""
    try:
        plt = _plt()
    except ImportError:
        return
    fig, ax = plt.subplots(figsize=(6, 5))
    for name, s in stats.items():
        order = np.argsort(s.fmr)
        ax.plot(np.maximum(s.fmr[order], 1e-6), np.maximum(s.fnmr[order], 1e-6), label=name)
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("FMR")
    ax.set_ylabel("FNMR")
    ax.legend()
    fig.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path)
    plt.close(fig)


def plot_distributions(series: Dict[str, np.ndarray], path: str, bins: int = 60, xlabel: str = ""):
    """Overlaid density histograms (the reference's score/pose KDE plots)."""
    try:
        plt = _plt()
    except ImportError:
        np.savez(os.path.splitext(path)[0] + ".npz", **series)
        return
    fig, ax = plt.subplots(figsize=(6, 4))
    for name, values in series.items():
        ax.hist(np.asarray(values).ravel(), bins=bins, density=True, alpha=0.5, label=name)
    ax.set_xlabel(xlabel)
    ax.legend()
    fig.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path)
    plt.close(fig)


def mean_std_latex_table(
    rows: Dict[str, Dict[str, Sequence[float]]],
    columns: Sequence[str],
    path: Optional[str] = None,
) -> str:
    """Pose-notebook-style mean±std LaTeX table: rows = {run: {col: values}}."""
    lines = [
        "\\begin{tabular}{l" + "c" * len(columns) + "}",
        " & " + " & ".join(columns) + " \\\\ \\hline",
    ]
    for name, cols in rows.items():
        cells = []
        for c in columns:
            v = np.asarray(cols.get(c, []), np.float64)
            cells.append(f"${v.mean():.2f} \\pm {v.std():.2f}$" if v.size else "--")
        lines.append(name.replace("_", "\\_") + " & " + " & ".join(cells) + " \\\\")
    lines.append("\\end{tabular}")
    out = "\n".join(lines)
    if path:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            f.write(out)
    return out


def plot_cmc(curves: Dict[str, np.ndarray], path: str):
    """CMC curves (identification rate vs rank) — `plot_cmc_stats`
    (`pyeer_scripts/plot.py:369`)."""
    try:
        plt = _plt()
    except ImportError:
        np.savez(os.path.splitext(path)[0] + ".npz", **curves)
        return
    fig, ax = plt.subplots(figsize=(6, 5))
    for name, curve in curves.items():
        ranks = np.arange(1, len(curve) + 1)
        ax.plot(ranks, curve, marker="o", markersize=3, label=name)
    ax.set_xlabel("Rank")
    ax.set_ylabel("Identification rate")
    ax.set_ylim(0, 1.02)
    ax.legend()
    fig.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path)
    plt.close(fig)
