"""EER / biometric score statistics (pyeer-equivalent) + FDR.

Behavioral rebuild of the vendored pyeer surface the reference drives
(`Evaluation/PyEER_analysis/pyeer_scripts/eer_info.py:160` `get_eer_stats`
and the `Stats` fields consumed by `analyse_pyeer_ID-Booth.py:102-173`):
FMR/FNMR curves over the joint threshold grid, EER (low/high/interpolated),
AUC, FMR@{0, 100, 1000} operating points, score moments, decidability d',
and the Fisher Discriminant Ratio FDR = (gmean−imean)²/(gstd²+istd²)
(`analyse_pyeer_ID-Booth.py:60-61`).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np


@dataclasses.dataclass
class EERStats:
    thrs: np.ndarray
    fmr: np.ndarray
    fnmr: np.ndarray
    auc: float
    eer: float
    eer_low: float
    eer_high: float
    eer_th: float
    fmr0: float  # FNMR @ FMR=0
    fmr100: float  # FNMR @ FMR<=1%
    fmr1000: float  # FNMR @ FMR<=0.1%
    gmean: float
    gstd: float
    imean: float
    istd: float
    decidability: float
    fdr: float


def get_eer_stats(gen_scores: Sequence[float], imp_scores: Sequence[float]) -> EERStats:
    """Similarity-score convention (higher = more genuine), matching the
    cosine-similarity inputs the reference feeds pyeer."""
    gen = np.sort(np.asarray(gen_scores, np.float64))
    imp = np.sort(np.asarray(imp_scores, np.float64))
    thrs = np.unique(np.concatenate([gen, imp]))

    # FMR: fraction of impostors >= thr; FNMR: fraction of genuines < thr
    fmr = 1.0 - np.searchsorted(imp, thrs, side="left") / len(imp)
    fnmr = np.searchsorted(gen, thrs, side="left") / len(gen)

    diff = fmr - fnmr
    idx = int(np.argmin(np.abs(diff)))
    eer_low = min(fmr[idx], fnmr[idx])
    eer_high = max(fmr[idx], fnmr[idx])
    eer = (fmr[idx] + fnmr[idx]) / 2

    # AUC of the ROC (TAR=1-FNMR vs FMR). Walking thresholds DESCENDING makes
    # both FMR and TAR monotone nondecreasing — the proper ROC staircase
    # (sorting by FMR alone breaks tie ordering and under-integrates).
    # Endpoints (0,·) and (1,1) are covered since thrs spans all scores.
    desc = np.argsort(-thrs)
    roc_fmr = np.concatenate([[0.0], fmr[desc], [1.0]])
    roc_tar = np.concatenate([[0.0], (1.0 - fnmr)[desc], [1.0]])
    auc = float(np.trapezoid(roc_tar, roc_fmr))

    def fnmr_at(fmr_target):
        ok = np.where(fmr <= fmr_target)[0]
        return float(fnmr[ok[0]]) if len(ok) else 1.0

    gmean, gstd = float(gen.mean()), float(gen.std())
    imean, istd = float(imp.mean()), float(imp.std())
    denom = np.sqrt(0.5 * (gstd**2 + istd**2))
    decidability = float(abs(gmean - imean) / denom) if denom > 0 else 0.0
    fdr_denom = gstd**2 + istd**2
    fdr = float((gmean - imean) ** 2 / fdr_denom) if fdr_denom > 0 else 0.0

    return EERStats(
        thrs=thrs, fmr=fmr, fnmr=fnmr, auc=auc, eer=float(eer),
        eer_low=float(eer_low), eer_high=float(eer_high), eer_th=float(thrs[idx]),
        fmr0=fnmr_at(0.0), fmr100=fnmr_at(0.01), fmr1000=fnmr_at(0.001),
        gmean=gmean, gstd=gstd, imean=imean, istd=istd,
        decidability=decidability, fdr=fdr,
    )
