"""Precision / Recall / Density / Coverage (+ realism).

Behavioral rebuild of `Evaluation/dgm-eval/dgm_eval/metrics/prdc.py:56-114`
(the layer6ai vendored PRDC): kNN-radius manifold estimates with k=5 by
default. Distances are computed blockwise with a jnp matmul core so the
O(N²) pairwise step rides the MXU instead of sklearn process pools
(SURVEY.md §2.5 "multi-process eval parallelism" → vectorized device ops).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

try:
    import jax
    import jax.numpy as jnp

    _HAS_JAX = True
except ImportError:  # pragma: no cover
    _HAS_JAX = False


def pairwise_distances(a: np.ndarray, b: np.ndarray, block: int = 4096) -> np.ndarray:
    """Euclidean distance matrix (N, M), blockwise on device."""
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    if _HAS_JAX:
        out = np.zeros((a.shape[0], b.shape[0]), np.float32)

        @jax.jit
        def _block(x, y):
            x2 = jnp.sum(x * x, axis=1, keepdims=True)
            y2 = jnp.sum(y * y, axis=1, keepdims=True)
            d2 = x2 + y2.T - 2 * (x @ y.T)
            return jnp.sqrt(jnp.maximum(d2, 0.0))

        for i in range(0, a.shape[0], block):
            for j in range(0, b.shape[0], block):
                out[i : i + block, j : j + block] = np.asarray(
                    _block(a[i : i + block], b[j : j + block])
                )
        return out
    d2 = (
        np.sum(a**2, 1)[:, None] + np.sum(b**2, 1)[None, :] - 2 * a @ b.T
    )
    return np.sqrt(np.maximum(d2, 0))


def _kth_radius(dist: np.ndarray, k: int) -> np.ndarray:
    """Distance to the k-th nearest neighbour (excluding self on the
    diagonal, which is distance 0 and occupies rank 0)."""
    return np.partition(dist, k, axis=1)[:, k]


def prdc(
    real_features: np.ndarray,
    fake_features: np.ndarray,
    nearest_k: int = 5,
    realism: bool = False,
) -> Dict[str, float]:
    real = np.asarray(real_features, np.float32)
    fake = np.asarray(fake_features, np.float32)
    # kth-neighbour needs k < n (self occupies rank 0)
    nearest_k = max(1, min(nearest_k, real.shape[0] - 1, fake.shape[0] - 1))

    d_rr = pairwise_distances(real, real)
    d_ff = pairwise_distances(fake, fake)
    d_rf = pairwise_distances(real, fake)

    r_real = _kth_radius(d_rr, nearest_k)  # (Nr,)
    r_fake = _kth_radius(d_ff, nearest_k)  # (Nf,)

    precision = float((d_rf < r_real[:, None]).any(axis=0).mean())
    recall = float((d_rf < r_fake[None, :]).any(axis=1).mean())
    density = float((1.0 / nearest_k) * (d_rf < r_real[:, None]).sum(axis=0).mean())
    coverage = float((d_rf.min(axis=1) < r_real).mean())

    out = {"precision": precision, "recall": recall, "density": density, "coverage": coverage}
    if realism:
        # per-fake max over real of r_real/d with median-filtered radii —
        # returns the PER-SAMPLE vector like the reference
        # (`dgm_eval/metrics/prdc.py:104-110`), not an aggregate
        mask = r_real < np.median(r_real)
        ratios = r_real[mask, None] / np.maximum(d_rf[mask, :], 1e-12)
        out["realism"] = ratios.max(axis=0)
    return out
