"""FD-sensitivity heatmaps (GradCAM-style visualization).

Behavioral rebuild of `Evaluation/dgm-eval/dgm_eval/heatmaps/` (the optional
`--heatmaps` flag): visualize which pixels of a generated image push the
Fréchet distance up. With a differentiable JAX encoder the saliency is the
exact input gradient of the per-sample FD contribution — no conv-hook
machinery needed:

    score(x) = (φ(x) − μ_real)ᵀ Σ_real⁻¹ (φ(x) − μ_real)   (Mahalanobis
    distance to the real-feature Gaussian), heatmap = |∂score/∂x| pooled
    over channels.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def fit_real_gaussian(reps_real: np.ndarray, eps: float = 1e-6):
    mu = reps_real.mean(axis=0)
    cov = np.cov(reps_real, rowvar=False) + eps * np.eye(reps_real.shape[1])
    prec = np.linalg.inv(cov)
    return jnp.asarray(mu, jnp.float32), jnp.asarray(prec, jnp.float32)


def make_heatmap_fn(encode_fn: Callable, mu: jax.Array, precision: jax.Array):
    """encode_fn: differentiable (B, H, W, C) fp32 -> (B, D). Returns
    heatmap_fn(images) -> (scores (B,), heatmaps (B, H, W) in [0, 1])."""

    def score(x):
        d = encode_fn(x) - mu[None]
        return jnp.einsum("bi,ij,bj->b", d, precision, d)

    @jax.jit
    def heatmap(images):
        scores = score(images)
        grads = jax.grad(lambda x: jnp.sum(score(x)))(images)
        sal = jnp.sum(jnp.abs(grads), axis=-1)  # (B, H, W)
        mx = jnp.max(sal, axis=(1, 2), keepdims=True)
        return scores, sal / jnp.maximum(mx, 1e-12)

    return heatmap


def overlay_heatmap(image: np.ndarray, heatmap: np.ndarray, alpha: float = 0.5) -> np.ndarray:
    """uint8 HWC image + (H, W) [0,1] heatmap -> red-overlay visualization."""
    h = np.asarray(heatmap)
    if h.shape != image.shape[:2]:
        from PIL import Image

        h = np.asarray(
            Image.fromarray((h * 255).astype(np.uint8)).resize(image.shape[:2][::-1])
        ) / 255.0
    overlay = image.astype(np.float32).copy()
    overlay[..., 0] = np.clip(overlay[..., 0] + alpha * 255 * h, 0, 255)
    return overlay.astype(np.uint8)
