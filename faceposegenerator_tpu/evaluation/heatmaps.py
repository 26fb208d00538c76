"""FD-sensitivity heatmaps.

Rebuild of `Evaluation/dgm-eval/dgm_eval/heatmaps/` (the optional
`--heatmaps` flag): visualize which regions of a generated image push the
Fréchet distance up. TWO mechanisms:

1. `GradCAM` — the reference's exact mechanism (leave-one-out FD loss
   back-propagated to a late encoder layer, heatmap = Σ_c mean(grad²)_c·A_c)
   ported hook-free via a functional `tap` threaded through the encoder.
2. `make_heatmap_fn` — an input-gradient alternative unique to the JAX
   build: the exact per-pixel gradient of the per-sample Mahalanobis
   distance to the real-feature Gaussian (finer-grained than layer-level
   CAM; kept because the encoder is differentiable end-to-end here).
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


# ---------------------------------------------------------------------------
# GradCAM (the reference mechanism, hook-free)
# ---------------------------------------------------------------------------
#
# Faithful port of `Evaluation/dgm-eval/dgm_eval/heatmaps/gradcam.py`: the
# FD-sensitivity loss is the 2-Wasserstein distance between the real-feature
# Gaussian and the gen statistics UPDATED with the probed image (leave-one-
# out), back-propagated to a late encoder layer; the heatmap is
# Σ_c mean(grad²)_c · A_c over that layer's activation A (`gradcam.py:69-83`).
#
# torch gets (A, dA) via forward/backward hooks; functionally we thread a
# `tap` closure through the encoder (`models/inception_v3.apply` /
# `models/dinov2.apply`) that captures A and adds a zero perturbation ε, and
# take grad w.r.t. ε — mathematically the hook gradient.
#
# The reference's eigen-term `Σ√|eig(C_g·C_r)|` (`gradcam.py:158-161`) is
# rewritten on the similar symmetric matrix √C_r·C_g·√C_r so it lowers to
# `eigvalsh`, which is differentiable on TPU (non-symmetric eig is not).


def w2_gaussian_loss(mu_real, cov_real_sqrt, tr_cov_real, mu_gen, cov_gen, eps=1e-12):
    """2-Wasserstein²(N(μ_r, C_r), N(μ_g, C_g)) with C_r constant
    (cov_real_sqrt = C_r^{1/2}); differentiable in (μ_g, C_g)."""
    mean_term = jnp.sum(jnp.square(mu_real - mu_gen))
    m = cov_real_sqrt @ cov_gen @ cov_real_sqrt
    ev = jnp.linalg.eigvalsh((m + m.T) / 2.0)
    cov_term = tr_cov_real + jnp.trace(cov_gen) - 2.0 * jnp.sum(
        jnp.sqrt(jnp.abs(ev) + eps)
    )
    return mean_term + cov_term


class GradCAM:
    """`gradcam.GradCAM` equivalent.

    encode_with_tap(images, tap) -> (B, D) features, calling `tap` at the
    encoder's GradCAM target layer (see `make_inception_gradcam_encoder` /
    `make_dinov2_gradcam_encoder`)."""

    def __init__(self, encode_with_tap: Callable, reps_real: np.ndarray, reps_gen: np.ndarray):
        self._encode = encode_with_tap
        self.reps_gen = np.asarray(reps_gen, np.float64)
        mu = reps_real.mean(axis=0)
        cov = np.cov(reps_real, rowvar=False)
        w, v = np.linalg.eigh(cov)
        sqrt = (v * np.sqrt(np.clip(w, 0.0, None))) @ v.T
        self._mu_r = jnp.asarray(mu, jnp.float32)
        self._cov_r_sqrt = jnp.asarray(sqrt, jnp.float32)
        self._tr_cov_r = jnp.asarray(np.trace(cov), jnp.float32)
        self._mu_r64, self._cov_r64 = mu, cov

    def _loss_from_feats(self, feats, mean_gen, cov_gen, n):
        # update gen statistics with the probed image (`gradcam.py:42-46`)
        mean = ((n - 1) / n) * mean_gen + (1.0 / n) * feats[0]
        d = feats - mean_gen[None]
        cov = ((n - 2) / (n - 1)) * cov_gen + (1.0 / n) * (d.T @ d)
        return w2_gaussian_loss(
            self._mu_r, self._cov_r_sqrt, self._tr_cov_r, mean, cov
        )

    def get_map(self, image: np.ndarray, idx: int):
        """image: (1, H, W, 3) preprocessed encoder input. Returns
        (heatmap (h, w) in [0, 1], delta_fid)."""
        loo = np.delete(self.reps_gen, idx, axis=0)
        mean_gen = jnp.asarray(loo.mean(axis=0), jnp.float32)
        cov_gen = jnp.asarray(np.cov(loo, rowvar=False), jnp.float32)
        n = float(len(self.reps_gen))
        original = float(
            w2_gaussian_loss(
                self._mu_r, self._cov_r_sqrt, self._tr_cov_r, mean_gen, cov_gen
            )
        )
        image = jnp.asarray(image, jnp.float32)

        # probe the target-layer activation shape with a broadcast-zero tap
        def fwd(images, eps):
            captured = {}

            def tap(a):
                captured["a"] = a
                return a + eps.astype(a.dtype)

            feats = self._encode(images, tap)
            return feats.astype(jnp.float32), captured["a"].astype(jnp.float32)

        _, act0 = fwd(image, jnp.zeros((1,), jnp.float32))

        def loss_of(eps):
            feats, act = fwd(image, eps)
            return self._loss_from_feats(feats, mean_gen, cov_gen, n), act

        (loss, act), grads = jax.value_and_grad(loss_of, has_aux=True)(
            jnp.zeros(act0.shape, jnp.float32)
        )
        heat = self._heatmap(np.asarray(act), np.asarray(grads))
        return heat, float(loss) - original

    @staticmethod
    def _heatmap(act: np.ndarray, grads: np.ndarray) -> np.ndarray:
        if act.ndim == 3:  # ViT (B, 1+N, D): drop CLS, fold tokens to a grid
            g = int(round((act.shape[1] - 1) ** 0.5))
            act = act[:, 1 : 1 + g * g].reshape(act.shape[0], g, g, -1)
            grads = grads[:, 1 : 1 + g * g].reshape(grads.shape[0], g, g, -1)
        # weights = per-channel mean of grad² (`gradcam.py:80-81`), NHWC here
        weights = np.mean(grads**2, axis=(1, 2), keepdims=True)
        heat = np.sum(weights * act, axis=-1)[0]
        lo, hi = heat.min(), heat.max()
        return (heat - lo) / max(hi - lo, 1e-12)


def make_inception_gradcam_encoder(params):
    """Tap at Mixed_7c (reference target 'blocks.3.2')."""
    from ..models import inception_v3

    def encode(images, tap):
        return inception_v3.apply(params, images, tap=tap)

    return encode


def make_dinov2_gradcam_encoder(params, cfg=None):
    """Tap at the last layer's norm1 (reference targets 'blocks.23.norm1'
    for BOTH dinov2 and mae — the MAE ViT shares this module)."""
    from ..models import dinov2

    cfg = cfg or dinov2.VITL14_CONFIG

    def encode(images, tap):
        return dinov2.cls_feature(params, images, cfg, tap=tap)

    return encode


def make_swav_gradcam_encoder(params):
    """Tap at the final bottleneck output (reference target 'layer4.2')."""
    import jax.numpy as jnp

    from ..models import resnet50

    def encode(images, tap):
        return resnet50.apply(params, images, tap=tap).astype(jnp.float32)

    return encode


def make_clip_gradcam_encoder(params, cfg):
    """Tap at the last resblock's ln_1 (reference target
    'visual.transformer.resblocks.11.ln_1')."""
    from ..models import clip_vision

    def encode(images, tap):
        return clip_vision.cls_feature(params, images, cfg, tap=tap)

    return encode


def make_convnext_gradcam_encoder(params, cfg):
    """Tap at the last stage's final block (reference target
    'stages.3.blocks.2')."""
    import jax.numpy as jnp

    from ..models import convnext

    def encode(images, tap):
        return convnext.apply(params, images, cfg, tap=tap).astype(jnp.float32)

    return encode


def visualize_heatmaps(
    images: np.ndarray,
    reps_real: np.ndarray,
    reps_gen: np.ndarray,
    encode_with_tap: Callable,
    output_path: str,
    indices=None,
    per_row: int = 4,
    seed: int = 0,
):
    """`heatmaps.visualize_heatmaps` equivalent: sample images, compute
    FD-sensitivity GradCAMs, write an overlay grid PNG."""
    import os

    from ..pipelines.sweep import save_image_grid

    cam = GradCAM(encode_with_tap, reps_real, reps_gen)
    rnd = np.random.RandomState(seed)
    if indices is None:
        k = min(per_row * per_row, len(images))
        indices = rnd.choice(np.arange(len(images)), size=k, replace=False)
    tiles = []
    for idx in indices:
        img = images[int(idx)]
        heat, _ = cam.get_map(img[None], int(idx))
        u8 = np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8) if img.dtype != np.uint8 else img
        tiles.append(overlay_heatmap(u8, heat))
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    save_image_grid(np.stack(tiles), output_path, per_row=per_row)
    return indices


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
