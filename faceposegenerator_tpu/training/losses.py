"""FR margin-penalty softmax heads in functional JAX.

Behavioral rebuild of `FR_training/utils/losses.py:32-204`: ArcFace
(additive angular margin), CosFace (additive cosine margin), ElasticCosFace
(per-sample N(m, std) margin, optional "plus" hardness-sorted assignment),
and AdaFace (norm-adaptive margin with EMA batch statistics of feature
norms). All heads share: L2-normalized embeddings × column-normalized kernel
→ clamped cosine logits, margin applied at the label column, scaled by s.

The kernel is (embedding_dim, num_classes), init N(0, 0.01) (AdaFace:
renormed uniform). Labels of -1 mean "no margin for this sample" (the
reference's partial-FC convention). Heads are pure functions; AdaFace
threads its EMA state explicitly.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp


def _l2(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def init_kernel(key, embedding_dim: int, num_classes: int, kind: str = "normal"):
    if kind == "normal":
        return jax.random.normal(key, (embedding_dim, num_classes)) * 0.01
    # AdaFace-style: uniform then column-renormalized
    k = jax.random.uniform(key, (embedding_dim, num_classes), minval=-1, maxval=1)
    return _l2(k, axis=0)


def _cosine(embeddings, kernel, eps=0.0):
    cos = _l2(embeddings, axis=1) @ _l2(kernel, axis=0)
    return jnp.clip(cos, -1.0 + eps, 1.0 - eps)


def _one_hot_margin(cos, labels, margin):
    """Add `margin` (scalar or per-sample) at the label column; labels == -1
    are skipped."""
    valid = labels >= 0
    oh = jax.nn.one_hot(jnp.maximum(labels, 0), cos.shape[1], dtype=cos.dtype)
    m = jnp.where(valid, margin if jnp.ndim(margin) else jnp.full_like(valid, margin, cos.dtype), 0.0)
    return oh * m[:, None]


def arcface_logits(kernel, embeddings, labels, s: float = 64.0, m: float = 0.5):
    cos = _cosine(embeddings, kernel)
    theta = jnp.arccos(cos)
    theta = theta + _one_hot_margin(cos, labels, m)
    return jnp.cos(theta) * s


def cosface_logits(kernel, embeddings, labels, s: float = 64.0, m: float = 0.35):
    cos = _cosine(embeddings, kernel)
    return (cos - _one_hot_margin(cos, labels, m)) * s


def elastic_cosface_logits(
    kernel, embeddings, labels, key, s: float = 64.0, m: float = 0.35,
    std: float = 0.0125, plus: bool = False,
):
    cos = _cosine(embeddings, kernel)
    margin = m + std * jax.random.normal(key, labels.shape)
    if plus:
        # reference scatter semantics (ElasticFace `ElasticCosFace.forward`,
        # FR_training/utils/losses.py:120-127): sample j receives
        # sorted_margin[order[j]] where order = argsort of target cosines
        # descending — index the ascending-sorted margins BY the argsort
        # (NOT the inverse rank mapping).
        target_cos = jnp.take_along_axis(cos, jnp.maximum(labels, 0)[:, None], 1)[:, 0]
        order = jnp.argsort(-target_cos)  # descending target-cosine argsort
        margin = jnp.sort(margin)[order]
    return (cos - _one_hot_margin(cos, labels, margin)) * s


@dataclasses.dataclass(frozen=True)
class AdaFaceConfig:
    m: float = 0.4
    h: float = 0.333
    s: float = 64.0
    t_alpha: float = 1.0  # reference default (train_FR.py:176 uses defaults)
    eps: float = 1e-3


def adaface_init_state():
    return {"batch_mean": jnp.array(20.0), "batch_std": jnp.array(100.0)}


def adaface_logits(
    kernel, embeddings, norms, labels, state, cfg: AdaFaceConfig = AdaFaceConfig(),
    train: bool = True,
) -> Tuple[jax.Array, dict]:
    """embeddings must already be L2-normalized; `norms` are the pre-norm
    feature magnitudes (the reference computes them in train_FR.py:277-288).
    Returns (scaled logits, new EMA state)."""
    cos = jnp.clip(embeddings @ _l2(kernel, axis=0), -1 + cfg.eps, 1 - cfg.eps)
    safe = jax.lax.stop_gradient(jnp.clip(norms, 0.001, 100.0))
    if train:
        mean = jnp.mean(safe)
        std = jnp.std(safe, ddof=1)
        new_state = {
            "batch_mean": cfg.t_alpha * mean + (1 - cfg.t_alpha) * state["batch_mean"],
            "batch_std": cfg.t_alpha * std + (1 - cfg.t_alpha) * state["batch_std"],
        }
    else:
        new_state = state
    scaler = (safe - new_state["batch_mean"]) / (new_state["batch_std"] + cfg.eps)
    scaler = jnp.clip(scaler * cfg.h, -1.0, 1.0)

    oh = jax.nn.one_hot(jnp.maximum(labels, 0), cos.shape[1], dtype=cos.dtype)
    g_angular = -cfg.m * scaler
    theta = jnp.arccos(cos)
    theta_m = jnp.clip(theta + oh * g_angular[:, None], cfg.eps, math.pi - cfg.eps)
    cos_m = jnp.cos(theta_m)
    g_add = cfg.m + cfg.m * scaler
    cos_m = cos_m - oh * g_add[:, None]
    return cos_m * cfg.s, new_state


def cross_entropy(logits, labels):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))


HEADS = {"arcface": arcface_logits, "cosface": cosface_logits}
