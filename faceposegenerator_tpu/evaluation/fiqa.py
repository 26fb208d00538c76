"""CR-FIQA face image quality assessment.

Behavioral rebuild of `Evaluation/CR-FIQA/getQualityScore_FR_ID-Booth_12-2024.py`
(+ its iresnet with the extra quality head, `iresnet.py:123,178-179`): an
IResNet-50/100 backbone whose head emits both the 512-d embedding and a
scalar quality score from a linear `qs` layer applied to the same flattened
post-bn2 feature map as the embedding fc. Scores per dataset are written as
`path score` lines, ≤10k sampled images, batch 16 (`:149-231` operating
point, `QualityModel:78`, `FaceModel.get_batch_feature:42`).
"""

from __future__ import annotations

import os
import random
from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..core.precision import Policy, DEFAULT_POLICY
from ..models import iresnet


def init_qs_head(key: jax.Array, fc_in: int = 512 * 49, dtype=jnp.float32):
    """The CR-FIQA quality head: linear (512·7·7 → 1)."""
    return {
        "w": jax.random.normal(key, (1, fc_in), dtype) * (1.0 / fc_in) ** 0.5,
        "b": jnp.zeros((1,), dtype),
    }


def convert_qs_from_state_dict(sd) -> dict:
    """Pull the `qs.weight`/`qs.bias` tensors from a CR-FIQA checkpoint.
    Like the backbone fc, the flatten order needs the (c,h,w)→(h,w,c)
    permutation (see bridge.convert_iresnet_state_dict)."""
    w = np.asarray(sd["qs.weight"])
    side = int(round((w.shape[1] // 512) ** 0.5))
    w = w.reshape(1, 512, side, side).transpose(0, 2, 3, 1).reshape(1, -1)
    return {"w": jnp.asarray(w), "b": jnp.asarray(sd["qs.bias"])}


def make_quality_fn(
    params,
    state,
    qs_params,
    cfg: iresnet.IResNetConfig = iresnet.config_for("r100"),
    policy: Policy = DEFAULT_POLICY,
):
    """Jitted (B,112,112,3) [-1,1] -> (embedding (B,512), quality (B,))."""

    @jax.jit
    def quality(x):
        emb, _, feats = iresnet.apply(
            params, state, x, cfg, policy=policy, train=False, return_features=True
        )
        qs = feats @ qs_params["w"].astype(jnp.float32).T + qs_params["b"].astype(jnp.float32)
        return emb, qs[:, 0]

    return quality


def make_quality_fn_u8(
    params,
    state,
    qs_params,
    cfg: iresnet.IResNetConfig = iresnet.config_for("r100"),
    policy: Policy = DEFAULT_POLICY,
):
    """Jitted uint8 (B,H,W,3) ANY-resolution -> (embedding, quality).

    The whole preprocessing chain (resize→normalize) runs ON DEVICE so the
    in-memory sweep path never round-trips images through PNG files or host
    PIL resizes (VERDICT r2 #1). Resize is device bilinear — the documented
    deviation from the file path's PIL resize (identical when inputs are
    already 112²)."""
    from ..ops.image import resize_bilinear

    @jax.jit
    def quality(x_u8):
        x = x_u8.astype(jnp.float32)
        if x.shape[1] != 112 or x.shape[2] != 112:
            x = resize_bilinear(x, (112, 112))
        x = (x / 255.0 - 0.5) / 0.5
        emb, _, feats = iresnet.apply(
            params, state, x, cfg, policy=policy, train=False, return_features=True
        )
        qs = feats @ qs_params["w"].astype(jnp.float32).T + qs_params["b"].astype(jnp.float32)
        return emb, qs[:, 0]

    return quality


def score_images(
    images_u8,
    names,
    quality_fn_u8: Callable,
    output_path: str | None = None,
    batch_size: int = 0,
) -> Dict[str, float]:
    """Score in-memory uint8 images (device or host arrays) — the streaming
    counterpart of `score_dataset` for generate→eval pipelines that never
    touch disk. `batch_size=0` scores the whole array in one device call."""
    n = len(names)
    assert images_u8.shape[0] == n
    qs_parts = []
    step = batch_size or n
    for start in range(0, n, step):
        _, qs = quality_fn_u8(images_u8[start : start + step])
        qs_parts.append(qs)  # keep on device; force once at the end
    qs_all = np.asarray(jnp.concatenate(qs_parts)) if qs_parts else np.zeros((0,))
    scores = {str(p): float(s) for p, s in zip(names, qs_all)}
    if output_path:
        os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
        with open(output_path, "w") as out:
            for p in names:
                out.write(f"{p} {scores[str(p)]}\n")
    return scores


def score_dataset(
    image_dir: str,
    quality_fn: Callable,
    output_path: str,
    max_images: int = 10000,
    batch_size: int = 16,
    seed: int = 0,
) -> Dict[str, float]:
    """Score ≤max_images sampled images; write `path score` lines."""
    from PIL import Image

    paths: List[str] = []
    for root, _, files in os.walk(image_dir):
        for f in files:
            if f.lower().endswith((".jpg", ".jpeg", ".png")):
                paths.append(os.path.join(root, f))
    paths.sort()
    rng = random.Random(seed)
    if len(paths) > max_images:
        paths = rng.sample(paths, max_images)

    scores: Dict[str, float] = {}
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    with open(output_path, "w") as out:
        for start in range(0, len(paths), batch_size):
            chunk = paths[start : start + batch_size]
            imgs = []
            for p in chunk:
                a = np.asarray(Image.open(p).convert("RGB").resize((112, 112)), np.float32)
                imgs.append((a / 255.0 - 0.5) / 0.5)
            _, qs = quality_fn(np.stack(imgs))
            for p, s in zip(chunk, np.asarray(qs)):
                scores[p] = float(s)
                out.write(f"{p} {float(s)}\n")
    return scores
