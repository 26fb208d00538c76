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
