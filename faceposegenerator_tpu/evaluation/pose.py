"""Head-pose estimation (6DRepNet-style) + pose-diversity statistics.

Behavioral rebuild of the reference pose harness
(`Evaluation/PoseEstimation/estimate_head_pose_ID-Booth.ipynb`):
`SixDRepNet().predict(img)` per image with a 30px border pad, aggregated to
global and per-identity pitch/yaw/roll distributions saved as JSON, feeding
the mean±std and per-ID-std ("pose diversity") tables.

The model: RepVGG backbone → linear 6D rotation head; the continuous-6D →
rotation-matrix (Gram-Schmidt) and rotation → Euler conversions are exact
math, implemented in jnp and unit-tested analytically.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import repvgg


def rotation_from_ortho6d(poses: jax.Array) -> jax.Array:
    """(B, 6) continuous rotation representation -> (B, 3, 3) via
    Gram-Schmidt (Zhou et al., the 6DRepNet parameterisation).

    Basis vectors are stacked as COLUMNS, matching 6DRepNet's
    `compute_rotation_matrix_from_ortho6d` (`torch.cat((x, y, z), 2)`), so
    `euler_from_rotation` reads the same pitch/yaw/roll a bridged real
    checkpoint would produce (sixdrepnet utils semantics)."""
    a1, a2 = poses[:, :3], poses[:, 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=1, keepdims=True), 1e-8)
    proj = jnp.sum(b1 * a2, axis=1, keepdims=True) * b1
    b2 = a2 - proj
    b2 = b2 / jnp.maximum(jnp.linalg.norm(b2, axis=1, keepdims=True), 1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)  # columns


def euler_from_rotation(r: jax.Array) -> jax.Array:
    """(B, 3, 3) -> (B, 3) [pitch, yaw, roll] in degrees (6DRepNet's
    ZYX-style extraction with gimbal handling)."""
    sy = jnp.sqrt(r[:, 0, 0] ** 2 + r[:, 1, 0] ** 2)
    singular = sy < 1e-6
    x = jnp.arctan2(r[:, 2, 1], r[:, 2, 2])
    y = jnp.arctan2(-r[:, 2, 0], sy)
    z = jnp.arctan2(r[:, 1, 0], r[:, 0, 0])
    xs = jnp.arctan2(-r[:, 1, 2], r[:, 1, 1])
    zs = jnp.zeros_like(z)
    x = jnp.where(singular, xs, x)
    z = jnp.where(singular, zs, z)
    deg = 180.0 / jnp.pi
    return jnp.stack([x * deg, y * deg, z * deg], axis=1)


def init_sixdrepnet(key: jax.Array, cfg: repvgg.RepVGGConfig = repvgg.REPVGG_B1G2):
    k1, k2 = jax.random.split(key)
    backbone = repvgg.init(k1, cfg)
    feat_dim = backbone["layers"][-1]["w"].shape[-1]
    head = {
        "w": jax.random.normal(k2, (6, feat_dim)) * (1.0 / feat_dim) ** 0.5,
        "b": jnp.zeros((6,)),
    }
    return {"backbone": backbone, "head": head}


def make_pose_fn(params, cfg: repvgg.RepVGGConfig = repvgg.REPVGG_B1G2):
    """Jitted (B, 224, 224, 3) imagenet-normalized -> (B, 3) degrees."""

    @jax.jit
    def pose(x):
        feats = repvgg.apply(params["backbone"], x, cfg)
        sixd = feats @ params["head"]["w"].T + params["head"]["b"]
        return euler_from_rotation(rotation_from_ortho6d(sixd))

    return pose


def make_pose_fn_u8(
    params,
    cfg: repvgg.RepVGGConfig = repvgg.REPVGG_B1G2,
    pad: int = 30,
    size: int = 224,
):
    """Jitted uint8 (B,H,W,3) ANY-resolution -> (B, 3) degrees.

    Device-side preprocessing (edge-pad 30px → bilinear resize 224 →
    imagenet norm) so the in-memory sweep path skips the PNG round-trip and
    host PIL work of `preprocess_for_pose` (VERDICT r2 #1)."""
    from ..ops.image import resize_bilinear

    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)

    @jax.jit
    def pose(x_u8):
        x = x_u8.astype(jnp.float32)
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
        x = resize_bilinear(x, (size, size))
        x = (x / 255.0 - mean) / std
        feats = repvgg.apply(params["backbone"], x, cfg)
        sixd = feats @ params["head"]["w"].T + params["head"]["b"]
        return euler_from_rotation(rotation_from_ortho6d(sixd))

    return pose


def poses_for_images(
    images_u8,
    idents,
    pose_fn_u8: Callable,
    batch_size: int = 0,
) -> Dict[str, List[List[float]]]:
    """Per-identity pose lists from in-memory uint8 images — the streaming
    counterpart of `estimate_dataset_poses` for generate→eval pipelines.
    Device results are forced ONCE at the end, so callers can keep the
    device busy with the next generation batch meanwhile."""
    n = len(idents)
    parts = []
    step = batch_size or n
    for start in range(0, n, step):
        parts.append(pose_fn_u8(images_u8[start : start + step]))
    all_poses = np.asarray(jnp.concatenate(parts)) if parts else np.zeros((0, 3))
    per_id: Dict[str, List[List[float]]] = {}
    for ident, p in zip(idents, all_poses):
        per_id.setdefault(str(ident), []).append([float(v) for v in p])
    return per_id


def aggregate_poses(
    per_id: Dict[str, List[List[float]]],
    output_json: Optional[str] = None,
) -> Dict:
    """Global + per-identity pitch/yaw/roll statistics and the pose-diversity
    number (mean over identities of per-ID std — the paper table)."""
    all_poses = np.array([p for v in per_id.values() for p in v]) if per_id else np.zeros((0, 3))
    result = {
        "global": {
            "mean": all_poses.mean(0).tolist() if len(all_poses) else [0, 0, 0],
            "std": all_poses.std(0).tolist() if len(all_poses) else [0, 0, 0],
            "count": int(len(all_poses)),
        },
        "per_id": {
            k: {
                "mean": np.mean(v, 0).tolist(),
                "std": np.std(v, 0).tolist(),
                "poses": v,
            }
            for k, v in per_id.items()
        },
    }
    if per_id:
        stds = np.array([np.std(v, 0) for v in per_id.values()])
        result["pose_diversity"] = stds.mean(0).tolist()
    if output_json:
        os.makedirs(os.path.dirname(output_json) or ".", exist_ok=True)
        with open(output_json, "w") as f:
            json.dump(result, f, indent=2)
    return result


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess_for_pose(img: np.ndarray, pad: int = 30, size: int = 224) -> np.ndarray:
    """uint8 HWC → padded (reference pads 30px each side), resized,
    imagenet-normalized fp32."""
    from PIL import Image

    padded = np.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    resized = np.asarray(Image.fromarray(padded).resize((size, size), Image.BILINEAR), np.float32)
    return (resized / 255.0 - IMAGENET_MEAN) / IMAGENET_STD


def estimate_dataset_poses(
    image_root: str,
    pose_fn: Callable,
    output_json: Optional[str] = None,
    batch_size: int = 32,
) -> Dict:
    """Walk `<root>/<identity>/*.png|jpg`, estimate per-image pose, and
    aggregate global + per-identity distributions (the notebook's JSON)."""
    from PIL import Image

    per_id: Dict[str, List[List[float]]] = {}
    batch, meta = [], []

    def flush():
        if not batch:
            return
        poses = np.asarray(pose_fn(np.stack(batch)))
        for (ident, _), p in zip(meta, poses):
            per_id.setdefault(ident, []).append([float(v) for v in p])
        batch.clear()
        meta.clear()

    for ident in sorted(os.listdir(image_root)):
        folder = os.path.join(image_root, ident)
        if not os.path.isdir(folder):
            continue
        for f in sorted(os.listdir(folder)):
            if not f.lower().endswith((".jpg", ".jpeg", ".png")):
                continue
            img = np.asarray(Image.open(os.path.join(folder, f)).convert("RGB"))
            batch.append(preprocess_for_pose(img))
            meta.append((ident, f))
            if len(batch) == batch_size:
                flush()
    flush()

    return aggregate_poses(per_id, output_json)
