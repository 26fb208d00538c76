"""RepVGG backbone (deploy mode) in functional JAX, NHWC.

Backbone of the 6DRepNet head-pose estimator the reference uses for pose
statistics (`Evaluation/PoseEstimation/estimate_head_pose_ID-Booth.ipynb`,
`pip install sixdrepnet` → RepVGG-B1g2). Deploy-mode RepVGG is a plain
stack of 3×3 conv+ReLU (the train-time 3×3/1×1/identity branches fold into
one kernel); `fuse_branches` implements that re-parameterisation so
train-mode torch checkpoints convert losslessly.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class RepVGGConfig:
    num_blocks: Sequence[int] = (4, 6, 16, 1)  # B-series
    width_multiplier: Sequence[float] = (2.0, 2.0, 2.0, 4.0)  # B1
    group_every_other: bool = True  # "g2": groups=2 on odd-indexed layers
    groups: int = 2


REPVGG_B1G2 = RepVGGConfig()
BASE_WIDTHS = (64, 128, 256, 512)


def _widths(cfg: RepVGGConfig):
    return [min(64, int(64 * cfg.width_multiplier[0]))] + [
        int(b * m) for b, m in zip(BASE_WIDTHS[1:], cfg.width_multiplier[1:])
    ]


def _layer_plan(cfg: RepVGGConfig):
    """[(cin, cout, stride, groups)] for stage0 + 4 stages."""
    w = _widths(cfg)
    stage0_out = min(64, int(64 * cfg.width_multiplier[0]))
    plan = [(3, stage0_out, 2, 1)]
    cin = stage0_out
    layer_idx = 1  # global conv index for the g2 pattern
    widths4 = [int(64 * cfg.width_multiplier[0])] + w[1:]
    for stage, n in enumerate(cfg.num_blocks):
        cout = widths4[stage]
        for b in range(n):
            stride = 2 if b == 0 else 1
            g = cfg.groups if (cfg.group_every_other and layer_idx % 2 == 0 and cfg.groups > 1) else 1
            plan.append((cin, cout, stride, g))
            cin = cout
            layer_idx += 1
    return plan


def init(key: jax.Array, cfg: RepVGGConfig = REPVGG_B1G2, dtype=jnp.float32):
    plan = _layer_plan(cfg)
    keys = jax.random.split(key, len(plan))
    layers = []
    for k, (cin, cout, stride, g) in zip(keys, plan):
        fan = 9 * cin // g
        layers.append(
            {
                "w": jax.random.normal(k, (3, 3, cin // g, cout), dtype) * (2.0 / fan) ** 0.5,
                "b": jnp.zeros((cout,), dtype),
                "stride": stride,
                "groups": g,
            }
        )
    return {"layers": layers}


def apply(params, x: jax.Array, cfg: RepVGGConfig = REPVGG_B1G2) -> jax.Array:
    """(B, H, W, 3) -> (B, C) global-average-pooled features."""
    for layer in params["layers"]:
        dn = jax.lax.conv_dimension_numbers(x.shape, layer["w"].shape, ("NHWC", "HWIO", "NHWC"))
        x = jax.lax.conv_general_dilated(
            x, layer["w"].astype(x.dtype),
            window_strides=(layer["stride"], layer["stride"]),
            padding=((1, 1), (1, 1)),
            dimension_numbers=dn,
            feature_group_count=layer["groups"],
        )
        x = jax.nn.relu(x + layer["b"].astype(x.dtype))
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2))


def fuse_branches(
    w3: np.ndarray, bn3: Dict, w1: Optional[np.ndarray], bn1: Optional[Dict],
    bnid: Optional[Dict], groups: int = 1, eps: float = 1e-5,
) -> tuple:
    """Fold RepVGG train-time branches into a single 3×3 conv (OIHW in,
    OIHW out): conv3x3+BN ⊕ conv1x1+BN (padded) ⊕ identity-BN (as conv)."""

    def fuse(w, bn):
        std = np.sqrt(bn["var"] + eps)
        scale = bn["g"] / std
        return w * scale[:, None, None, None], bn["b"] - bn["mean"] * scale

    wsum, bsum = fuse(w3, bn3)
    if w1 is not None:
        wf, bf = fuse(np.pad(w1, ((0, 0), (0, 0), (1, 1), (1, 1))), bn1)
        wsum, bsum = wsum + wf, bsum + bf
    if bnid is not None:
        cout, cin_g = w3.shape[:2]
        wid = np.zeros_like(w3)
        for i in range(cout):
            wid[i, i % cin_g, 1, 1] = 1.0
        wf, bf = fuse(wid, bnid)
        wsum, bsum = wsum + wf, bsum + bf
    return wsum, bsum
