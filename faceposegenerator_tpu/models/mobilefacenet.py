"""MobileFaceNet face embedder in functional JAX, NHWC.

Behavioral rebuild of `ArcFace_files/backbones/mobilefacenet.py` (`get_mbf`,
blocks=(1, 4, 6, 2), scale=2): ConvBlock (conv+BN+PReLU) stem, depthwise
bottleneck DepthWise blocks (1x1 expand → 3x3 depthwise → 1x1 project,
residual inside `Residual` groups), 1x1 sep conv to 512, GDC head (7x7
depthwise → flatten → linear → BN). Inference-mode BN (frozen embedder
use-case); training-mode support mirrors iresnet's if needed later.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from ..core.precision import Policy, DEFAULT_POLICY
from ..ops.norms import batch_norm_inference


@dataclasses.dataclass(frozen=True)
class MBFConfig:
    blocks: Sequence[int] = (1, 4, 6, 2)
    scale: int = 2
    num_features: int = 512
    bn_eps: float = 1e-5


def _conv_bn_init(key, kh, kw, cin, cout, groups=1, dtype=jnp.float32, prelu=True):
    fan = kh * kw * cin // groups
    p = {
        "w": jax.random.normal(key, (kh, kw, cin // groups, cout), dtype) * (2.0 / fan) ** 0.5,
        "groups": groups,
        "bn": {"g": jnp.ones((cout,), dtype), "b": jnp.zeros((cout,), dtype)},
    }
    s = {"mean": jnp.zeros((cout,), dtype), "var": jnp.ones((cout,), dtype)}
    if prelu:
        p["prelu"] = jnp.full((cout,), 0.25, dtype)
    return p, s


def _conv_bn_apply(p, s, x, stride=1, padding=1, eps=1e-5):
    dn = jax.lax.conv_dimension_numbers(x.shape, p["w"].shape, ("NHWC", "HWIO", "NHWC"))
    pad = ((padding, padding), (padding, padding))
    x = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), pad,
        dimension_numbers=dn, feature_group_count=p["groups"],
    )
    x = batch_norm_inference(x, p["bn"]["g"], p["bn"]["b"], s["mean"], s["var"], eps)
    if "prelu" in p:
        a = p["prelu"].astype(x.dtype)
        x = jnp.maximum(x, 0) + a * jnp.minimum(x, 0)
    return x


def _depthwise_init(key, cin, cout, groups, dtype=jnp.float32, residual=False):
    k1, k2, k3 = jax.random.split(key, 3)
    p1, s1 = _conv_bn_init(k1, 1, 1, cin, groups, dtype=dtype)  # expand
    p2, s2 = _conv_bn_init(k2, 3, 3, groups, groups, groups=groups, dtype=dtype)  # dw
    p3, s3 = _conv_bn_init(k3, 1, 1, groups, cout, dtype=dtype, prelu=False)  # project
    return {"expand": p1, "dw": p2, "project": p3, "residual": residual}, {
        "expand": s1, "dw": s2, "project": s3,
    }


def _depthwise_apply(p, s, x, stride, eps):
    h = _conv_bn_apply(p["expand"], s["expand"], x, 1, 0, eps)
    h = _conv_bn_apply(p["dw"], s["dw"], h, stride, 1, eps)
    h = _conv_bn_apply(p["project"], s["project"], h, 1, 0, eps)
    return x + h if p["residual"] else h


def init(key: jax.Array, cfg: MBFConfig = MBFConfig(), dtype=jnp.float32):
    keys = iter(jax.random.split(key, 64))
    nk = lambda: next(keys)
    c64, c128 = 64 * cfg.scale, 128 * cfg.scale
    params, state = {}, {}
    params["stem"], state["stem"] = _conv_bn_init(nk(), 3, 3, 3, c64, dtype=dtype)
    params["stem_dw"], state["stem_dw"] = _conv_bn_init(nk(), 3, 3, c64, c64, groups=64, dtype=dtype)

    stages_p, stages_s = [], []
    plan = [
        ("down", c64, c64, 128), ("res", c64, cfg.blocks[1], 128),
        ("down", c64, c128, 256), ("res", c128, cfg.blocks[2], 256),
        ("down", c128, c128, 512), ("res", c128, cfg.blocks[3], 256),
    ]
    for kind, cin, arg, groups in plan:
        if kind == "down":
            p, s = _depthwise_init(nk(), cin, arg, groups, dtype)
            stages_p.append(("down", p))
            stages_s.append(s)
        else:
            blocks_p, blocks_s = [], []
            for _ in range(arg):
                p, s = _depthwise_init(nk(), cin, cin, groups, dtype, residual=True)
                blocks_p.append(p)
                blocks_s.append(s)
            stages_p.append(("res", blocks_p))
            stages_s.append(blocks_s)
    params["stages"] = stages_p
    state["stages"] = stages_s

    params["sep"], state["sep"] = _conv_bn_init(nk(), 1, 1, c128, 512, dtype=dtype)
    params["gdc"], state["gdc"] = _conv_bn_init(nk(), 7, 7, 512, 512, groups=512, dtype=dtype, prelu=False)
    params["fc"] = {
        "w": jax.random.normal(nk(), (cfg.num_features, 512), dtype) * (1.0 / 512) ** 0.5,
    }
    params["features_bn"] = {"g": jnp.ones((cfg.num_features,), dtype), "b": jnp.zeros((cfg.num_features,), dtype)}
    state["features_bn"] = {"mean": jnp.zeros((cfg.num_features,), dtype), "var": jnp.ones((cfg.num_features,), dtype)}
    return params, state


def apply(
    params, state, images: jax.Array,
    cfg: MBFConfig = MBFConfig(), policy: Policy = DEFAULT_POLICY,
) -> jax.Array:
    """(B, 112, 112, 3) [-1,1] -> (B, num_features) fp32 embedding."""
    eps = cfg.bn_eps
    x = images.astype(policy.compute_dtype)
    x = _conv_bn_apply(params["stem"], state["stem"], x, 2, 1, eps)
    x = _conv_bn_apply(params["stem_dw"], state["stem_dw"], x, 1, 1, eps)
    for (kind, p), s in zip(params["stages"], state["stages"]):
        if kind == "down":
            x = _depthwise_apply(p, s, x, 2, eps)
        else:
            for bp, bs in zip(p, s):
                x = _depthwise_apply(bp, bs, x, 1, eps)
    x = _conv_bn_apply(params["sep"], state["sep"], x, 1, 0, eps)
    x = _conv_bn_apply(params["gdc"], state["gdc"], x, 1, 0, eps)  # 7x7 → 1x1
    x = x.astype(jnp.float32).reshape(x.shape[0], -1)
    x = x @ params["fc"]["w"].astype(jnp.float32).T
    p, s = params["features_bn"], state["features_bn"]
    return batch_norm_inference(x, p["g"], p["b"], s["mean"], s["var"], eps)
