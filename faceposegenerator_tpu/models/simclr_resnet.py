"""SimCLRv2 selective-kernel ResNet (r50_1x_sk1) in functional JAX — NHWC.

The reference's "simclr" encoder is NOT a torchvision ResNet: SimCLRv2's
r50_1x_sk1 uses a 3-conv stem, selective-kernel (SK) 3×3 stages (two
stacked paths mixed by a softmax gate computed from the global-pooled sum),
and zero-padded avg-pool projection shortcuts
(`Evaluation/dgm-eval/dgm_eval/models/simclr.py:16-140`). Features are the
2048-d global-average-pool output.

Weight bridge: `bridge.convert_simclr_state_dict` maps the SimCLRv2-Pytorch
checkpoint key layout (net.0… stem, net.{1..4}.blocks.{i}… stages).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

BN_EPS = 1e-5
SK_RATIO = 0.0625


def _conv(x, w, stride=1, groups=1):
    k = w.shape[0]
    pad = (k - 1) // 2
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=dn, feature_group_count=groups,
    )


def _bn(x, p, relu=True):
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + BN_EPS)
    scale = (p["g"].astype(jnp.float32) * inv).astype(x.dtype)
    shift = (
        p["b"].astype(jnp.float32) - p["mean"].astype(jnp.float32) * p["g"].astype(jnp.float32) * inv
    ).astype(x.dtype)
    y = x * scale + shift
    return jax.nn.relu(y) if relu else y


def _sk(x, p, stride):
    """SelectiveKernel: one conv to 2c, two channel-half paths mixed by a
    softmax gate from the pooled sum (`simclr.py:28-43`)."""
    m = _bn(_conv(x, p["main_w"], stride=stride), p["main_bn"])
    c1, c2 = jnp.split(m, 2, axis=-1)
    g = jnp.mean(c1 + c2, axis=(1, 2), keepdims=True)  # (B,1,1,c)
    mix = _bn(_conv(g, p["mix1_w"]), p["mix1_bn"])
    mix = _conv(mix, p["mix2_w"])  # (B,1,1,2c)
    w1, w2 = jnp.split(mix, 2, axis=-1)
    gate = jax.nn.softmax(jnp.stack([w1, w2], axis=0), axis=0)
    return c1 * gate[0] + c2 * gate[1]


def _shortcut(x, p, stride):
    """Projection shortcut: zero-pad (right/bottom), 2×2 avg-pool (pad zeros
    INCLUDED — torch AvgPool2d default), 1×1 conv, BN (`simclr.py:45-58`)."""
    if p is None:
        return x
    h = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    h = jax.lax.reduce_window(
        h, 0.0, jax.lax.add, (1, 2, 2, 1), (1, stride, stride, 1), "VALID"
    ) / 4.0
    h = _conv(h, p["conv_w"])
    return _bn(h, p["bn"], relu=False)


def _block(x, p, stride):
    short = _shortcut(x, p.get("proj"), stride)
    h = _bn(_conv(x, p["conv1_w"]), p["bn1"])
    h = _sk(h, p["sk"], stride)
    h = _bn(_conv(h, p["conv3_w"]), p["bn3"], relu=False)
    return jax.nn.relu(short + h)


LAYERS = (3, 4, 6, 3)
WIDTHS = (64, 128, 256, 512)
STRIDES = (1, 2, 2, 2)


def apply(params: Dict, images: jax.Array) -> jax.Array:
    """images: (B, H, W, 3) imagenet-normalized. Returns (B, 2048)."""
    x = images.astype(jnp.float32)
    st = params["stem"]
    x = _bn(_conv(x, st["conv1_w"], stride=2), st["bn1"])
    x = _bn(_conv(x, st["conv2_w"]), st["bn2"])
    x = _bn(_conv(x, st["conv3_w"]), st["bn3"])
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    for s, (n, stride) in enumerate(zip(LAYERS, STRIDES)):
        for b in range(n):
            x = _block(x, params["stages"][s][b], stride if b == 0 else 1)
    return jnp.mean(x, axis=(1, 2))


def init(key: jax.Array, width_multiplier: int = 1) -> Dict:
    keys = iter(jax.random.split(key, 512))
    nk = lambda: next(keys)

    def w(kh, kw, cin, cout):
        return jax.random.normal(nk(), (kh, kw, cin, cout)) * (2.0 / (kh * kw * cin)) ** 0.5

    def bn(c):
        return {"g": jnp.ones((c,)), "b": jnp.zeros((c,)),
                "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}

    c0 = 64 * width_multiplier // 2
    params: Dict = {
        "stem": {
            "conv1_w": w(3, 3, 3, c0), "bn1": bn(c0),
            "conv2_w": w(3, 3, c0, c0), "bn2": bn(c0),
            "conv3_w": w(3, 3, c0, 2 * c0), "bn3": bn(2 * c0),
        },
        "stages": [],
    }
    cin = 64 * width_multiplier
    for n, width in zip(LAYERS, (wd * width_multiplier for wd in WIDTHS)):
        blocks = []
        cout = width * 4
        for b in range(n):
            bin_ = cin if b == 0 else cout
            mid = max(int(width * SK_RATIO), 32)
            block = {
                "conv1_w": w(1, 1, bin_, width),
                "bn1": bn(width),
                "sk": {
                    "main_w": w(3, 3, width, 2 * width), "main_bn": bn(2 * width),
                    "mix1_w": w(1, 1, width, mid), "mix1_bn": bn(mid),
                    "mix2_w": w(1, 1, mid, 2 * width),
                },
                "conv3_w": w(1, 1, width, cout),
                "bn3": bn(cout),
            }
            if b == 0:
                block["proj"] = {"conv_w": w(1, 1, cin, cout), "bn": bn(cout)}
            blocks.append(block)
        params["stages"].append(blocks)
        cin = cout
    return params
