"""InceptionV3 (pytorch-fid variant) in functional JAX — NHWC.

The dgm-eval registry's DEFAULT encoder ("inception",
`Evaluation/dgm-eval/dgm_eval/models/load_encoder.py:14-25`) is the FID
InceptionV3: torchvision's InceptionV3 with the pytorch-fid patches
(`dgm_eval/models/inception.py:229-340`) — branch average pools exclude the
zero padding (TF `count_include_pad=False` semantics) and the LAST
Inception-E block pools with MAX instead of average. Features are the final
global-average 2048-d vector; inputs are bilinear-resized to 299² (no
antialias, matching `F.interpolate`) and scaled to [-1, 1]
(`inception.py:178-186`).

Weights: `bridge.convert_inception_state_dict` maps the torchvision/
pytorch-fid state-dict layout (Conv2d_1a_3x3.conv/bn, Mixed_5b.branch1x1…);
BatchNorm (eps 1e-3) runs in inference form from running statistics.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp


BN_EPS = 1e-3


def _conv(x, p, stride=1, padding=0):
    pad = padding if isinstance(padding, tuple) else (padding, padding)
    dn = jax.lax.conv_dimension_numbers(x.shape, p["w"].shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride),
        ((pad[0], pad[0]), (pad[1], pad[1])), dimension_numbers=dn,
    )
    # inference BatchNorm folded as scale/shift (fp32 statistics)
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + BN_EPS)
    scale = (p["g"].astype(jnp.float32) * inv).astype(y.dtype)
    shift = (p["b"].astype(jnp.float32) - p["mean"].astype(jnp.float32) * p["g"].astype(jnp.float32) * inv).astype(y.dtype)
    return jax.nn.relu(y * scale + shift)


def _maxpool(x, k=3, s=2, padding=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
        ((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def _avgpool_excl(x, k=3, s=1, padding=1):
    """Average pool EXCLUDING padded zeros (TF semantics / pytorch-fid's
    `count_include_pad=False` patch, `inception.py:266-270`)."""
    window = (1, k, k, 1)
    strides = (1, s, s, 1)
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    total = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides, pads)
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    count = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window, strides, pads)
    return total / count


def _inception_a(x, p):
    b1 = _conv(x, p["branch1x1"])
    b5 = _conv(_conv(x, p["branch5x5_1"]), p["branch5x5_2"], padding=2)
    b3 = _conv(_conv(_conv(x, p["branch3x3dbl_1"]), p["branch3x3dbl_2"], padding=1), p["branch3x3dbl_3"], padding=1)
    bp = _conv(_avgpool_excl(x), p["branch_pool"])
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(x, p):
    b3 = _conv(x, p["branch3x3"], stride=2)
    bd = _conv(_conv(_conv(x, p["branch3x3dbl_1"]), p["branch3x3dbl_2"], padding=1), p["branch3x3dbl_3"], stride=2)
    return jnp.concatenate([b3, bd, _maxpool(x)], axis=-1)


def _inception_c(x, p):
    b1 = _conv(x, p["branch1x1"])
    b7 = _conv(x, p["branch7x7_1"])
    b7 = _conv(b7, p["branch7x7_2"], padding=(0, 3))
    b7 = _conv(b7, p["branch7x7_3"], padding=(3, 0))
    bd = _conv(x, p["branch7x7dbl_1"])
    bd = _conv(bd, p["branch7x7dbl_2"], padding=(3, 0))
    bd = _conv(bd, p["branch7x7dbl_3"], padding=(0, 3))
    bd = _conv(bd, p["branch7x7dbl_4"], padding=(3, 0))
    bd = _conv(bd, p["branch7x7dbl_5"], padding=(0, 3))
    bp = _conv(_avgpool_excl(x), p["branch_pool"])
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(x, p):
    b3 = _conv(_conv(x, p["branch3x3_1"]), p["branch3x3_2"], stride=2)
    b7 = _conv(x, p["branch7x7x3_1"])
    b7 = _conv(b7, p["branch7x7x3_2"], padding=(0, 3))
    b7 = _conv(b7, p["branch7x7x3_3"], padding=(3, 0))
    b7 = _conv(b7, p["branch7x7x3_4"], stride=2)
    return jnp.concatenate([b3, b7, _maxpool(x)], axis=-1)


def _inception_e(x, p, pool: str):
    b1 = _conv(x, p["branch1x1"])
    b3 = _conv(x, p["branch3x3_1"])
    b3 = jnp.concatenate(
        [_conv(b3, p["branch3x3_2a"], padding=(0, 1)), _conv(b3, p["branch3x3_2b"], padding=(1, 0))],
        axis=-1,
    )
    bd = _conv(_conv(x, p["branch3x3dbl_1"]), p["branch3x3dbl_2"], padding=1)
    bd = jnp.concatenate(
        [_conv(bd, p["branch3x3dbl_3a"], padding=(0, 1)), _conv(bd, p["branch3x3dbl_3b"], padding=(1, 0))],
        axis=-1,
    )
    if pool == "max":  # FIDInceptionE_2 patch (`inception.py:322-333`)
        bp = _maxpool(x, k=3, s=1, padding=1)
    else:
        bp = _avgpool_excl(x)
    bp = _conv(bp, p["branch_pool"])
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


# (name, kind, kwargs) — the torchvision InceptionV3 trunk
_STEM = [
    ("Conv2d_1a_3x3", dict(k=3, s=2)),
    ("Conv2d_2a_3x3", dict(k=3)),
    ("Conv2d_2b_3x3", dict(k=3, p=1)),
    ("maxpool1", None),
    ("Conv2d_3b_1x1", dict(k=1)),
    ("Conv2d_4a_3x3", dict(k=3)),
    ("maxpool2", None),
]


def apply(params: Dict, images: jax.Array, resize_input: bool = True, normalize_input: bool = True, tap=None) -> jax.Array:
    """images: (B, H, W, 3) in [0, 1]. Returns 2048-d pooled features.

    `tap`: optional callable applied to the Mixed_7c output (the reference
    GradCAM target layer 'blocks.3.2', `dgm_eval/heatmaps/gradcam.py:
    MODEL_TO_LAYER_NAME_MAP`) — the functional replacement for torch
    forward/backward hooks: heatmap code passes a capture+perturb closure."""
    x = images.astype(jnp.float32)
    if resize_input and x.shape[1:3] != (299, 299):
        x = jax.image.resize(x, (x.shape[0], 299, 299, 3), method="bilinear", antialias=False)
    if normalize_input:
        x = 2.0 * x - 1.0

    x = _conv(x, params["Conv2d_1a_3x3"], stride=2)
    x = _conv(x, params["Conv2d_2a_3x3"])
    x = _conv(x, params["Conv2d_2b_3x3"], padding=1)
    x = _maxpool(x)
    x = _conv(x, params["Conv2d_3b_1x1"])
    x = _conv(x, params["Conv2d_4a_3x3"])
    x = _maxpool(x)
    for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = _inception_a(x, params[name])
    x = _inception_b(x, params["Mixed_6a"])
    for name in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _inception_c(x, params[name])
    x = _inception_d(x, params["Mixed_7a"])
    x = _inception_e(x, params["Mixed_7b"], pool="avg")
    x = _inception_e(x, params["Mixed_7c"], pool="max")
    if tap is not None:
        x = tap(x)
    return jnp.mean(x, axis=(1, 2))  # global average pool → (B, 2048)


# ---------------------------------------------------------------------------
# init (random weights; real FID weights come through the bridge)
# ---------------------------------------------------------------------------


def _unit(key, kh, kw, cin, cout):
    w = jax.random.normal(key, (kh, kw, cin, cout)) * (2.0 / (kh * kw * cin)) ** 0.5
    return {
        "w": w,
        "g": jnp.ones((cout,)),
        "b": jnp.zeros((cout,)),
        "mean": jnp.zeros((cout,)),
        "var": jnp.ones((cout,)),
    }


def init(key: jax.Array) -> Dict:
    keys = iter(jax.random.split(key, 128))
    nk = lambda: next(keys)
    p = {
        "Conv2d_1a_3x3": _unit(nk(), 3, 3, 3, 32),
        "Conv2d_2a_3x3": _unit(nk(), 3, 3, 32, 32),
        "Conv2d_2b_3x3": _unit(nk(), 3, 3, 32, 64),
        "Conv2d_3b_1x1": _unit(nk(), 1, 1, 64, 80),
        "Conv2d_4a_3x3": _unit(nk(), 3, 3, 80, 192),
    }

    def a_block(cin, pf):
        return {
            "branch1x1": _unit(nk(), 1, 1, cin, 64),
            "branch5x5_1": _unit(nk(), 1, 1, cin, 48),
            "branch5x5_2": _unit(nk(), 5, 5, 48, 64),
            "branch3x3dbl_1": _unit(nk(), 1, 1, cin, 64),
            "branch3x3dbl_2": _unit(nk(), 3, 3, 64, 96),
            "branch3x3dbl_3": _unit(nk(), 3, 3, 96, 96),
            "branch_pool": _unit(nk(), 1, 1, cin, pf),
        }

    p["Mixed_5b"] = a_block(192, 32)
    p["Mixed_5c"] = a_block(256, 64)
    p["Mixed_5d"] = a_block(288, 64)
    p["Mixed_6a"] = {
        "branch3x3": _unit(nk(), 3, 3, 288, 384),
        "branch3x3dbl_1": _unit(nk(), 1, 1, 288, 64),
        "branch3x3dbl_2": _unit(nk(), 3, 3, 64, 96),
        "branch3x3dbl_3": _unit(nk(), 3, 3, 96, 96),
    }

    def c_block(c7):
        return {
            "branch1x1": _unit(nk(), 1, 1, 768, 192),
            "branch7x7_1": _unit(nk(), 1, 1, 768, c7),
            "branch7x7_2": _unit(nk(), 1, 7, c7, c7),
            "branch7x7_3": _unit(nk(), 7, 1, c7, 192),
            "branch7x7dbl_1": _unit(nk(), 1, 1, 768, c7),
            "branch7x7dbl_2": _unit(nk(), 7, 1, c7, c7),
            "branch7x7dbl_3": _unit(nk(), 1, 7, c7, c7),
            "branch7x7dbl_4": _unit(nk(), 7, 1, c7, c7),
            "branch7x7dbl_5": _unit(nk(), 1, 7, c7, 192),
            "branch_pool": _unit(nk(), 1, 1, 768, 192),
        }

    p["Mixed_6b"] = c_block(128)
    p["Mixed_6c"] = c_block(160)
    p["Mixed_6d"] = c_block(160)
    p["Mixed_6e"] = c_block(192)
    p["Mixed_7a"] = {
        "branch3x3_1": _unit(nk(), 1, 1, 768, 192),
        "branch3x3_2": _unit(nk(), 3, 3, 192, 320),
        "branch7x7x3_1": _unit(nk(), 1, 1, 768, 192),
        "branch7x7x3_2": _unit(nk(), 1, 7, 192, 192),
        "branch7x7x3_3": _unit(nk(), 7, 1, 192, 192),
        "branch7x7x3_4": _unit(nk(), 3, 3, 192, 192),
    }

    def e_block(cin):
        return {
            "branch1x1": _unit(nk(), 1, 1, cin, 320),
            "branch3x3_1": _unit(nk(), 1, 1, cin, 384),
            "branch3x3_2a": _unit(nk(), 1, 3, 384, 384),
            "branch3x3_2b": _unit(nk(), 3, 1, 384, 384),
            "branch3x3dbl_1": _unit(nk(), 1, 1, cin, 448),
            "branch3x3dbl_2": _unit(nk(), 3, 3, 448, 384),
            "branch3x3dbl_3a": _unit(nk(), 1, 3, 384, 384),
            "branch3x3dbl_3b": _unit(nk(), 3, 1, 384, 384),
            "branch_pool": _unit(nk(), 1, 1, cin, 192),
        }

    p["Mixed_7b"] = e_block(1280)
    p["Mixed_7c"] = e_block(2048)
    return p
