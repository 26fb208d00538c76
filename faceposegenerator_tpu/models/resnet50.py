"""torchvision-style ResNet-50 feature trunk in functional JAX (NHWC).

Serves the dgm-eval "swav" encoder — a torchvision ResNet-50 loaded with
SwAV weights whose representation is the 2048-d global-average-pool output
(`Evaluation/dgm-eval/dgm_eval/models/swav.py:200-310` forward_backbone →
avgpool) over 224² imagenet-normalized inputs. BatchNorm (eps 1e-5) runs in
inference form; the torchvision state-dict layout loads through
`bridge.convert_resnet50_state_dict`.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

BN_EPS = 1e-5


def _conv_bn(x, p, stride=1, padding=0, relu=True):
    pad = ((padding, padding), (padding, padding))
    dn = jax.lax.conv_dimension_numbers(x.shape, p["w"].shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), pad, dimension_numbers=dn
    )
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + BN_EPS)
    scale = (p["g"].astype(jnp.float32) * inv).astype(y.dtype)
    shift = (
        p["b"].astype(jnp.float32) - p["mean"].astype(jnp.float32) * p["g"].astype(jnp.float32) * inv
    ).astype(y.dtype)
    y = y * scale + shift
    return jax.nn.relu(y) if relu else y


def _bottleneck(x, p, stride):
    identity = x
    h = _conv_bn(x, p["conv1"])
    h = _conv_bn(h, p["conv2"], stride=stride, padding=1)
    h = _conv_bn(h, p["conv3"], relu=False)
    if "downsample" in p:
        identity = _conv_bn(x, p["downsample"], stride=stride, relu=False)
    return jax.nn.relu(h + identity)


LAYERS = (3, 4, 6, 3)
WIDTHS = (64, 128, 256, 512)
STRIDES = (1, 2, 2, 2)


def apply(params: Dict, images: jax.Array, tap=None) -> jax.Array:
    """images: (B, H, W, 3) imagenet-normalized. Returns (B, 2048) features.

    `tap`: optional callable applied to the final bottleneck output (the
    reference GradCAM target 'layer4.2' for swav,
    `dgm_eval/heatmaps/gradcam.py` MODEL_TO_LAYER_NAME_MAP)."""
    x = images.astype(jnp.float32)
    x = _conv_bn(x, params["stem"], stride=2, padding=3)
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    for li, (n, stride) in enumerate(zip(LAYERS, STRIDES)):
        for bi in range(n):
            x = _bottleneck(x, params[f"layer{li + 1}"][bi], stride if bi == 0 else 1)
    if tap is not None:
        x = tap(x)
    return jnp.mean(x, axis=(1, 2))


def init(key: jax.Array) -> Dict:
    keys = iter(jax.random.split(key, 256))
    nk = lambda: next(keys)

    def unit(kh, kw, cin, cout):
        w = jax.random.normal(nk(), (kh, kw, cin, cout)) * (2.0 / (kh * kw * cin)) ** 0.5
        return {
            "w": w, "g": jnp.ones((cout,)), "b": jnp.zeros((cout,)),
            "mean": jnp.zeros((cout,)), "var": jnp.ones((cout,)),
        }

    params: Dict = {"stem": unit(7, 7, 3, 64)}
    cin = 64
    for li, (n, width) in enumerate(zip(LAYERS, WIDTHS)):
        blocks = []
        cout = width * 4
        for bi in range(n):
            block = {
                "conv1": unit(1, 1, cin if bi == 0 else cout, width),
                "conv2": unit(3, 3, width, width),
                "conv3": unit(1, 1, width, cout),
            }
            if bi == 0:
                block["downsample"] = unit(1, 1, cin, cout)
            blocks.append(block)
        params[f"layer{li + 1}"] = blocks
        cin = cout
    return params
