"""ConvNeXt feature trunk in functional JAX (NHWC) — the dgm-eval
"convnext" encoder.

The reference loads timm `convnext_large_in22k` and takes
forward_features → global-average-pool → head-LN features (1536-d;
`Evaluation/dgm-eval/dgm_eval/models/convnext.py:78-84`) over 224²
imagenet-normalized inputs.

Architecture (ConvNeXt, Liu et al. 2022): stem conv4×4 s4 + LN → 4 stages of
blocks [dwconv7×7 → LN → pw-MLP(4×, GELU) → γ·LayerScale → residual] with
LN+conv2×2-s2 downsampling between stages. NHWC is the natural layout here —
the depthwise conv and the channel-last LN/MLP are exactly TPU-friendly.
Weights load from the timm state-dict layout via
`bridge.convert_convnext_state_dict`.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from ..ops.norms import layer_norm

LN_EPS = 1e-6


@dataclasses.dataclass(frozen=True)
class ConvNeXtConfig:
    depths: Sequence[int] = (3, 3, 27, 3)
    dims: Sequence[int] = (192, 384, 768, 1536)  # convnext_large


CONVNEXT_LARGE = ConvNeXtConfig()


def _conv(x, p, stride, groups=1):
    dn = jax.lax.conv_dimension_numbers(x.shape, p["w"].shape, ("NHWC", "HWIO", "NHWC"))
    pad = "SAME" if groups > 1 else "VALID"
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), pad,
        dimension_numbers=dn, feature_group_count=groups,
    )
    return y + p["b"].astype(x.dtype)


def _block(x, p, dim):
    h = _conv(x, p["conv_dw"], stride=1, groups=dim)
    h = layer_norm(h, p["norm"]["g"], p["norm"]["b"], eps=LN_EPS)
    h = jnp.einsum("...i,oi->...o", h, p["fc1"]["w"].astype(h.dtype)) + p["fc1"]["b"].astype(h.dtype)
    h = jax.nn.gelu(h, approximate=False)
    h = jnp.einsum("...i,oi->...o", h, p["fc2"]["w"].astype(h.dtype)) + p["fc2"]["b"].astype(h.dtype)
    if "gamma" in p:
        h = h * p["gamma"].astype(h.dtype)
    return x + h


def apply(params: Dict, images: jax.Array, cfg: ConvNeXtConfig = CONVNEXT_LARGE, tap=None) -> jax.Array:
    """images: (B, H, W, 3) imagenet-normalized. Returns (B, dims[-1]).

    `tap`: optional callable applied to the final stage's last block output
    (the reference GradCAM target 'stages.3.blocks.2')."""
    x = images.astype(jnp.float32)
    x = _conv(x, params["stem_conv"], stride=4)
    x = layer_norm(x, params["stem_norm"]["g"], params["stem_norm"]["b"], eps=LN_EPS)
    for s, (depth, dim) in enumerate(zip(cfg.depths, cfg.dims)):
        if s > 0:
            ds = params[f"stage{s}_downsample"]
            x = layer_norm(x, ds["norm"]["g"], ds["norm"]["b"], eps=LN_EPS)
            x = _conv(x, ds["conv"], stride=2)
        for b in range(depth):
            x = _block(x, params[f"stage{s}_blocks"][b], dim)
    if tap is not None:
        x = tap(x)
    x = jnp.mean(x, axis=(1, 2))
    return layer_norm(x, params["head_norm"]["g"], params["head_norm"]["b"], eps=LN_EPS)


def init(key: jax.Array, cfg: ConvNeXtConfig = CONVNEXT_LARGE) -> Dict:
    keys = iter(jax.random.split(key, 512))
    nk = lambda: next(keys)

    def conv(kh, kw, cin, cout, groups=1):
        w = jax.random.normal(nk(), (kh, kw, cin // groups, cout)) * 0.02
        return {"w": w, "b": jnp.zeros((cout,))}

    def dense(out, inn):
        return {"w": jax.random.normal(nk(), (out, inn)) * 0.02, "b": jnp.zeros((out,))}

    def ln(c):
        return {"g": jnp.ones((c,)), "b": jnp.zeros((c,))}

    params: Dict = {
        "stem_conv": conv(4, 4, 3, cfg.dims[0]),
        "stem_norm": ln(cfg.dims[0]),
        "head_norm": ln(cfg.dims[-1]),
    }
    for s, (depth, dim) in enumerate(zip(cfg.depths, cfg.dims)):
        if s > 0:
            params[f"stage{s}_downsample"] = {
                "norm": ln(cfg.dims[s - 1]),
                "conv": conv(2, 2, cfg.dims[s - 1], dim),
            }
        params[f"stage{s}_blocks"] = [
            {
                "conv_dw": conv(7, 7, dim, dim, groups=dim),
                "norm": ln(dim),
                "fc1": dense(dim * 4, dim),
                "fc2": dense(dim, dim * 4),
                "gamma": jnp.full((dim,), 1e-6),
            }
            for _ in range(depth)
        ]
    return params
