"""Face Vision Transformer embedder in functional JAX.

Behavioral rebuild of `ArcFace_files/backbones/vit.py` + the registry
configs (`backbones/__init__.py:30-85`): 112² input, 9×9 patch embed (stride
= patch → 12×12 = 144 tokens, no cls token), learned positional embeddings,
pre-LN transformer blocks, and the distinctive feature head —
Linear(embed·patches → embed, no bias) → BN1d(eps 2e-5) → Linear(embed →
num_features, no bias) → BN1d. Train-time per-sample random token masking
with a learned mask token (`random_masking`, `vit.py:224-250`).

Registry: vit_t/s (dim 256/512, depth 12), vit_b (512, 24), vit_l (768, 24),
8 heads, mask ratios 0.1/0.05 (the train-variant knobs).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.precision import Policy, DEFAULT_POLICY
from ..ops.norms import layer_norm, batch_norm_inference


@dataclasses.dataclass(frozen=True)
class FaceViTConfig:
    img_size: int = 112
    patch_size: int = 9
    embed_dim: int = 256
    depth: int = 12
    num_heads: int = 8
    mlp_ratio: float = 4.0
    num_features: int = 512
    mask_ratio: float = 0.1
    bn_eps: float = 2e-5

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2


VIT_CONFIGS = {
    "vit_t": FaceViTConfig(embed_dim=256, depth=12, mask_ratio=0.1),
    "vit_s": FaceViTConfig(embed_dim=512, depth=12, mask_ratio=0.1),
    "vit_b": FaceViTConfig(embed_dim=512, depth=24, mask_ratio=0.1),
    "vit_l": FaceViTConfig(embed_dim=768, depth=24, mask_ratio=0.05),
}


def _dense_init(key, cout, cin, dtype, bias=True):
    p = {"w": jax.random.normal(key, (cout, cin), dtype) * 0.02}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def init(key: jax.Array, cfg: FaceViTConfig = FaceViTConfig(), dtype=jnp.float32):
    keys = iter(jax.random.split(key, 16 + 8 * cfg.depth))
    nk = lambda: next(keys)
    d, m = cfg.embed_dim, int(cfg.embed_dim * cfg.mlp_ratio)
    params = {
        "patch_embed": {
            "w": jax.random.normal(nk(), (cfg.patch_size, cfg.patch_size, 3, d), dtype) * 0.02,
            "b": jnp.zeros((d,), dtype),
        },
        "pos_embed": jax.random.normal(nk(), (cfg.num_patches, d), dtype) * 0.02,
        "mask_token": jax.random.normal(nk(), (d,), dtype) * 0.02,
        "blocks": [],
        "norm": {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
        "head_fc1": _dense_init(nk(), d, d * cfg.num_patches, dtype, bias=False),
        "head_bn1": {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
        "head_fc2": _dense_init(nk(), cfg.num_features, d, dtype, bias=False),
        "head_bn2": {"g": jnp.ones((cfg.num_features,), dtype), "b": jnp.zeros((cfg.num_features,), dtype)},
    }
    state = {
        "head_bn1": {"mean": jnp.zeros((d,), dtype), "var": jnp.ones((d,), dtype)},
        "head_bn2": {"mean": jnp.zeros((cfg.num_features,), dtype), "var": jnp.ones((cfg.num_features,), dtype)},
    }
    for _ in range(cfg.depth):
        params["blocks"].append(
            {
                "ln1": {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
                "qkv": _dense_init(nk(), 3 * d, d, dtype),
                "proj": _dense_init(nk(), d, d, dtype),
                "ln2": {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
                "fc1": _dense_init(nk(), m, d, dtype),
                "fc2": _dense_init(nk(), d, m, dtype),
            }
        )
    return params, state


def _block(p, x, num_heads):
    b, n, d = x.shape
    hd = d // num_heads
    h = layer_norm(x, p["ln1"]["g"], p["ln1"]["b"])
    qkv = h @ p["qkv"]["w"].astype(h.dtype).T + p["qkv"]["b"].astype(h.dtype)
    q, k, v = jnp.split(qkv.reshape(b, n, 3, num_heads, hd), 3, axis=2)
    q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]  # (b, n, heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits.astype(jnp.float32) * hd**-0.5, axis=-1).astype(x.dtype)
    attn = jnp.einsum("bhqk,bkhd->bqhd", w, v, preferred_element_type=jnp.float32).astype(x.dtype)
    attn = attn.reshape(b, n, d) @ p["proj"]["w"].astype(x.dtype).T + p["proj"]["b"].astype(x.dtype)
    x = x + attn
    h = layer_norm(x, p["ln2"]["g"], p["ln2"]["b"])
    h = h @ p["fc1"]["w"].astype(h.dtype).T + p["fc1"]["b"].astype(h.dtype)
    h = jnp.clip(h, 0.0, 6.0)  # ReLU6 — the reference Mlp act (vit.py:7)
    h = h @ p["fc2"]["w"].astype(h.dtype).T + p["fc2"]["b"].astype(h.dtype)
    return x + h


def apply(
    params,
    state,
    images: jax.Array,
    cfg: FaceViTConfig = FaceViTConfig(),
    policy: Policy = DEFAULT_POLICY,
    train: bool = False,
    mask_key: Optional[jax.Array] = None,
) -> jax.Array:
    """(B, 112, 112, 3) -> (B, num_features) fp32 embedding."""
    x = images.astype(policy.compute_dtype)
    pe = params["patch_embed"]
    dn = jax.lax.conv_dimension_numbers(x.shape, pe["w"].shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, pe["w"].astype(x.dtype), (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=dn,
    )
    b = x.shape[0]
    x = x.reshape(b, -1, cfg.embed_dim) + pe["b"].astype(x.dtype)
    x = x + params["pos_embed"][None].astype(x.dtype)

    if train and cfg.mask_ratio > 0 and mask_key is not None:
        # per-sample random masking: replace masked tokens with mask_token
        n = x.shape[1]
        n_mask = int(n * cfg.mask_ratio)
        noise = jax.random.uniform(mask_key, (b, n))
        ranks = jnp.argsort(jnp.argsort(noise, axis=1), axis=1)
        mask = (ranks < n_mask)[..., None]
        x = jnp.where(mask, params["mask_token"].astype(x.dtype), x)

    for blk in params["blocks"]:
        x = _block(blk, x, cfg.num_heads)
    x = layer_norm(x, params["norm"]["g"], params["norm"]["b"])
    flat = x.astype(jnp.float32).reshape(b, -1)
    h = flat @ params["head_fc1"]["w"].astype(jnp.float32).T
    h = batch_norm_inference(
        h, params["head_bn1"]["g"], params["head_bn1"]["b"],
        state["head_bn1"]["mean"], state["head_bn1"]["var"], cfg.bn_eps,
    )
    h = h @ params["head_fc2"]["w"].astype(jnp.float32).T
    return batch_norm_inference(
        h, params["head_bn2"]["g"], params["head_bn2"]["b"],
        state["head_bn2"]["mean"], state["head_bn2"]["var"], cfg.bn_eps,
    )
