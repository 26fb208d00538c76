"""DINOv2 vision transformer in functional JAX (NHWC input, BSHD attention).

The reference's dgm-eval computes its headline quality metrics (FD/KD/PRDC/
Vendi/AuthPct) on DINOv2 ViT-L/14 features: the encoder loads
`torch.hub dinov2_vitl14` and feeds 224² bicubic-resized, imagenet-normalized
images (`Evaluation/dgm-eval/dgm_eval/models/dinov2.py:31-59`; operating
point `main_DGM_EVAL.ipynb` cell 1). The hub model's `forward` returns the
final-layernorm CLS token (`x_norm_clstoken`, 1024-d for vitl14) — identical
to `transformers.Dinov2Model`'s `pooler_output` — so that is the feature
this module exposes via `cls_feature`.

Architecture (DINOv2 = ViT + LayerScale, pre-norm):
  patch-embed conv (14×14 stride 14) → prepend CLS → +pos-embed (bicubic-
  interpolated to the input grid when it differs from the trained 37×37) →
  N × [x += ls1·MHA(LN(x)); x += ls2·MLP(LN(x))] → final LN.

TPU notes: attention runs through `ops.attention.dot_product_attention`
(head_dim 64 → the packed flash kernel on TPU); matmuls bf16-able via the
precision policy with fp32 LN statistics.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.precision import Policy, DEFAULT_POLICY
from ..ops.attention import dot_product_attention
from ..ops.lora import lora_dense
from ..ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class DINOv2Config:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    patch_size: int = 14
    image_size: int = 518  # training resolution → 37×37 pos-embed grid
    layer_norm_eps: float = 1e-6
    layerscale: bool = True  # False = plain timm ViT (MAE, DeiT)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


VITL14_CONFIG = DINOv2Config()
VITB14_CONFIG = DINOv2Config(hidden_size=768, num_layers=12, num_heads=12, intermediate_size=3072)
VITS14_CONFIG = DINOv2Config(hidden_size=384, num_layers=12, num_heads=6, intermediate_size=1536)
# plain timm ViT-L/16 — the MAE encoder (`dgm_eval/models/mae.py:34-70`:
# forward_features = final-norm CLS token, global_pool=False default,
# eps 1e-6 norm_layer per the MAE recipe)
MAE_VITL16_CONFIG = DINOv2Config(patch_size=16, image_size=224, layerscale=False)


def init(key: jax.Array, cfg: DINOv2Config = VITL14_CONFIG, dtype=jnp.float32):
    D = cfg.hidden_size
    keys = iter(jax.random.split(key, 8 + 8 * cfg.num_layers))
    nk = lambda: next(keys)

    def dense(kk, out, inn):
        s = (1.0 / inn) ** 0.5
        return {
            "w": jax.random.uniform(kk, (out, inn), dtype, -s, s),
            "b": jnp.zeros((out,), dtype),
        }

    def ln():
        return {"g": jnp.ones((D,), dtype), "b": jnp.zeros((D,), dtype)}

    layers = []
    for _ in range(cfg.num_layers):
        layer = {
            "norm1": ln(),
            "q": dense(nk(), D, D),
            "k": dense(nk(), D, D),
            "v": dense(nk(), D, D),
            "out": dense(nk(), D, D),
            "norm2": ln(),
            "fc1": dense(nk(), cfg.intermediate_size, D),
            "fc2": dense(nk(), D, cfg.intermediate_size),
        }
        if cfg.layerscale:
            layer["ls1"] = jnp.ones((D,), dtype)
            layer["ls2"] = jnp.ones((D,), dtype)
        layers.append(layer)
    return {
        "patch_embed": {
            "w": jax.random.normal(nk(), (cfg.patch_size, cfg.patch_size, 3, D), dtype) * 0.02,
            "b": jnp.zeros((D,), dtype),
        },
        "cls_token": jax.random.normal(nk(), (1, 1, D), dtype) * 0.02,
        "pos_embed": jax.random.normal(nk(), (1, cfg.num_patches + 1, D), dtype) * 0.02,
        "layers": layers,
        "final_norm": ln(),
    }


def _interpolate_pos_embed(pos: jax.Array, grid: int) -> jax.Array:
    """Bicubic-resize the patch position embeddings to a `grid`×`grid` layout
    (transformers `Dinov2Embeddings.interpolate_pos_encoding` semantics; the
    CLS position passes through untouched). Exact no-op when sizes match."""
    n = pos.shape[1] - 1
    src = int(round(n**0.5))
    if src == grid:
        return pos
    cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
    patch_pos = patch_pos.reshape(1, src, src, -1)
    patch_pos = jax.image.resize(
        patch_pos.astype(jnp.float32), (1, grid, grid, patch_pos.shape[-1]), method="bicubic"
    ).astype(pos.dtype)
    return jnp.concatenate([cls_pos, patch_pos.reshape(1, grid * grid, -1)], axis=1)


def apply(
    params,
    images: jax.Array,
    cfg: DINOv2Config = VITL14_CONFIG,
    policy: Policy = DEFAULT_POLICY,
    tap=None,
) -> jax.Array:
    """images: (B, H, W, 3) already imagenet-normalized, H=W divisible by
    patch_size. Returns the final-LN hidden states (B, 1+N, D).

    `tap`: optional callable applied to the LAST layer's norm1 output (the
    reference GradCAM target 'blocks.23.norm1',
    `dgm_eval/heatmaps/gradcam.py` MODEL_TO_LAYER_NAME_MAP) — functional
    replacement for torch forward/backward hooks."""
    x = images.astype(policy.compute_dtype)
    b, h, w, _ = x.shape
    grid = h // cfg.patch_size

    pe = params["patch_embed"]
    dn = jax.lax.conv_dimension_numbers(x.shape, pe["w"].shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, pe["w"].astype(x.dtype),
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=dn,
    ) + pe["b"].astype(x.dtype)
    x = x.reshape(b, grid * grid, cfg.hidden_size)

    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + _interpolate_pos_embed(params["pos_embed"], grid).astype(x.dtype)

    nh, hd = cfg.num_heads, cfg.head_dim
    s = x.shape[1]
    n_layers = len(params["layers"])
    for li, lp in enumerate(params["layers"]):
        hn = layer_norm(x, lp["norm1"]["g"], lp["norm1"]["b"], eps=cfg.layer_norm_eps)
        if tap is not None and li == n_layers - 1:
            hn = tap(hn)
        q = lora_dense(hn, lp["q"]["w"], lp["q"]["b"]).reshape(b, s, nh, hd)
        k = lora_dense(hn, lp["k"]["w"], lp["k"]["b"]).reshape(b, s, nh, hd)
        v = lora_dense(hn, lp["v"]["w"], lp["v"]["b"]).reshape(b, s, nh, hd)
        o = dot_product_attention(q, k, v).reshape(b, s, cfg.hidden_size)
        o = lora_dense(o, lp["out"]["w"], lp["out"]["b"])
        x = x + (lp["ls1"].astype(o.dtype) * o if "ls1" in lp else o)

        hn = layer_norm(x, lp["norm2"]["g"], lp["norm2"]["b"], eps=cfg.layer_norm_eps)
        ff = lora_dense(hn, lp["fc1"]["w"], lp["fc1"]["b"])
        ff = jax.nn.gelu(ff, approximate=False)
        ff = lora_dense(ff, lp["fc2"]["w"], lp["fc2"]["b"])
        x = x + (lp["ls2"].astype(ff.dtype) * ff if "ls2" in lp else ff)

    return layer_norm(x, params["final_norm"]["g"], params["final_norm"]["b"], eps=cfg.layer_norm_eps)


def cls_feature(params, images, cfg: DINOv2Config = VITL14_CONFIG, policy: Policy = DEFAULT_POLICY, tap=None):
    """The dgm-eval representation: final-LN CLS token (hub `forward` ≡
    transformers `pooler_output`)."""
    return apply(params, images, cfg, policy, tap=tap)[:, 0].astype(jnp.float32)
