"""CLIP vision tower (ViT) in functional JAX — the dgm-eval "clip" encoder.

The reference's clip encoder extracts ln_post(CLS) features from an
open_clip ViT (`Evaluation/dgm-eval/dgm_eval/models/clip.py:40-70`, default
depth=0 → the visual projection is skipped), feeding 224² bicubic-resized,
CLIP-normalized images. Architecture = standard pre-LN CLIP ViT: patch conv
(no bias) → [CLS; patches] + learned positions → pre-LN → N×(LN→MHA→res,
LN→MLP→res) → post-LN on the CLS token. Weight bridge accepts the
`transformers.CLIPVisionModel` state-dict layout.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.precision import Policy, DEFAULT_POLICY
from ..ops.attention import dot_product_attention
from ..ops.lora import lora_dense
from ..ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    patch_size: int = 14
    image_size: int = 224
    hidden_act: str = "quick_gelu"  # openai CLIP; open_clip laion uses "gelu"
    layer_norm_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


VITL14_CLIP_CONFIG = CLIPVisionConfig()
VITB32_CLIP_CONFIG = CLIPVisionConfig(
    hidden_size=768, num_layers=12, num_heads=12, intermediate_size=3072, patch_size=32
)


def _act(cfg, x):
    if cfg.hidden_act == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if cfg.hidden_act == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    raise ValueError(cfg.hidden_act)


def init(key: jax.Array, cfg: CLIPVisionConfig = VITB32_CLIP_CONFIG, dtype=jnp.float32):
    D = cfg.hidden_size
    keys = iter(jax.random.split(key, 8 + 8 * cfg.num_layers))
    nk = lambda: next(keys)

    def dense(out, inn):
        s = (1.0 / inn) ** 0.5
        return {
            "w": jax.random.uniform(nk(), (out, inn), dtype, -s, s),
            "b": jnp.zeros((out,), dtype),
        }

    def ln():
        return {"g": jnp.ones((D,), dtype), "b": jnp.zeros((D,), dtype)}

    layers = []
    for _ in range(cfg.num_layers):
        layers.append(
            {
                "ln1": ln(),
                "q": dense(D, D),
                "k": dense(D, D),
                "v": dense(D, D),
                "out": dense(D, D),
                "ln2": ln(),
                "fc1": dense(cfg.intermediate_size, D),
                "fc2": dense(D, cfg.intermediate_size),
            }
        )
    return {
        "patch_embed": jax.random.normal(nk(), (cfg.patch_size, cfg.patch_size, 3, D), dtype) * 0.02,
        "class_embedding": jax.random.normal(nk(), (D,), dtype) * 0.02,
        "pos_embed": jax.random.normal(nk(), (cfg.num_patches + 1, D), dtype) * 0.02,
        "pre_ln": ln(),
        "layers": layers,
        "post_ln": ln(),
    }


def apply(
    params,
    images: jax.Array,
    cfg: CLIPVisionConfig = VITB32_CLIP_CONFIG,
    policy: Policy = DEFAULT_POLICY,
    tap=None,
) -> jax.Array:
    """images: (B, H, W, 3) CLIP-normalized. Returns hidden states (B, 1+N, D).

    `tap`: optional callable applied to the LAST layer's ln1 output (the
    reference GradCAM target 'visual.transformer.resblocks.11.ln_1')."""
    x = images.astype(policy.compute_dtype)
    b = x.shape[0]
    dn = jax.lax.conv_dimension_numbers(
        x.shape, params["patch_embed"].shape, ("NHWC", "HWIO", "NHWC")
    )
    x = jax.lax.conv_general_dilated(
        x, params["patch_embed"].astype(x.dtype),
        (cfg.patch_size, cfg.patch_size), "VALID", dimension_numbers=dn,
    )
    x = x.reshape(b, -1, cfg.hidden_size)
    cls = jnp.broadcast_to(
        params["class_embedding"].astype(x.dtype)[None, None], (b, 1, cfg.hidden_size)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)[None]
    x = layer_norm(x, params["pre_ln"]["g"], params["pre_ln"]["b"], eps=cfg.layer_norm_eps)

    nh, hd = cfg.num_heads, cfg.head_dim
    s = x.shape[1]
    n_layers = len(params["layers"])
    for li, lp in enumerate(params["layers"]):
        hn = layer_norm(x, lp["ln1"]["g"], lp["ln1"]["b"], eps=cfg.layer_norm_eps)
        if tap is not None and li == n_layers - 1:
            hn = tap(hn)
        q = lora_dense(hn, lp["q"]["w"], lp["q"]["b"]).reshape(b, s, nh, hd)
        k = lora_dense(hn, lp["k"]["w"], lp["k"]["b"]).reshape(b, s, nh, hd)
        v = lora_dense(hn, lp["v"]["w"], lp["v"]["b"]).reshape(b, s, nh, hd)
        o = dot_product_attention(q, k, v).reshape(b, s, cfg.hidden_size)
        x = x + lora_dense(o, lp["out"]["w"], lp["out"]["b"])
        hn = layer_norm(x, lp["ln2"]["g"], lp["ln2"]["b"], eps=cfg.layer_norm_eps)
        ff = lora_dense(_act(cfg, lora_dense(hn, lp["fc1"]["w"], lp["fc1"]["b"])), lp["fc2"]["w"], lp["fc2"]["b"])
        x = x + ff
    return x


def cls_feature(params, images, cfg: CLIPVisionConfig = VITB32_CLIP_CONFIG, policy: Policy = DEFAULT_POLICY, tap=None):
    """The dgm-eval clip representation: ln_post(CLS) WITHOUT the visual
    projection (depth=0 default, `dgm_eval/models/clip.py:60-70`)."""
    h = apply(params, images, cfg, policy, tap=tap)
    cls = h[:, 0]
    return layer_norm(
        cls, params["post_ln"]["g"], params["post_ln"]["b"], eps=cfg.layer_norm_eps
    ).astype(jnp.float32)
