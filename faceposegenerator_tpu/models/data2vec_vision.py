"""Data2Vec-Vision (BEiT) encoder in functional JAX — the dgm-eval
"data2vec" encoder.

The reference loads `facebook/data2vec-vision-large` and uses
`pooler_output` (`Evaluation/dgm-eval/dgm_eval/models/data2vec.py:35-60`) =
LayerNorm(mean of patch tokens) under BEiT's use_mean_pooling.

BEiT architecture (≠ plain ViT): NO absolute position embeddings — each
layer's attention adds a learned RELATIVE position bias (a
((2g−1)²+3, heads) table indexed by a precomputed (N+1, N+1) relative-
distance map with special CLS rows); the key projection has no bias;
residuals are LayerScale-weighted (lambda_1/lambda_2); LN eps 1e-12.
The bias is materialized once per layer as (heads, N+1, N+1) and added to
the attention logits — explicit einsum attention (eval-only encoder).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.lora import lora_dense
from ..ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class Data2VecVisionConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    patch_size: int = 16
    image_size: int = 224
    layer_norm_eps: float = 1e-12

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_rel_distance(self) -> int:
        return (2 * self.grid - 1) ** 2 + 3


D2V_LARGE_CONFIG = Data2VecVisionConfig()


def relative_position_index(grid: int) -> np.ndarray:
    """BEiT's (N+1, N+1) relative-distance index with the three CLS slots
    (transformers `Data2VecVisionRelativePositionBias` semantics)."""
    w = grid
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)  # N,N,2
    rel = rel + (w - 1)
    rel[:, :, 0] *= 2 * w - 1
    n = w * w
    num = (2 * w - 1) ** 2 + 3
    idx = np.zeros((n + 1, n + 1), np.int32)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num - 3
    idx[0:, 0] = num - 2
    idx[0, 0] = num - 1
    return idx


def init(key: jax.Array, cfg: Data2VecVisionConfig = D2V_LARGE_CONFIG, dtype=jnp.float32):
    D = cfg.hidden_size
    keys = iter(jax.random.split(key, 8 + 8 * cfg.num_layers))
    nk = lambda: next(keys)

    def dense(out, inn, bias=True):
        s = (1.0 / inn) ** 0.5
        p = {"w": jax.random.uniform(nk(), (out, inn), dtype, -s, s)}
        if bias:
            p["b"] = jnp.zeros((out,), dtype)
        return p

    def ln():
        return {"g": jnp.ones((D,), dtype), "b": jnp.zeros((D,), dtype)}

    layers = []
    for _ in range(cfg.num_layers):
        layers.append(
            {
                "norm1": ln(),
                "q": dense(D, D),
                "k": dense(D, D, bias=False),  # BEiT: key has no bias
                "v": dense(D, D),
                "out": dense(D, D),
                "rel_bias": jax.random.normal(nk(), (cfg.num_rel_distance, cfg.num_heads), dtype) * 0.02,
                "ls1": jnp.full((D,), 0.1, dtype),
                "norm2": ln(),
                "fc1": dense(cfg.intermediate_size, D),
                "fc2": dense(D, cfg.intermediate_size),
                "ls2": jnp.full((D,), 0.1, dtype),
            }
        )
    return {
        "patch_embed": {
            "w": jax.random.normal(nk(), (cfg.patch_size, cfg.patch_size, 3, D), dtype) * 0.02,
            "b": jnp.zeros((D,), dtype),
        },
        "cls_token": jax.random.normal(nk(), (1, 1, D), dtype) * 0.02,
        "layers": layers,
        "pooler_norm": ln(),
    }


def apply(params, images: jax.Array, cfg: Data2VecVisionConfig = D2V_LARGE_CONFIG) -> jax.Array:
    """images: (B, H, W, 3) normalized. Returns hidden states (B, 1+N, D)."""
    x = images.astype(jnp.float32)
    b = x.shape[0]
    pe = params["patch_embed"]
    dn = jax.lax.conv_dimension_numbers(x.shape, pe["w"].shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, pe["w"], (cfg.patch_size, cfg.patch_size), "VALID", dimension_numbers=dn
    ) + pe["b"]
    grid = x.shape[1]
    x = x.reshape(b, grid * grid, cfg.hidden_size)
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)  # NO absolute position embeddings

    idx = jnp.asarray(relative_position_index(grid))  # (S, S)
    nh, hd = cfg.num_heads, cfg.head_dim
    s = x.shape[1]
    scale = hd**-0.5
    for lp in params["layers"]:
        hn = layer_norm(x, lp["norm1"]["g"], lp["norm1"]["b"], eps=cfg.layer_norm_eps)
        q = lora_dense(hn, lp["q"]["w"], lp["q"]["b"]).reshape(b, s, nh, hd)
        k = lora_dense(hn, lp["k"]["w"], None).reshape(b, s, nh, hd)
        v = lora_dense(hn, lp["v"]["w"], lp["v"]["b"]).reshape(b, s, nh, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
        bias = lp["rel_bias"][idx.reshape(-1)].reshape(s, s, nh).transpose(2, 0, 1)
        logits = logits + bias[None].astype(jnp.float32)
        w = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, s, cfg.hidden_size)
        o = lora_dense(o, lp["out"]["w"], lp["out"]["b"])
        x = x + lp["ls1"] * o
        hn = layer_norm(x, lp["norm2"]["g"], lp["norm2"]["b"], eps=cfg.layer_norm_eps)
        ff = lora_dense(jax.nn.gelu(lora_dense(hn, lp["fc1"]["w"], lp["fc1"]["b"]), approximate=False),
                        lp["fc2"]["w"], lp["fc2"]["b"])
        x = x + lp["ls2"] * ff
    return x


def pooled_feature(params, images, cfg: Data2VecVisionConfig = D2V_LARGE_CONFIG) -> jax.Array:
    """pooler_output: LayerNorm(mean of PATCH tokens) — BEiT use_mean_pooling
    (the dgm-eval data2vec representation)."""
    h = apply(params, images, cfg)
    pooled = jnp.mean(h[:, 1:], axis=1)
    return layer_norm(
        pooled, params["pooler_norm"]["g"], params["pooler_norm"]["b"], eps=cfg.layer_norm_eps
    ).astype(jnp.float32)
