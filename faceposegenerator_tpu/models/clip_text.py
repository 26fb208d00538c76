"""CLIP text encoder (SD2.1's OpenCLIP ViT-H text tower) in functional JAX.

The reference consumes `transformers.CLIPTextModel` from the SD2.1-base
checkpoint inside `encode_prompt` (`train_ID-Booth.py:474-492,1024`) and via
the diffusers pipeline at inference. Operating point: vocab 49408, hidden
1024, 23 layers, 16 heads, MLP 4096, exact (erf) GELU, causal mask, 77
max positions; the conditioning tensor is the final LayerNorm output
(`last_hidden_state`).

Params are a nested dict pytree whose leaf orientation matches torch Linear
(`w`: (out, in)) so the safetensors bridge is a pure key-mapping. The
q/k/v/out projections accept optional LoRA pairs — the reference can train
text-encoder LoRA (`train_ID-Booth.py:683-688`, off by default).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.precision import Policy, DEFAULT_POLICY
from ..ops.norms import layer_norm
from ..ops.lora import lora_dense


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 1024
    num_layers: int = 23
    num_heads: int = 16
    intermediate_size: int = 4096
    max_positions: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "gelu"  # exact erf gelu (SD2); "quick_gelu" for SD1.x

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


SD21_TEXT_CONFIG = CLIPTextConfig()


def _act(cfg: CLIPTextConfig, x):
    if cfg.hidden_act == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if cfg.hidden_act == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    raise ValueError(cfg.hidden_act)


def _dense_init(key, out_dim, in_dim, dtype):
    scale = (1.0 / in_dim) ** 0.5
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (out_dim, in_dim), dtype, -scale, scale),
        "b": jnp.zeros((out_dim,), dtype),
    }


def init(key: jax.Array, cfg: CLIPTextConfig = SD21_TEXT_CONFIG, dtype=jnp.float32):
    keys = jax.random.split(key, 2 + cfg.num_layers)
    params = {
        "token_embedding": jax.random.normal(keys[0], (cfg.vocab_size, cfg.hidden_size), dtype) * 0.02,
        "position_embedding": jax.random.normal(keys[1], (cfg.max_positions, cfg.hidden_size), dtype) * 0.02,
        "final_ln": {"g": jnp.ones((cfg.hidden_size,), dtype), "b": jnp.zeros((cfg.hidden_size,), dtype)},
        "layers": [],
    }
    h, m = cfg.hidden_size, cfg.intermediate_size
    for i in range(cfg.num_layers):
        lk = jax.random.split(keys[2 + i], 6)
        params["layers"].append(
            {
                "ln1": {"g": jnp.ones((h,), dtype), "b": jnp.zeros((h,), dtype)},
                "q": _dense_init(lk[0], h, h, dtype),
                "k": _dense_init(lk[1], h, h, dtype),
                "v": _dense_init(lk[2], h, h, dtype),
                "out": _dense_init(lk[3], h, h, dtype),
                "ln2": {"g": jnp.ones((h,), dtype), "b": jnp.zeros((h,), dtype)},
                "fc1": _dense_init(lk[4], m, h, dtype),
                "fc2": _dense_init(lk[5], h, m, dtype),
            }
        )
    return params


def _self_attention(layer, x, cfg: CLIPTextConfig, lora=None, lora_scale=1.0):
    b, s, h = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim

    def proj(name):
        p = layer[name]
        la = lora[name] if lora is not None and name in lora else None
        return lora_dense(
            x, p["w"], p["b"],
            lora_a=None if la is None else la["a"],
            lora_b=None if la is None else la["b"],
            scale=lora_scale,
        )

    q = proj("q").reshape(b, s, nh, hd)
    k = proj("k").reshape(b, s, nh, hd)
    v = proj("v").reshape(b, s, nh, hd)

    # causal mask: CLIP text attention is autoregressive
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits.astype(jnp.float32) * (hd**-0.5)
    causal = jnp.tril(jnp.ones((s, s), bool))
    logits = jnp.where(causal[None, None], logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    attn = jnp.einsum("bhqk,bkhd->bqhd", w, v, preferred_element_type=jnp.float32).astype(x.dtype)
    attn = attn.reshape(b, s, h)

    p = layer["out"]
    la = lora["out"] if lora is not None and "out" in lora else None
    return lora_dense(
        attn, p["w"], p["b"],
        lora_a=None if la is None else la["a"],
        lora_b=None if la is None else la["b"],
        scale=lora_scale,
    )


def apply(
    params,
    input_ids: jax.Array,
    cfg: CLIPTextConfig = SD21_TEXT_CONFIG,
    policy: Policy = DEFAULT_POLICY,
    lora: Optional[dict] = None,
    lora_scale: float | jax.Array = 1.0,
) -> jax.Array:
    """Encode token ids (B, 77) -> last_hidden_state (B, 77, hidden)."""
    x = params["token_embedding"][input_ids]
    x = x + params["position_embedding"][None, : input_ids.shape[1]]
    x = x.astype(policy.compute_dtype)
    for i, layer in enumerate(params["layers"]):
        llora = None if lora is None else lora.get(f"layer_{i}")
        res = x
        x = layer_norm(x, layer["ln1"]["g"], layer["ln1"]["b"], cfg.layer_norm_eps)
        x = res + _self_attention(layer, x, cfg, llora, lora_scale)
        res = x
        x = layer_norm(x, layer["ln2"]["g"], layer["ln2"]["b"], cfg.layer_norm_eps)
        x = lora_dense(x, layer["fc1"]["w"], layer["fc1"]["b"])
        x = _act(cfg, x)
        x = lora_dense(x, layer["fc2"]["w"], layer["fc2"]["b"])
        x = res + x
    x = layer_norm(x, params["final_ln"]["g"], params["final_ln"]["b"], cfg.layer_norm_eps)
    return x
