"""AutoencoderKL (SD2.1 VAE) in functional JAX, NHWC.

The reference uses the diffusers `AutoencoderKL` for per-step latent encode
during training (`train_ID-Booth.py:1001`), x̂0 decode for the identity loss
(`:1084,1114`, via `latents_to_image_for_mtcnn:433`), and final decode in the
sampling pipeline. Operating point (SD `vae/config.json` semantics): block
channels (128, 256, 512, 512), 2 layers/block, 4 latent channels, GN(32,
eps 1e-6), mid-block single-head attention at 512 channels, scaling factor
0.18215 (`train_ID-Booth.py:420` divides by it on decode).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.precision import Policy, DEFAULT_POLICY
from ..ops.norms import group_norm
from ..ops.lora import lora_dense
from .unet2d import conv2d, _conv_init, _dense_init, _gn_init


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    scaling_factor: float = 0.18215


SD_VAE_CONFIG = VAEConfig()


def _resblock_init(key, cin, cout, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": _gn_init(cin, dtype),
        "conv1": _conv_init(ks[0], 3, 3, cin, cout, dtype),
        "norm2": _gn_init(cout, dtype),
        "conv2": _conv_init(ks[1], 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["conv_shortcut"] = _conv_init(ks[2], 1, 1, cin, cout, dtype)
    return p


def _resblock_apply(p, x):
    h = group_norm(x, p["norm1"]["g"], p["norm1"]["b"], num_groups=32, eps=1e-6, act="silu")
    h = conv2d(h, p["conv1"])
    h = group_norm(h, p["norm2"]["g"], p["norm2"]["b"], num_groups=32, eps=1e-6, act="silu")
    h = conv2d(h, p["conv2"])
    if "conv_shortcut" in p:
        x = conv2d(x, p["conv_shortcut"], padding=0)
    return x + h


def _attn_init(key, c, dtype):
    ks = jax.random.split(key, 4)
    return {
        "norm": _gn_init(c, dtype),
        "q": _dense_init(ks[0], c, c, dtype),
        "k": _dense_init(ks[1], c, c, dtype),
        "v": _dense_init(ks[2], c, c, dtype),
        "out": _dense_init(ks[3], c, c, dtype),
    }


def _attn_apply(p, x, attn_impl: str = "auto"):
    """Single-head full-channel self-attention over spatial tokens.

    At 512² decode this is 4096 tokens × 512 channels — the O(S²) logits
    would be a ~1 GB/image fp32 transient; head_dim 512 is lane-aligned so
    the Pallas flash path applies (`ops.flash_attention`)."""
    from ..ops.attention import dot_product_attention

    b, h, w, c = x.shape
    res = x
    xn = group_norm(x, p["norm"]["g"], p["norm"]["b"], num_groups=32, eps=1e-6)
    t = xn.reshape(b, h * w, c)
    q = lora_dense(t, p["q"]["w"], p["q"]["b"]).reshape(b, h * w, 1, c)
    k = lora_dense(t, p["k"]["w"], p["k"]["b"]).reshape(b, h * w, 1, c)
    v = lora_dense(t, p["v"]["w"], p["v"]["b"]).reshape(b, h * w, 1, c)
    o = dot_product_attention(q, k, v, impl=attn_impl).reshape(b, h * w, c)
    o = lora_dense(o, p["out"]["w"], p["out"]["b"])
    return res + o.reshape(b, h, w, c)


def init(key: jax.Array, cfg: VAEConfig = SD_VAE_CONFIG, dtype=jnp.float32):
    C = list(cfg.block_out_channels)
    keys = iter(jax.random.split(key, 128))
    nk = lambda: next(keys)

    # encoder
    enc = {"conv_in": _conv_init(nk(), 3, 3, cfg.in_channels, C[0], dtype), "down_blocks": []}
    cin = C[0]
    for lvl, cout in enumerate(C):
        block = {"resnets": [], "downsample": None}
        for j in range(cfg.layers_per_block):
            block["resnets"].append(_resblock_init(nk(), cin if j == 0 else cout, cout, dtype))
        if lvl < len(C) - 1:
            block["downsample"] = _conv_init(nk(), 3, 3, cout, cout, dtype)
        enc["down_blocks"].append(block)
        cin = cout
    enc["mid"] = {
        "res1": _resblock_init(nk(), C[-1], C[-1], dtype),
        "attn": _attn_init(nk(), C[-1], dtype),
        "res2": _resblock_init(nk(), C[-1], C[-1], dtype),
    }
    enc["norm_out"] = _gn_init(C[-1], dtype)
    enc["conv_out"] = _conv_init(nk(), 3, 3, C[-1], 2 * cfg.latent_channels, dtype)

    # decoder
    rev = list(reversed(C))
    dec = {"conv_in": _conv_init(nk(), 3, 3, cfg.latent_channels, rev[0], dtype)}
    dec["mid"] = {
        "res1": _resblock_init(nk(), rev[0], rev[0], dtype),
        "attn": _attn_init(nk(), rev[0], dtype),
        "res2": _resblock_init(nk(), rev[0], rev[0], dtype),
    }
    dec["up_blocks"] = []
    cin = rev[0]
    for lvl, cout in enumerate(rev):
        block = {"resnets": [], "upsample": None}
        for j in range(cfg.layers_per_block + 1):
            block["resnets"].append(_resblock_init(nk(), cin if j == 0 else cout, cout, dtype))
        if lvl < len(rev) - 1:
            block["upsample"] = _conv_init(nk(), 3, 3, cout, cout, dtype)
        dec["up_blocks"].append(block)
        cin = cout
    dec["norm_out"] = _gn_init(C[0], dtype)
    dec["conv_out"] = _conv_init(nk(), 3, 3, C[0], cfg.in_channels, dtype)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv_init(nk(), 1, 1, 2 * cfg.latent_channels, 2 * cfg.latent_channels, dtype),
        "post_quant_conv": _conv_init(nk(), 1, 1, cfg.latent_channels, cfg.latent_channels, dtype),
    }


def encode_moments(
    params, images: jax.Array, cfg: VAEConfig = SD_VAE_CONFIG, policy: Policy = DEFAULT_POLICY
) -> Tuple[jax.Array, jax.Array]:
    """images (B, H, W, 3) in [-1, 1] -> (mean, logvar), each (B, H/8, W/8, 4)."""
    enc = params["encoder"]
    x = images.astype(policy.compute_dtype)
    x = conv2d(x, enc["conv_in"])
    for block in enc["down_blocks"]:
        for rp in block["resnets"]:
            x = _resblock_apply(rp, x)
        if block["downsample"] is not None:
            # diffusers VAE downsample uses asymmetric (0,1) padding
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = conv2d(x, block["downsample"], stride=2, padding=0)
    x = _resblock_apply(enc["mid"]["res1"], x)
    x = _attn_apply(enc["mid"]["attn"], x)
    x = _resblock_apply(enc["mid"]["res2"], x)
    x = group_norm(x, enc["norm_out"]["g"], enc["norm_out"]["b"], num_groups=32, eps=1e-6, act="silu")
    x = conv2d(x, enc["conv_out"])
    x = conv2d(x, params["quant_conv"], padding=0)
    mean, logvar = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def sample_latents(moments, noise_key: jax.Array, cfg: VAEConfig = SD_VAE_CONFIG) -> jax.Array:
    """Sample from the diagonal Gaussian and apply the scaling factor
    (`train_ID-Booth.py:1001`: `.latent_dist.sample() * 0.18215`)."""
    mean, logvar = moments
    noise = jax.random.normal(noise_key, mean.shape, mean.dtype)
    return (mean + jnp.exp(0.5 * logvar) * noise) * cfg.scaling_factor


def decode(
    params, latents: jax.Array, cfg: VAEConfig = SD_VAE_CONFIG, policy: Policy = DEFAULT_POLICY
) -> jax.Array:
    """Scaled latents (B, h, w, 4) -> images (B, 8h, 8w, 3) in [-1, 1]."""
    dec = params["decoder"]
    x = (latents / cfg.scaling_factor).astype(policy.compute_dtype)
    x = conv2d(x, params["post_quant_conv"], padding=0)
    x = conv2d(x, dec["conv_in"])
    x = _resblock_apply(dec["mid"]["res1"], x)
    x = _attn_apply(dec["mid"]["attn"], x)
    x = _resblock_apply(dec["mid"]["res2"], x)
    for block in dec["up_blocks"]:
        for rp in block["resnets"]:
            x = _resblock_apply(rp, x)
        if block["upsample"] is not None:
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            x = conv2d(x, block["upsample"])
    x = group_norm(x, dec["norm_out"]["g"], dec["norm_out"]["b"], num_groups=32, eps=1e-6, act="silu")
    x = conv2d(x, dec["conv_out"])
    return x.astype(jnp.float32)
