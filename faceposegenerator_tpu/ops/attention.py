"""Scaled dot-product attention: jnp reference + Pallas flash dispatch.

Owns the attention compute the reference delegates to cuDNN/xFormers
(`train_ID-Booth.py:653-664`, SURVEY.md §2.6). The UNet needs:
  - self-attention over 4096 latent tokens (64² at 512² resolution) per head
    dim 64 — the hot kernel, served by the Pallas flash kernel;
  - cross-attention with 77 text tokens — tiny KV, also flash-served with a
    padded+masked KV block.

Layout is (batch, seq, heads, head_dim) ("BSHD"). Softmax statistics are
always fp32 regardless of the compute dtype.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _reference_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    kv_len: Optional[int] = None,
) -> jax.Array:
    """Plain einsum attention with fp32 softmax. Shapes: (B, S, H, D)."""
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits.astype(jnp.float32) * scale
    if kv_len is not None and kv_len < k.shape[1]:
        mask = jnp.arange(k.shape[1]) < kv_len
        logits = jnp.where(mask[None, None, None, :], logits, -jnp.inf)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v, preferred_element_type=jnp.float32).astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("impl", "scale", "kv_len"))
def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    impl: str = "auto",
    kv_len: Optional[int] = None,
) -> jax.Array:
    """Non-causal multi-head attention.

    q: (B, Sq, H, D); k, v: (B, Skv, H, D). `impl` ∈ {auto, flash, reference}.
    `kv_len` masks out padded KV positions (used for 77-token text context
    padded to a lane-aligned length).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if impl == "reference":
        return _reference_attention(q, k, v, scale, kv_len)
    if impl == "flash_int8":
        # OPT-IN int8 attention core (SageAttention-style, inference only):
        # packed d=64 heads run int8 QKᵀ/PV on the MXU's 2× int8 path;
        # other head dims fall back to the exact bf16 flash kernel inside.
        from .flash_attention import flash_attention_int8

        return flash_attention_int8(q, k, v, scale=scale, kv_len=kv_len)
    if impl in ("auto", "flash"):
        from .flash_attention import flash_attention, flash_supported

        if impl == "flash" or flash_supported(q, k, v):
            return flash_attention(q, k, v, scale=scale, kv_len=kv_len)
        return _reference_attention(q, k, v, scale, kv_len)
    raise ValueError(f"unknown attention impl {impl!r}")
