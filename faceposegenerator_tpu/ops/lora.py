"""LoRA projection ops.

The reference wires rank-4 peft adapters onto the UNet attention projections
to_q/to_k/to_v/to_out and optionally the text-encoder q/k/v/out projections
(`train_ID-Booth.py:671-688`; rank at `configs/config_train_SD21.py:48`).

Here LoRA stays *factored* at all times: y = x·Wᵀ + scale · (x·Aᵀ)·Bᵀ with
A: (r, in), B: (out, r). The pytree structure (and therefore the compiled
program) is identical with or without an adapter — zero B means identity —
so checkpoints load and "merge" without recompilation (SURVEY.md §7 hard
part (c)). `scale = alpha / r` (peft convention; reference uses alpha = r =
4 so scale = 1).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def broadcast_scale(scale, ndim: int):
    """A per-sample scale vector (B,) broadcast against a (B, ..., out)
    delta; scalars pass through."""
    if isinstance(scale, jax.Array) and scale.ndim == 1:
        return scale.reshape((-1,) + (1,) * (ndim - 1))
    return scale


def lora_delta(x: jax.Array, lora_a: jax.Array, lora_b: jax.Array) -> jax.Array:
    """Factored LoRA delta (x·Aᵀ)·Bᵀ, unscaled.

    lora_a: (r, in) / lora_b: (out, r) — one adapter for the whole batch; or
    (B, r, in) / (B, out, r) — PER-SAMPLE adapters (heterogeneous-LoRA
    batching: slot b of x uses adapter b; x's leading dim must be B). The
    batched form is two tiny rank-r batched GEMMs — the multi-tenant serving
    path pays ~nothing over the shared-adapter form.
    """
    if lora_a.ndim == 3:
        h = jnp.einsum("b...i,bri->b...r", x, lora_a.astype(x.dtype), preferred_element_type=jnp.float32)
        return jnp.einsum("b...r,bor->b...o", h.astype(x.dtype), lora_b.astype(x.dtype), preferred_element_type=jnp.float32)
    h = jnp.einsum("...i,ri->...r", x, lora_a.astype(x.dtype), preferred_element_type=jnp.float32)
    return jnp.einsum("...r,or->...o", h.astype(x.dtype), lora_b.astype(x.dtype), preferred_element_type=jnp.float32)


def lora_dense(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    lora_a: Optional[jax.Array] = None,
    lora_b: Optional[jax.Array] = None,
    scale: float | jax.Array = 1.0,
) -> jax.Array:
    """Dense layer with optional factored LoRA delta.

    w: (out, in) — torch Linear orientation, kept so diffusers/peft
    checkpoints map 1:1. lora_a: (r, in), lora_b: (out, r) — or per-sample
    (B, r, in)/(B, out, r) with a (B,) scale (see `lora_delta`).

    `w` may also be a quantized-weight dict (`ops/quant.py`, opt-in w8a8):
    the base matmul then runs int8 on the MXU while the LoRA delta stays
    factored bf16 on the unquantized activations — adapters compose with
    quantized bases unchanged.
    """
    from . import quant

    if quant.is_quantized(w):
        y = quant.qdense(x, w)
    else:
        y = jnp.einsum("...i,oi->...o", x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    if lora_a is not None and lora_b is not None:
        d = lora_delta(x, lora_a, lora_b)
        y = y + broadcast_scale(scale, d.ndim) * d
    y = y.astype(x.dtype)
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def init_lora_pair(key: jax.Array, out_dim: int, in_dim: int, rank: int, dtype=jnp.float32):
    """Gaussian A, zero B — peft's `init_lora_weights="gaussian"` scheme the
    reference selects (`train_ID-Booth.py:676`)."""
    a = jax.random.normal(key, (rank, in_dim), dtype) / rank
    b = jnp.zeros((out_dim, rank), dtype)
    return a, b
