"""Deterministic RNG threading.

Replaces the reference's ad-hoc seeding (`accelerate.utils.set_seed(0)` and
per-identity `torch.Generator.manual_seed(id_number)` at
`inference_ID-Booth.py:67,111`) with explicit JAX PRNG key streams. The
per-identity seed contract is preserved: `sampler_key(identity_index)` gives
every model variant (DreamBooth/PortraitBooth/ID-Booth) identical noise for a
given identity, which is what makes the reference's 3-way comparison grids
comparable.
"""

from __future__ import annotations

from typing import Iterator

import jax


def root_key(seed: int = 0) -> jax.Array:
    return jax.random.key(seed)


def sampler_key(identity_index: int) -> jax.Array:
    """Per-identity generation key (reference: `inference_ID-Booth.py:111`)."""
    return jax.random.key(identity_index)


def split_stream(key: jax.Array) -> Iterator[jax.Array]:
    """Infinite stream of fresh keys (host-side loop use only)."""
    while True:
        key, sub = jax.random.split(key)
        yield sub


def train_step_key(key: jax.Array, step: int) -> jax.Array:
    """Stateless per-step key: fold the step counter in, jit-friendly."""
    return jax.random.fold_in(key, step)
