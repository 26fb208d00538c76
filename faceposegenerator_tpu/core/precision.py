"""Precision policy for TPU compute.

The reference runs fp16 mixed precision with fp32-upcast LoRA params
(`train_ID-Booth.py:639-651,778-785`) and `allow_tf32` (`:770-771`). On TPU
the idiomatic equivalent is bfloat16 compute with fp32 parameters and fp32
accumulation on the MXU (`preferred_element_type=float32`). A strict fp32
"parity" policy exists for bit-comparability testing against the reference's
CPU fp32 path (BASELINE.md numerical-parity requirement).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Dtype policy threaded through every model's apply function.

    param_dtype:   dtype parameters are stored in (fp32 by default).
    compute_dtype: dtype activations/matmul inputs are cast to.
    accum_dtype:   dtype for MXU accumulation / reductions / norms.
    """

    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16
    accum_dtype: Any = jnp.float32

    def cast(self, x):
        """Cast an activation (or pytree of them) to the compute dtype."""
        return jax.tree.map(
            lambda a: a.astype(self.compute_dtype)
            if isinstance(a, jax.Array) and jnp.issubdtype(a.dtype, jnp.floating)
            else a,
            x,
        )

    def cast_params(self, params):
        """Cast floating-point leaves of a param pytree to compute dtype."""
        return jax.tree.map(
            lambda a: a.astype(self.compute_dtype)
            if jnp.issubdtype(a.dtype, jnp.floating)
            else a,
            params,
        )


DEFAULT_POLICY = Policy()
# Strict fp32 everywhere: used for per-denoising-step parity checks.
PARITY_POLICY = Policy(compute_dtype=jnp.float32)


def upcast_norm(x):
    """Norms/softmax statistics are always computed in fp32."""
    return x.astype(jnp.float32)
