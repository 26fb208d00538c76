"""Normalisation ops with fp32 statistics.

GroupNorm(+SiLU) is the elementwise glue of every UNet/VAE resblock
(SURVEY.md §2.6); it is written so XLA fuses the normalisation into the
surrounding convolution epilogue. Layout is NHWC (channels-last — the TPU
native conv layout).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def group_norm(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-6,
    act: Optional[str] = None,
) -> jax.Array:
    """GroupNorm over NHWC (or N...C) with optional fused SiLU activation.

    TPU layout note: statistics are computed as per-channel spatial
    reductions in the native (N, HW, C) layout (C rides the 128-lane dim),
    then folded across each group's channels on the tiny (N, G, C/G) array —
    mathematically identical to the naive grouped reshape but avoids big
    reductions over a lane-misaligned (…, C/G) trailing dim (C/G is 10–40
    for SD's GN32). The normalize/scale/activation stays fully aligned and
    fuses into the surrounding conv.

    With GN_IMPL=pallas, eligible shapes route to the single-HBM-read slab
    kernel (`ops/fused_gn.py`); everything else keeps this XLA formulation.
    """
    from .fused_gn import fused_group_norm, gn_impl, slab_supported

    n_, c_ = x.shape[0], x.shape[-1]
    s_ = 1
    for d in x.shape[1:-1]:
        s_ *= d
    if (
        gn_impl() == "pallas"
        and jax.default_backend() == "tpu"
        and slab_supported(n_, s_, c_, num_groups)
    ):
        return fused_group_norm(x, gamma, beta, num_groups, eps, act)
    orig_dtype = x.dtype
    n = x.shape[0]
    c = x.shape[-1]
    spatial = x.shape[1:-1]
    g = num_groups
    x32 = x.astype(jnp.float32).reshape(n, -1, c)
    # per-channel spatial moments (aligned reduction)
    ch_mean = jnp.mean(x32, axis=1)  # (n, c)
    ch_sq = jnp.mean(jnp.square(x32), axis=1)  # (n, c)
    # fold channels within each group (tiny arrays)
    gmean = jnp.mean(ch_mean.reshape(n, g, c // g), axis=2)  # (n, g)
    gsq = jnp.mean(ch_sq.reshape(n, g, c // g), axis=2)
    gvar = gsq - jnp.square(gmean)
    # broadcast back to per-channel scale/shift and fold in gamma/beta
    inv = jax.lax.rsqrt(gvar + eps)  # (n, g)
    inv_c = jnp.repeat(inv, c // g, axis=1)  # (n, c)
    mean_c = jnp.repeat(gmean, c // g, axis=1)
    scale = inv_c * gamma.astype(jnp.float32)[None, :]
    shift = beta.astype(jnp.float32)[None, :] - mean_c * scale
    out = x32 * scale[:, None, :] + shift[:, None, :]
    out = out.reshape(n, *spatial, c)
    if act == "silu":
        out = out * jax.nn.sigmoid(out)
    elif act is not None:
        raise ValueError(act)
    return out.astype(orig_dtype)


def layer_norm(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    eps: float = 1e-5,
) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    out = out * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return out.astype(x.dtype)


def rms_norm(x: jax.Array, gamma: jax.Array, eps: float = 1e-6) -> jax.Array:
    x32 = x.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.mean(jnp.square(x32), axis=-1, keepdims=True) + eps)
    return (x32 * scale * gamma.astype(jnp.float32)).astype(x.dtype)


def batch_norm_inference(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    eps: float = 1e-5,
) -> jax.Array:
    """Inference-mode BatchNorm (frozen running stats) — folds to a single
    scale+shift; used by the frozen ArcFace IResNet (SURVEY.md §2.2)."""
    scale = gamma.astype(jnp.float32) * jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    shift = beta.astype(jnp.float32) - mean.astype(jnp.float32) * scale
    return (x.astype(jnp.float32) * scale + shift).astype(x.dtype)


def batch_norm_train(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    running_mean: jax.Array,
    running_var: jax.Array,
    momentum: float = 0.1,
    eps: float = 1e-5,
    axis_name: Optional[str] = None,
):
    """Training-mode BatchNorm over NHWC (stats over N,H,W) or NC.

    Returns (out, new_running_mean, new_running_var). If `axis_name` is given
    the batch statistics are psum-averaged across that mesh axis (the
    cross-replica sync DDP gives the reference for free).
    """
    x32 = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x32, axis=axes)
    var = jnp.mean(jnp.square(x32), axis=axes) - jnp.square(mean)
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        var = jax.lax.pmean(var, axis_name)
    n = 1
    for a in axes:
        n *= x.shape[a]
    unbiased = var * (n / max(n - 1, 1))
    new_mean = (1 - momentum) * running_mean + momentum * mean
    new_var = (1 - momentum) * running_var + momentum * unbiased
    out = (x32 - mean) * jax.lax.rsqrt(var + eps) * gamma.astype(jnp.float32) + beta.astype(
        jnp.float32
    )
    return out.astype(x.dtype), new_mean, new_var
