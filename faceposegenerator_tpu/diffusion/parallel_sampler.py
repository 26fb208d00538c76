"""Parallel-in-time sampling: Picard iteration over a sliding step window.

Latency lever (OPT-IN; the default sampler stays the exact sequential
reference path). The reference generates ONE image per `pipe()` call
(`/root/reference/inference_ID-Booth.py:138`), so at batch 1 most of the MXU
idles while 30 UNet calls run back-to-back. ParaDiGMS (arXiv:2305.16317)
breaks the sequential dependency: hold a window of W future latent states and
refine them TOGETHER by Picard fixed-point iteration —

    x_{s+1+i} <- x_s + sum_{j<=i} ( f_{s+j}(x_{s+j}) - x_{s+j} )

where f_j is one reverse-diffusion step (UNet eps + DDPM update + the
pre-drawn step noise). Every iteration runs ONE UNet call batched over the
whole window (W·2B rows with CFG), then slides the window past the prefix
whose update settled below tolerance. Sequential depth collapses from S UNet
calls to ~S/stride parallel iterations, each of which is a *wide* (MXU-
friendly) batch — trading idle throughput for wall-clock latency.

Exactness: the first window position is always computed from the already-
converged x_s, so its value is exact and the window always advances >= 1 per
iteration; with ``tolerance=0`` the scheme degenerates to the exact
sequential chain (regression-tested against `sampler.sample`).

TPU-first detail: the window axis is a batch axis, so on a `Mesh` it shards
over "data" like any other batch (`mesh=` arg). Parallel-in-time therefore
turns B=1 latency into the thing TPUs scale best — more chips on one image —
which no data-parallel layout can do at batch 1.

Noise handling matches `sampler.sample` exactly (same `fold_in` stream /
`noise_override` contract), so (seed -> image) parity with the sequential
sampler is a testable property, not a coincidence.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.compile import jit as _options_jit
from ..core.precision import Policy, DEFAULT_POLICY
from ..models import clip_text, unet2d, vae
from .sampler import SamplerModels
from .schedulers import DDPMSchedule


@functools.partial(
    _options_jit,
    # same sampler-specific XLA option default as `sampler.sample` (measured
    # +2% there; this is the same program family).
    tpu_default_options={"xla_tpu_enable_experimental_fusion_cost_model": "true"},
    static_argnames=(
        "models", "guidance_scale", "height", "width", "policy",
        "window", "tolerance", "max_iters", "mesh", "return_stats",
        "tome_ratio", "tome_min_tokens", "tome_ops",
    ),
)
def sample_parallel(
    params: dict,
    schedule: DDPMSchedule,
    input_ids: jax.Array,
    negative_input_ids: jax.Array,
    key: jax.Array,
    *,
    models: SamplerModels = SamplerModels(),
    guidance_scale: float = 5.0,
    height: int = 512,
    width: int = 512,
    policy: Policy = DEFAULT_POLICY,
    window: int = 8,
    tolerance: float = 0.1,
    max_iters: Optional[int] = None,
    lora: Optional[dict] = None,
    lora_scale: float | jax.Array = 1.0,
    noise_override: Optional[jax.Array] = None,
    mesh=None,
    return_stats: bool = False,
    tome_ratio: float = 0.0,
    tome_min_tokens: int = 4096,
    tome_ops: str = "attn",
):
    """Generate images with parallel-in-time DDPM sampling.

    Same I/O contract as `sampler.sample` (DDPM scheduler only): returns
    (B, H, W, 3) fp32 images in [0, 1]; with ``return_stats=True`` returns
    ``(images, n_iters)`` where ``n_iters`` is the number of Picard
    iterations executed (sequential depth; n_iters == S means no speedup).

    window: number of future steps refined per iteration (UNet batch is
      window * 2B rows). Clamped to S.
    tolerance: per-step acceptance threshold, relative to the DDPM step's
      own injected-noise std — a window position is converged when the mean
      squared change of its update is <= (tolerance * sigma_step)^2.
      0.0 reproduces the sequential chain exactly (one step per iteration).
    mesh: optional `jax.sharding.Mesh` with a "data" axis; the window-flat
      UNet batch is shard-constrained over it (parallel-in-time multi-chip
      latency scaling).
    """
    B = input_ids.shape[0]
    h, w = height // 8, width // 8
    S = schedule.num_inference_steps
    W = min(window, S)
    if max_iters is None:
        max_iters = 4 * S

    # --- per-request adapters: tile W x like `sample` tiles 2x for CFG -----
    lora_leaves = [] if lora is None else jax.tree.leaves(lora)
    per_request = bool(lora_leaves) and lora_leaves[0].ndim == 3
    text_lora = None if lora is None else lora.get("text_encoder")
    text_scale = lora_scale
    if per_request:
        text_lora = None if text_lora is None else jax.tree.map(
            lambda l: jnp.concatenate([l, l], axis=0), text_lora
        )
        if isinstance(lora_scale, jax.Array) and lora_scale.ndim == 1:
            text_scale = jnp.concatenate([lora_scale, lora_scale], axis=0)

    # --- text conditioning: [uncond; cond], then tiled along the window ----
    ids = jnp.concatenate([negative_input_ids, input_ids], axis=0)
    ctx = clip_text.apply(
        params["text_encoder"], ids, models.text_cfg, policy=policy,
        lora=text_lora, lora_scale=text_scale,
    )
    # UNet row layout is [W x B uncond ; W x B cond] (window-major inside
    # each half), so tile each CFG half W times.
    ctx_w = jnp.concatenate(
        [jnp.tile(ctx[:B], (W, 1, 1)), jnp.tile(ctx[B:], (W, 1, 1))], axis=0
    )
    unet_lora = None if lora is None else lora.get("unet")
    unet_scale = lora_scale
    if per_request:
        unet_lora = None if unet_lora is None else jax.tree.map(
            lambda l: jnp.concatenate([jnp.tile(l, (W, 1, 1))] * 2, axis=0),
            unet_lora,
        )
        if isinstance(lora_scale, jax.Array) and lora_scale.ndim == 1:
            unet_scale = jnp.concatenate([jnp.tile(lora_scale, W)] * 2, axis=0)

    # --- initial latent + the full pre-drawn step-noise table --------------
    # identical stream to `sampler.sample`: split once for x_T, then
    # fold_in(key, i) per step (or the (S+1, B, h, w, 4) noise_override).
    if noise_override is not None:
        x_init = noise_override[0]
        Z = noise_override[1:]
    else:
        key, sub = jax.random.split(key)
        x_init = jax.random.normal(sub, (B, h, w, 4), jnp.float32)
        Z = jax.vmap(
            lambda i: jax.random.normal(
                jax.random.fold_in(key, i), (B, h, w, 4), jnp.float32
            )
        )(jnp.arange(S))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        row_sharding = NamedSharding(mesh, P("data", None, None, None))

    def window_eps(X_win, idxs):
        """One UNet call over the whole window: (W, B, ...) -> eps (W, B, ...)."""
        flat = X_win.reshape(W * B, h, w, 4)
        lat = jnp.concatenate([flat, flat], axis=0)
        if mesh is not None:
            lat = jax.lax.with_sharding_constraint(lat, row_sharding)
        t = schedule.timesteps[idxs]  # (W,)
        t2 = jnp.tile(jnp.repeat(t, B), (2,))  # (2WB,) rows line up with lat
        eps = unet2d.apply(
            params["unet"], lat, t2, ctx_w, models.unet_cfg, policy=policy,
            lora=unet_lora, lora_scale=unet_scale, attn_impl=models.attn_impl,
            tome_ratio=tome_ratio, tome_min_tokens=tome_min_tokens,
            tome_ops=tome_ops,
        )
        eps_u, eps_c = jnp.split(eps, 2, axis=0)
        g = eps_u + guidance_scale * (eps_c - eps_u)
        return g.reshape(W, B, h, w, 4)

    # one reverse step per window position (vmapped over the step index)
    vstep = jax.vmap(
        lambda eps, i, x, z: schedule.step(eps, i, x, z)[0],
        in_axes=(0, 0, 0, 0),
    )

    # State buffer X[i] = current guess for the latent after i steps,
    # padded by W so window writes near the end land in scratch space.
    # All guesses init to x_T (the ParaDiGMS/diffusers convention).
    X0 = jnp.broadcast_to(x_init, (S + W, B, h, w, 4)).astype(jnp.float32)
    offs = jnp.arange(W)

    def body(carry):
        X, s, it = carry
        idxs = jnp.clip(s + offs, 0, S - 1)  # (W,) step indices (clamped pad)
        X_win = jax.lax.dynamic_slice_in_dim(X, s, W, axis=0)
        eps = window_eps(X_win, idxs)
        f = vstep(eps, idxs, X_win, Z[idxs])  # f_j(x_j) incl. step noise
        # Picard update: new[i] is the refreshed guess for X[s+1+i]
        new = X_win[0][None] + jnp.cumsum(f - X_win, axis=0)
        old = jax.lax.dynamic_slice_in_dim(X, s + 1, W, axis=0)
        # acceptance: mean-squared change per (position, sample), worst
        # sample governs; threshold relative to the step's own noise power
        err = jnp.max(jnp.mean((new - old) ** 2, axis=(2, 3, 4)), axis=1)
        var = schedule.variance(
            schedule.timesteps[idxs], schedule.prev_timesteps[idxs]
        )
        ok = err <= (tolerance**2) * var
        # position 0 is computed from the converged x_s => exact by
        # construction; accepting it unconditionally guarantees progress
        ok = ok.at[0].set(True)
        ok = jnp.where(s + offs >= S, True, ok)  # padding never blocks
        stride = jnp.sum(jnp.cumprod(ok.astype(jnp.int32)))
        X = jax.lax.dynamic_update_slice_in_dim(X, new, s + 1, axis=0)
        return X, jnp.minimum(s + stride, S), it + 1

    X, s, iters = jax.lax.while_loop(
        lambda c: jnp.logical_and(c[1] < S, c[2] < max_iters),
        body,
        (X0, jnp.int32(0), jnp.int32(0)),
    )

    images = vae.decode(params["vae"], X[S], models.vae_cfg, policy=policy)
    images = jnp.clip(images * 0.5 + 0.5, 0.0, 1.0)
    if return_stats:
        return images, iters
    return images
