"""Full-chain per-step parity: the JITTED sampler vs an all-torch loop.

BASELINE.md's parity criterion is "fp32 bit-comparable PER DENOISING STEP"
over the whole CLIP→UNet→scheduler→VAE chain — not per-model. The
per-model parity tests (tests/test_unet_vae_torch_parity.py,
tests/test_clip_hf_parity.py) certify each block; THIS module certifies
the chain wiring of the deployed program: CFG batch order ([uncond; cond],
`inference_ID-Booth.py:138` semantics), guidance combination, noise-stream
indexing (initial latent at index 0, step i's DDPM noise at index i+1),
the scheduler update between UNet calls, and the final scaled VAE decode.

The JAX side runs the REAL `diffusion.sampler.sample` jit with
`return_trajectory=True` (the production fori_loop plus one dynamic-slice
write per step — not a rewritten eager loop). The torch side is a plain
Python loop over the torch mirrors (`bridge/torch_mirror.TUNet/TVAE`, a
`transformers.CLIPTextModel` text encoder) with the DDPM posterior update
re-implemented here in numpy from the published equations (Ho et al. 2020
eq. 6-7 with the "leading"-spacing timestep jump and fixed_small variance —
the semantics diffusers' DDPMScheduler.step implements and the reference
consumes at `inference_ID-Booth.py:104`). Identical pre-drawn noise feeds
both sides, so every step is comparable at fp32 tolerance.

Used by tests/test_full_chain_parity.py (tiny random mirrors, CPU) and
`cli parity --full_chain` (real checkpoint day — loads the SAME weight
files into both sides).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np


def ddpm_step_np(
    eps: np.ndarray,
    i: int,
    x: np.ndarray,
    noise: np.ndarray,
    acp: np.ndarray,
    timesteps: np.ndarray,
    prev_timesteps: np.ndarray,
) -> np.ndarray:
    """One reverse DDPM step x_t -> x_{t-1}, fp32 numpy.

    Independent of `diffusion.schedulers.DDPMSchedule.step`: written from
    the DDPM posterior q(x_{t-1} | x_t, x0) mean/variance with epsilon
    prediction, fixed_small variance (floored at 1e-20), no sample clipping
    — the SD2.1 scheduler-config semantics.
    """
    t = int(timesteps[i])
    pt = int(prev_timesteps[i])
    a_t = np.float32(acp[t])
    a_prev = np.float32(acp[pt]) if pt >= 0 else np.float32(1.0)

    x = x.astype(np.float32)
    x0 = (x - np.sqrt(1.0 - a_t) * eps.astype(np.float32)) / np.sqrt(a_t)

    alpha_t = a_t / a_prev
    beta_t = 1.0 - alpha_t
    mean = (np.sqrt(a_prev) * beta_t / (1.0 - a_t)) * x0 + (
        np.sqrt(alpha_t) * (1.0 - a_prev) / (1.0 - a_t)
    ) * x
    if t > 0:
        var = np.clip((1.0 - a_prev) / (1.0 - a_t) * beta_t, 1e-20, None)
        return (mean + np.sqrt(var) * noise.astype(np.float32)).astype(np.float32)
    return mean.astype(np.float32)


def torch_chain_trajectory(
    text_fn: Callable[[np.ndarray], np.ndarray],
    tm_unet,
    tm_vae,
    ids: np.ndarray,
    neg_ids: np.ndarray,
    noise: np.ndarray,
    schedule,
    guidance_scale: float,
):
    """All-torch mirror of the sampler chain. Returns (traj, images):
    traj[i] = x after scheduler step i, shape (S, B, h, w, 4) NHWC fp32;
    images in [0, 1] NHWC fp32 (same postprocess as `sample`).

    `text_fn(ids (2B,77)) -> (2B, 77, D)` context (e.g. a transformers
    CLIPTextModel forward); `noise` is the (S+1, B, h, w, 4) override
    stream fed to BOTH sides; `schedule` a `DDPMSchedule` (its constant
    TABLES are shared — table construction is covered by
    tests/test_schedulers.py — while the step MATH here is independent).
    """
    import torch

    acp = np.asarray(schedule.alphas_cumprod, np.float32)
    ts = np.asarray(schedule.timesteps)
    prev_ts = np.asarray(schedule.prev_timesteps)
    S = schedule.num_inference_steps
    B = ids.shape[0]

    # int64: torch embedding lookups require LongTensor indices
    ctx = text_fn(np.concatenate([neg_ids, ids], axis=0).astype(np.int64))
    ctx_t = torch.from_numpy(np.asarray(ctx, np.float32))

    x = noise[0].astype(np.float32)
    traj = np.zeros((S,) + x.shape, np.float32)
    with torch.no_grad():
        for i in range(S):
            lat = np.concatenate([x, x], axis=0)
            lat_t = torch.from_numpy(lat).permute(0, 3, 1, 2).contiguous()
            t_t = torch.tensor([int(ts[i])] * (2 * B))
            eps = tm_unet(lat_t, t_t, ctx_t).permute(0, 2, 3, 1).numpy()
            eps_u, eps_c = eps[:B], eps[B:]
            guided = eps_u + np.float32(guidance_scale) * (eps_c - eps_u)
            x = ddpm_step_np(guided, i, x, noise[i + 1], acp, ts, prev_ts)
            traj[i] = x
        img = tm_vae.decode(
            torch.from_numpy(x).permute(0, 3, 1, 2).contiguous()
        ).permute(0, 2, 3, 1).numpy()
    return traj, np.clip(img * 0.5 + 0.5, 0.0, 1.0)


def compare_full_chain(
    params: dict,
    models,
    text_fn: Callable[[np.ndarray], np.ndarray],
    tm_unet,
    tm_vae,
    ids: np.ndarray,
    neg_ids: np.ndarray,
    *,
    steps: int = 30,
    guidance_scale: float = 5.0,
    height: int = 512,
    width: int = 512,
    seed: int = 0,
    scheduler_config=None,
) -> dict:
    """Run both sides on identical pre-drawn noise; report per-step max-abs
    latent deltas and the final-image delta. `params`/`models` drive the
    jitted JAX `sample` (PARITY_POLICY fp32, reference attention);
    `text_fn`/`tm_unet`/`tm_vae` drive the torch loop."""
    import jax

    from ..core.precision import PARITY_POLICY
    from ..diffusion import SchedulerConfig, make_ddpm
    from ..diffusion.sampler import sample

    sched = make_ddpm(scheduler_config or SchedulerConfig(), steps)
    B = ids.shape[0]
    h, w = height // 8, width // 8
    rng = np.random.default_rng(seed)
    noise = rng.standard_normal((steps + 1, B, h, w, 4)).astype(np.float32)

    img_j, traj_j = sample(
        params, sched, jnp.asarray(ids), jnp.asarray(neg_ids),
        jax.random.key(0),  # unused: noise_override replaces the PRNG stream
        models=models, guidance_scale=float(guidance_scale),
        height=height, width=width, policy=PARITY_POLICY,
        noise_override=jnp.asarray(noise), return_trajectory=True,
    )
    traj_j = np.asarray(traj_j)
    img_j = np.asarray(img_j)

    traj_t, img_t = torch_chain_trajectory(
        text_fn, tm_unet, tm_vae, ids, neg_ids, noise, sched, guidance_scale
    )

    step_max = np.max(np.abs(traj_j - traj_t), axis=(1, 2, 3, 4))
    return {
        "steps": steps,
        "latent_max_abs_per_step": [float(v) for v in step_max],
        "latent_max_abs": float(step_max.max()),
        "image_max_abs": float(np.max(np.abs(img_j - img_t))),
    }
