"""Diffusion noise schedulers as pure jnp table + step functions.

The reference consumes diffusers' `DDPMScheduler` (training + inference —
`train_ID-Booth.py:630,1007-1018,1081`; `inference_ID-Booth.py:104`) and
`DPMSolverMultistepScheduler` (validation sampling — `train_ID-Booth.py:155`).
Those are stateful Python objects; under XLA the idiomatic design is a frozen
table-of-constants (betas, alphas_cumprod, per-step timesteps) captured at
trace time plus pure `step(state, ...) -> state` functions that run inside
`lax.fori_loop`/`lax.scan` with static shapes.

Operating point (SD2.1-base `scheduler/scheduler_config.json` semantics):
beta_start=0.00085, beta_end=0.012, scaled_linear schedule, 1000 train steps,
epsilon prediction, no sample clipping, steps_offset=1, "leading" timestep
spacing, fixed_small variance.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"  # or "linear", "squaredcos_cap_v2"
    prediction_type: str = "epsilon"  # or "v_prediction", "sample"
    steps_offset: int = 1
    timestep_spacing: str = "leading"
    clip_sample: bool = False
    clip_sample_range: float = 1.0
    variance_type: str = "fixed_small"
    # DPM-Solver++ specific
    solver_order: int = 2
    algorithm_type: str = "dpmsolver++"
    lower_order_final: bool = True


def _make_betas(cfg: SchedulerConfig) -> np.ndarray:
    T = cfg.num_train_timesteps
    if cfg.beta_schedule == "scaled_linear":
        return np.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5, T, dtype=np.float64) ** 2
    if cfg.beta_schedule == "linear":
        return np.linspace(cfg.beta_start, cfg.beta_end, T, dtype=np.float64)
    if cfg.beta_schedule == "squaredcos_cap_v2":
        def alpha_bar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
        ts = np.arange(T, dtype=np.float64)
        return np.minimum(1 - alpha_bar((ts + 1) / T) / alpha_bar(ts / T), 0.999)
    raise ValueError(cfg.beta_schedule)


def inference_timesteps(cfg: SchedulerConfig, num_inference_steps: int) -> np.ndarray:
    """Descending integer timesteps for a sampling run ("leading" spacing)."""
    T = cfg.num_train_timesteps
    if cfg.timestep_spacing == "leading":
        step_ratio = T // num_inference_steps
        ts = (np.arange(num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)
        ts = ts + cfg.steps_offset
    elif cfg.timestep_spacing == "trailing":
        step_ratio = T / num_inference_steps
        ts = np.round(np.arange(T, 0, -step_ratio)).astype(np.int64) - 1
    elif cfg.timestep_spacing == "linspace":
        ts = np.linspace(0, T - 1, num_inference_steps).round()[::-1].astype(np.int64)
    else:
        raise ValueError(cfg.timestep_spacing)
    return ts


def dpm_inference_timesteps(
    cfg: SchedulerConfig, num_inference_steps: int, spacing: str
) -> np.ndarray:
    """Descending timesteps per diffusers `DPMSolverMultistepScheduler.
    set_timesteps`: the linspace/leading spacings sample S+1 points and drop
    the last — NOT the DDPM `T//S` formula (`inference_timesteps`)."""
    T = cfg.num_train_timesteps
    if spacing == "linspace":
        ts = (
            np.linspace(0, T - 1, num_inference_steps + 1)
            .round()[::-1][:-1]
            .astype(np.int64)
        )
    elif spacing == "leading":
        step_ratio = T // (num_inference_steps + 1)
        ts = (
            (np.arange(0, num_inference_steps + 1) * step_ratio)
            .round()[::-1][:-1]
            .astype(np.int64)
        )
        ts = ts + cfg.steps_offset
    elif spacing == "trailing":
        step_ratio = T / num_inference_steps
        ts = np.arange(T, 0, -step_ratio).round().astype(np.int64) - 1
    else:
        raise ValueError(spacing)
    return ts


# ---------------------------------------------------------------------------
# DDPM
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DDPMSchedule:
    """Constant tables for DDPM; a frozen pytree safe to close over in jit.

    `timesteps` is the descending inference schedule (length = num steps);
    training uses the full 1000-step tables directly.
    """

    betas: jax.Array  # (T,)
    alphas_cumprod: jax.Array  # (T,)
    timesteps: jax.Array  # (S,) int32, descending
    prev_timesteps: jax.Array  # (S,) int32, t - T//S (may be < 0)
    num_inference_steps: int = dataclasses.field(metadata=dict(static=True), default=0)
    clip_sample: bool = dataclasses.field(metadata=dict(static=True), default=False)
    clip_sample_range: float = dataclasses.field(metadata=dict(static=True), default=1.0)
    prediction_type: str = dataclasses.field(metadata=dict(static=True), default="epsilon")

    @property
    def num_train_timesteps(self) -> int:
        return self.betas.shape[0]

    # -- training-side ops ---------------------------------------------------

    def add_noise(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        """q(x_t | x_0) sample — reference `train_ID-Booth.py:1018`."""
        acp = self.alphas_cumprod[t].astype(x0.dtype)
        shape = (-1,) + (1,) * (x0.ndim - 1)
        sqrt_acp = jnp.sqrt(acp).reshape(shape)
        sqrt_1m = jnp.sqrt(1.0 - acp).reshape(shape)
        return sqrt_acp * x0 + sqrt_1m * noise

    def get_velocity(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        acp = self.alphas_cumprod[t].astype(x0.dtype)
        shape = (-1,) + (1,) * (x0.ndim - 1)
        sqrt_acp = jnp.sqrt(acp).reshape(shape)
        sqrt_1m = jnp.sqrt(1.0 - acp).reshape(shape)
        return sqrt_acp * noise - sqrt_1m * x0

    def pred_original(self, model_out: jax.Array, t: jax.Array, x_t: jax.Array) -> jax.Array:
        """x̂0 from the model output at (possibly batched) integer t.

        This is the `scheduler.step(...).pred_original_sample` the identity
        loss needs (reference `train_ID-Booth.py:1081,1109`).
        """
        acp = self.alphas_cumprod[t].astype(jnp.float32)
        shape = (-1,) + (1,) * (x_t.ndim - 1)
        acp = acp.reshape(shape)
        x_t32 = x_t.astype(jnp.float32)
        out32 = model_out.astype(jnp.float32)
        if self.prediction_type == "epsilon":
            x0 = (x_t32 - jnp.sqrt(1.0 - acp) * out32) / jnp.sqrt(acp)
        elif self.prediction_type == "v_prediction":
            x0 = jnp.sqrt(acp) * x_t32 - jnp.sqrt(1.0 - acp) * out32
        elif self.prediction_type == "sample":
            x0 = out32
        else:
            raise ValueError(self.prediction_type)
        if self.clip_sample:
            x0 = jnp.clip(x0, -self.clip_sample_range, self.clip_sample_range)
        return x0

    # -- sampling-side ops ---------------------------------------------------

    def variance(self, t: jax.Array, prev_t: jax.Array) -> jax.Array:
        """fixed_small posterior variance, floored at 1e-20 in log space."""
        acp_t = self.alphas_cumprod[t]
        acp_prev = jnp.where(prev_t >= 0, self.alphas_cumprod[jnp.maximum(prev_t, 0)], 1.0)
        beta_t = 1.0 - acp_t / acp_prev
        var = (1.0 - acp_prev) / (1.0 - acp_t) * beta_t
        return jnp.clip(var, 1e-20, None)

    def step(
        self,
        model_out: jax.Array,
        step_index: jax.Array,
        x_t: jax.Array,
        noise: jax.Array,
    ) -> Tuple[jax.Array, jax.Array]:
        """One reverse step x_t -> x_{t-1} at `timesteps[step_index]`.

        `noise` must be pre-drawn N(0,1) of x_t's shape — injected rather
        than generator-matched so fp32 parity vs the reference is checkable
        by feeding both sides identical noise (SURVEY.md §7 hard part (a)).
        Returns (x_prev, x̂0). Computation in fp32, cast back to x_t.dtype.
        """
        t = self.timesteps[step_index]
        prev_t = self.prev_timesteps[step_index]
        x0 = self.pred_original(model_out, t, x_t)

        acp_t = self.alphas_cumprod[t]
        acp_prev = jnp.where(prev_t >= 0, self.alphas_cumprod[jnp.maximum(prev_t, 0)], 1.0)
        beta_prod_t = 1.0 - acp_t
        alpha_t = acp_t / acp_prev  # current alpha_t over the jumped span
        beta_t = 1.0 - alpha_t

        x0_coef = (jnp.sqrt(acp_prev) * beta_t) / beta_prod_t
        xt_coef = jnp.sqrt(alpha_t) * (1.0 - acp_prev) / beta_prod_t
        mean = x0_coef * x0 + xt_coef * x_t.astype(jnp.float32)

        std = jnp.sqrt(self.variance(t, prev_t))
        x_prev = jnp.where(t > 0, mean + std * noise.astype(jnp.float32), mean)
        return x_prev.astype(x_t.dtype), x0


def make_ddpm(
    cfg: SchedulerConfig = SchedulerConfig(),
    num_inference_steps: Optional[int] = None,
    dtype=jnp.float32,
) -> DDPMSchedule:
    betas = _make_betas(cfg)
    acp = np.cumprod(1.0 - betas)
    if num_inference_steps:
        ts = inference_timesteps(cfg, num_inference_steps)
        prev = ts - cfg.num_train_timesteps // num_inference_steps
        S = num_inference_steps
    else:
        ts = np.arange(cfg.num_train_timesteps)[::-1]
        prev = ts - 1
        S = 0
    return DDPMSchedule(
        betas=jnp.asarray(betas, dtype),
        alphas_cumprod=jnp.asarray(acp, dtype),
        timesteps=jnp.asarray(ts.copy(), jnp.int32),
        prev_timesteps=jnp.asarray(prev.copy(), jnp.int32),
        num_inference_steps=S,
        clip_sample=cfg.clip_sample,
        clip_sample_range=cfg.clip_sample_range,
        prediction_type=cfg.prediction_type,
    )


# ---------------------------------------------------------------------------
# DPM-Solver++ (multistep, order 2)
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DPMSolverSchedule:
    """DPM-Solver++ 2M: tables indexed by step position, state = (x, m0, m1).

    Used for validation sampling in the reference (`train_ID-Booth.py:155`,
    `log_validation`). Deterministic (no noise injection), so state is just
    the sample and the last two data predictions.
    """

    alphas_cumprod: jax.Array  # (T,)
    timesteps: jax.Array  # (S,) int32 descending
    sigma_t: jax.Array  # (S+1,) σ at each step position (last = σ_0-ish)
    alpha_t: jax.Array  # (S+1,)
    lambda_t: jax.Array  # (S+1,) log-SNR/2
    num_inference_steps: int = dataclasses.field(metadata=dict(static=True), default=0)
    prediction_type: str = dataclasses.field(metadata=dict(static=True), default="epsilon")
    solver_order: int = dataclasses.field(metadata=dict(static=True), default=2)
    lower_order_final: bool = dataclasses.field(metadata=dict(static=True), default=True)

    def data_prediction(self, model_out, step_index, x_t):
        """Convert model output to x̂0 at step position `step_index`."""
        t = self.timesteps[step_index]
        acp = self.alphas_cumprod[t]
        sqrt_a = jnp.sqrt(acp)
        sqrt_s = jnp.sqrt(1.0 - acp)
        x32 = x_t.astype(jnp.float32)
        o32 = model_out.astype(jnp.float32)
        if self.prediction_type == "epsilon":
            return (x32 - sqrt_s * o32) / sqrt_a
        if self.prediction_type == "v_prediction":
            return sqrt_a * x32 - sqrt_s * o32
        return o32

    def step(self, model_out, step_index, state):
        """One 2M multistep update.

        state = (x, m0, m1, prev_count): m0 is the most recent data
        prediction, m1 the one before; prev_count tracks warm-up so the first
        step (and optionally the final step) falls back to first order.
        Everything is branchless via `jnp.where` so it scans cleanly.
        """
        x, m0, m1, prev_count = state
        S = self.num_inference_steps
        x0 = self.data_prediction(model_out, step_index, x)

        i = step_index
        sigma_s, sigma_tt = self.sigma_t[i], self.sigma_t[i + 1]
        alpha_s, alpha_tt = self.alpha_t[i], self.alpha_t[i + 1]
        lam_s, lam_tt = self.lambda_t[i], self.lambda_t[i + 1]
        h = lam_tt - lam_s
        ratio = sigma_tt / sigma_s
        phi = jnp.expm1(-h)

        # first-order (DPM-Solver++ 1S) update
        x1 = ratio * x.astype(jnp.float32) - alpha_tt * phi * x0

        # second-order (2M) update using previous data prediction m0
        lam_prev = self.lambda_t[jnp.maximum(i - 1, 0)]
        h0 = lam_s - lam_prev
        r0 = h0 / jnp.where(h == 0, 1.0, h)
        d1 = (x0 - m0) / jnp.where(r0 == 0, 1.0, r0)
        x2 = ratio * x.astype(jnp.float32) - alpha_tt * phi * x0 - 0.5 * alpha_tt * phi * d1

        use_first = prev_count < 1
        if self.lower_order_final and S > 1:
            use_first = jnp.logical_or(use_first, step_index == S - 1)
        x_new = jnp.where(use_first, x1, x2)
        return (x_new.astype(x.dtype), x0, m0, prev_count + 1), x0


def make_dpm_solver(
    cfg: SchedulerConfig = SchedulerConfig(),
    num_inference_steps: int = 30,
    dtype=jnp.float32,
    timestep_spacing: Optional[str] = None,
) -> DPMSolverSchedule:
    """`timestep_spacing=None` resolves to "linspace" — the
    `DPMSolverMultistepScheduler` class default, which is what the
    reference's validation run gets (`train_ID-Booth.py:155` builds the DPM
    scheduler `from_config` of the SD2.1 scheduler config, which carries no
    timestep_spacing key). Pass a spacing explicitly to honor a checkpoint
    config that does define one."""
    betas = _make_betas(cfg)
    acp = np.cumprod(1.0 - betas)
    ts = dpm_inference_timesteps(cfg, num_inference_steps, timestep_spacing or "linspace")
    # σ/α/λ at each visited timestep plus the terminal point (α=1, σ=0) so
    # the final update lands exactly on the data prediction.
    acp_path = np.concatenate([acp[ts], [1.0]])
    alpha_t = np.sqrt(acp_path)
    sigma_t = np.sqrt(1.0 - acp_path)
    lambda_t = np.log(alpha_t) - np.log(np.maximum(sigma_t, 1e-10))
    return DPMSolverSchedule(
        alphas_cumprod=jnp.asarray(acp, dtype),
        timesteps=jnp.asarray(ts.copy(), jnp.int32),
        sigma_t=jnp.asarray(sigma_t, dtype),
        alpha_t=jnp.asarray(alpha_t, dtype),
        lambda_t=jnp.asarray(lambda_t, dtype),
        num_inference_steps=num_inference_steps,
        prediction_type=cfg.prediction_type,
        solver_order=cfg.solver_order,
        lower_order_final=cfg.lower_order_final,
    )
