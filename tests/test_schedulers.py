"""Scheduler math vs analytic DDPM posteriors (SURVEY.md §4 test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceposegenerator_tpu.diffusion import (
    SchedulerConfig,
    make_ddpm,
    make_dpm_solver,
)
from faceposegenerator_tpu.diffusion.schedulers import inference_timesteps


def test_beta_tables():
    sched = make_ddpm()
    betas = np.asarray(sched.betas)
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-6)
    np.testing.assert_allclose(betas[-1], 0.012, rtol=1e-6)
    # scaled_linear: sqrt(beta) is linear
    diffs = np.diff(np.sqrt(betas))
    np.testing.assert_allclose(diffs, diffs[0], rtol=1e-4)
    acp = np.asarray(sched.alphas_cumprod)
    assert np.all(np.diff(acp) < 0) and acp[0] == pytest.approx(1 - 0.00085)


def test_leading_timesteps_30():
    cfg = SchedulerConfig()
    ts = inference_timesteps(cfg, 30)
    # step_ratio=33, +offset 1, descending: 958, 925, ..., 34, 1
    assert ts[0] == 958 and ts[-1] == 1
    assert len(ts) == 30
    np.testing.assert_array_equal(np.diff(ts), -33)


def test_add_noise_pred_original_roundtrip():
    sched = make_ddpm()
    key = jax.random.key(0)
    x0 = jax.random.normal(key, (4, 8, 8, 4))
    noise = jax.random.normal(jax.random.key(1), x0.shape)
    t = jnp.array([10, 500, 900, 1])
    xt = sched.add_noise(x0, noise, t)
    # if the model predicted the exact epsilon, x̂0 must equal x0
    x0_hat = sched.pred_original(noise, t, xt)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=2e-4)


def test_ddpm_step_posterior_mean_analytic():
    """Check step() against the textbook posterior q(x_{t-1}|x_t, x0)."""
    sched = make_ddpm()  # full training chain: timesteps = 999..0, prev = t-1
    acp = np.asarray(sched.alphas_cumprod, np.float64)
    betas = np.asarray(sched.betas, np.float64)
    step_index = 999 - 500  # timesteps[idx] == 500
    t = int(sched.timesteps[step_index])
    assert t == 500
    x_t = jax.random.normal(jax.random.key(2), (1, 4, 4, 4))
    eps = jax.random.normal(jax.random.key(3), x_t.shape)
    x_prev, x0 = sched.step(eps, jnp.int32(step_index), x_t, jnp.zeros_like(x_t))

    x_t64 = np.asarray(x_t, np.float64)
    e64 = np.asarray(eps, np.float64)
    x0_ref = (x_t64 - np.sqrt(1 - acp[t]) * e64) / np.sqrt(acp[t])
    mean_ref = (
        np.sqrt(acp[t - 1]) * betas[t] / (1 - acp[t]) * x0_ref
        + np.sqrt(1 - betas[t]) * (1 - acp[t - 1]) / (1 - acp[t]) * x_t64
    )
    np.testing.assert_allclose(np.asarray(x_prev), mean_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(x0), x0_ref, atol=1e-5)


def test_ddpm_step_variance_floor_and_noise():
    sched = make_ddpm(num_inference_steps=30)
    x_t = jnp.ones((1, 2, 2, 4))
    eps = jnp.zeros_like(x_t)
    noise = jnp.ones_like(x_t)
    # mid-chain step: noise IS added
    a, _ = sched.step(eps, jnp.int32(0), x_t, noise)
    b, _ = sched.step(eps, jnp.int32(0), x_t, jnp.zeros_like(x_t))
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # final step (t=1, prev<0): posterior variance collapses to the 1e-20
    # floor (diffusers semantics) — effectively deterministic
    a, _ = sched.step(eps, jnp.int32(29), x_t, noise)
    b, _ = sched.step(eps, jnp.int32(29), x_t, jnp.zeros_like(x_t))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # variance positive (≥ floor) at every inference step
    for i in [0, 15, 29]:
        var = sched.variance(sched.timesteps[i], sched.prev_timesteps[i])
        assert float(var) > 0


def test_ddpm_full_chain_denoises_perfect_model():
    """With an oracle epsilon model, 30-step DDPM (zero noise) recovers x0."""
    sched = make_ddpm(num_inference_steps=30)
    x0_true = 0.5 * jnp.ones((1, 4, 4, 4))

    def oracle_eps(x, t):
        acp = sched.alphas_cumprod[t]
        return (x - jnp.sqrt(acp) * x0_true) / jnp.sqrt(1 - acp)

    x = jax.random.normal(jax.random.key(0), x0_true.shape)

    def body(i, x):
        t = sched.timesteps[i]
        eps = oracle_eps(x, t)
        x, _ = sched.step(eps, i, x, jnp.zeros_like(x))
        return x

    x = jax.lax.fori_loop(0, 30, body, x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0_true), atol=5e-2)


def test_dpm_solver_oracle_convergence():
    """DPM-Solver++ 2M with an oracle model converges to x0 in 20 steps."""
    sched = make_dpm_solver(num_inference_steps=20)
    x0_true = jnp.full((1, 4, 4, 4), -0.3)

    def oracle_eps(x, t):
        acp = sched.alphas_cumprod[t]
        return (x - jnp.sqrt(acp) * x0_true) / jnp.sqrt(1 - acp)

    x = jax.random.normal(jax.random.key(1), x0_true.shape)
    state = (x, jnp.zeros_like(x), jnp.zeros_like(x), jnp.int32(0))

    def body(i, state):
        t = sched.timesteps[i]
        eps = oracle_eps(state[0], t)
        state, _ = sched.step(eps, i, state)
        return state

    state = jax.lax.fori_loop(0, 20, body, state)
    np.testing.assert_allclose(np.asarray(state[0]), np.asarray(x0_true), atol=1e-2)


def test_v_prediction_consistency():
    cfg = SchedulerConfig(prediction_type="v_prediction")
    sched = make_ddpm(cfg)
    x0 = jax.random.normal(jax.random.key(4), (2, 4, 4, 4))
    noise = jax.random.normal(jax.random.key(5), x0.shape)
    t = jnp.array([100, 800])
    xt = sched.add_noise(x0, noise, t)
    v = sched.get_velocity(x0, noise, t)
    x0_hat = sched.pred_original(v, t, xt)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=2e-4)


def test_schedule_is_jit_static():
    """Schedules close over jit without retracing per step index."""
    sched = make_ddpm(num_inference_steps=30)
    traces = []

    @jax.jit
    def f(i, x):
        traces.append(1)
        x, _ = sched.step(jnp.zeros_like(x), i, x, jnp.zeros_like(x))
        return x

    x = jnp.ones((1, 2, 2, 4))
    f(jnp.int32(0), x)
    f(jnp.int32(7), x)
    assert len(traces) == 1


def test_dpm_timesteps_match_diffusers_set_timesteps():
    """DPMSolverMultistepScheduler.set_timesteps samples S+1 points and drops
    the last — different from the DDPM T//S 'leading' formula. Oracle values
    computed from the diffusers formulas (see dpm_inference_timesteps)."""
    from faceposegenerator_tpu.diffusion.schedulers import (
        SchedulerConfig,
        dpm_inference_timesteps,
    )
    import numpy as np

    cfg = SchedulerConfig()  # T=1000, steps_offset=1

    # linspace (the class default → what the reference's validation uses)
    got = dpm_inference_timesteps(cfg, 4, "linspace")
    exp = np.linspace(0, 999, 5).round()[::-1][:-1].astype(np.int64)
    np.testing.assert_array_equal(got, exp)
    assert got[0] == 999

    # leading: T // (S+1), + steps_offset
    got = dpm_inference_timesteps(cfg, 4, "leading")
    np.testing.assert_array_equal(got, np.array([800, 600, 400, 200]) + 1)

    # trailing
    got = dpm_inference_timesteps(cfg, 4, "trailing")
    np.testing.assert_array_equal(got, np.array([999, 749, 499, 249]))

    # make_dpm_solver default resolves to linspace
    sched = make_dpm_solver(num_inference_steps=4)
    np.testing.assert_array_equal(
        np.asarray(sched.timesteps), np.linspace(0, 999, 5).round()[::-1][:-1]
    )
