"""Guidance interval (arXiv:2404.07724, opt-in): CFG only inside a static
step-index window; cond-only half-batch UNet outside.

Exactness anchors:
 - cfg_interval=(0, S) runs the full-CFG body at every step — identical
   math to the default single-fori program (allclose at fp32).
 - cfg_interval=(0, 0) applies guidance nowhere — identical math to
   guidance_scale=1.0 on the default path (eps_u + 1·(eps_c − eps_u) =
   eps_c), modulo half-vs-full-batch numerics.
Both anchors hold for ddpm AND dpm; a mid interval is deterministic,
finite, and genuinely different from exact. Compositions that are not
implemented must raise, not silently fall back to exact.

The reference applies CFG 5.0 at every step (`inference_ID-Booth.py:49`);
default cfg_interval=None is that exact path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceposegenerator_tpu.core.precision import PARITY_POLICY
from faceposegenerator_tpu.diffusion import make_ddpm, make_dpm_solver
from faceposegenerator_tpu.diffusion.sampler import SamplerModels, sample
from faceposegenerator_tpu.models import clip_text, unet2d, vae

CFG = unet2d.UNetConfig(
    block_out_channels=(32, 64, 64, 64), cross_attention_dim=48, head_dim=8
)
TINY = SamplerModels(
    text_cfg=clip_text.CLIPTextConfig(
        vocab_size=512, hidden_size=48, num_layers=2, num_heads=4, intermediate_size=96
    ),
    unet_cfg=CFG,
    vae_cfg=vae.VAEConfig(block_out_channels=(32, 32, 32, 32)),
)


@pytest.fixture(scope="module")
def setup():
    params = {
        "text_encoder": clip_text.init(jax.random.key(4), TINY.text_cfg),
        "unet": unet2d.init(jax.random.key(0), CFG),
        "vae": vae.init(jax.random.key(5), TINY.vae_cfg),
    }
    ids = jax.random.randint(jax.random.key(6), (2, 77), 0, 512)
    neg = jnp.zeros_like(ids)
    return params, ids, neg


KW = dict(models=TINY, height=64, width=64, policy=PARITY_POLICY)


@pytest.mark.parametrize("scheduler", ["ddpm", "dpm"])
def test_full_interval_matches_exact(setup, scheduler):
    params, ids, neg = setup
    sched = (make_ddpm(num_inference_steps=5) if scheduler == "ddpm"
             else make_dpm_solver(num_inference_steps=5))
    ref = sample(params, sched, ids, neg, jax.random.key(0),
                 scheduler=scheduler, **KW)
    full = sample(params, sched, ids, neg, jax.random.key(0),
                  scheduler=scheduler, cfg_interval=(0, 5), **KW)
    np.testing.assert_allclose(np.asarray(full), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("scheduler", ["ddpm", "dpm"])
def test_empty_interval_matches_guidance_one(setup, scheduler):
    params, ids, neg = setup
    sched = (make_ddpm(num_inference_steps=5) if scheduler == "ddpm"
             else make_dpm_solver(num_inference_steps=5))
    g1 = sample(params, sched, ids, neg, jax.random.key(0),
                scheduler=scheduler, guidance_scale=1.0, **KW)
    none = sample(params, sched, ids, neg, jax.random.key(0),
                  scheduler=scheduler, cfg_interval=(0, 0), **KW)
    np.testing.assert_allclose(np.asarray(none), np.asarray(g1),
                               rtol=2e-4, atol=2e-4)


def test_mid_interval_is_deterministic_and_distinct(setup):
    params, ids, neg = setup
    sched = make_ddpm(num_inference_steps=6)
    ref = sample(params, sched, ids, neg, jax.random.key(0), **KW)
    mid = sample(params, sched, ids, neg, jax.random.key(0),
                 cfg_interval=(1, 4), **KW)
    mid2 = sample(params, sched, ids, neg, jax.random.key(0),
                  cfg_interval=(1, 4), **KW)
    np.testing.assert_array_equal(np.asarray(mid), np.asarray(mid2))
    assert np.isfinite(np.asarray(mid)).all()
    assert np.abs(np.asarray(mid) - np.asarray(ref)).max() > 1e-6
    assert np.abs(np.asarray(mid) - np.asarray(ref)).mean() < 0.2


def test_noise_override_and_per_request_lora(setup):
    """The interval path must honor the injected-noise contract and the
    per-request adapter layout (cond-only rows ride the UNTILED adapters)."""
    params, ids, neg = setup
    sched = make_ddpm(num_inference_steps=4)
    noise = jax.random.normal(jax.random.key(11), (5, 2, 8, 8, 4), jnp.float32)
    lora_u = unet2d.init_lora(jax.random.key(2), params["unet"], rank=4)
    lora_b = jax.tree.map(lambda a: jnp.stack([a + 0.01, a * 2 + 0.01]), lora_u)
    lora = {"unet": lora_b, "text_encoder": None}
    scale = jnp.asarray([1.0, 0.5], jnp.float32)
    ref = sample(params, sched, ids, neg, jax.random.key(0), noise_override=noise,
                 lora=lora, lora_scale=scale, **KW)
    full = sample(params, sched, ids, neg, jax.random.key(0), noise_override=noise,
                  lora=lora, lora_scale=scale, cfg_interval=(0, 4), **KW)
    np.testing.assert_allclose(np.asarray(full), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # determinism of the mixed path with adapters
    mid = sample(params, sched, ids, neg, jax.random.key(0), noise_override=noise,
                 lora=lora, lora_scale=scale, cfg_interval=(1, 3), **KW)
    mid2 = sample(params, sched, ids, neg, jax.random.key(0), noise_override=noise,
                  lora=lora, lora_scale=scale, cfg_interval=(1, 3), **KW)
    np.testing.assert_array_equal(np.asarray(mid), np.asarray(mid2))
    assert np.abs(np.asarray(mid) - np.asarray(ref)).max() > 1e-6


def test_invalid_compositions_raise(setup):
    params, ids, neg = setup
    sched = make_ddpm(num_inference_steps=4)
    with pytest.raises(ValueError):
        sample(params, sched, ids, neg, jax.random.key(0),
               cfg_interval=(0, 9), **KW)  # out of range
    with pytest.raises(ValueError):
        sample(params, sched, ids, neg, jax.random.key(0),
               cfg_interval=(1, 3), unroll=2, **KW)


@pytest.mark.parametrize("scheduler", ["ddpm", "dpm"])
def test_deepcache_composition(setup, scheduler):
    """cfg_interval composes with DeepCache: each static segment carries its
    own cache (CFG vs cond-only caches differ in batch size) seeded by a
    full pass at the segment's first step. (0,S) with DeepCache is the SAME
    program as DeepCache alone; a mid interval is deterministic, finite,
    and in the exact image's ballpark."""
    params, ids, neg = setup
    S = 6
    sched = (make_ddpm(num_inference_steps=S) if scheduler == "ddpm"
             else make_dpm_solver(num_inference_steps=S))
    kw = dict(scheduler=scheduler, deepcache_interval=3, **KW)
    dc = sample(params, sched, ids, neg, jax.random.key(0), **kw)
    dc_full_iv = sample(params, sched, ids, neg, jax.random.key(0),
                        cfg_interval=(0, S), **kw)
    np.testing.assert_allclose(np.asarray(dc_full_iv), np.asarray(dc),
                               rtol=2e-4, atol=2e-4)
    exact = sample(params, sched, ids, neg, jax.random.key(0),
                   scheduler=scheduler, **KW)
    mid = sample(params, sched, ids, neg, jax.random.key(0),
                 cfg_interval=(1, 4), **kw)
    mid2 = sample(params, sched, ids, neg, jax.random.key(0),
                  cfg_interval=(1, 4), **kw)
    np.testing.assert_array_equal(np.asarray(mid), np.asarray(mid2))
    assert np.isfinite(np.asarray(mid)).all()
    assert np.abs(np.asarray(mid) - np.asarray(exact)).max() > 1e-6
    assert np.abs(np.asarray(mid) - np.asarray(exact)).mean() < 0.2
