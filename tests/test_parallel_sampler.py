"""Parallel-in-time (ParaDiGMS-style) sampler vs the sequential reference.

Properties under test (see `diffusion/parallel_sampler.py`):
 - tolerance=0 degenerates to the exact sequential chain: images match
   `sampler.sample` (same key / same noise stream) to fp32 batching jitter.
 - tolerance>0 converges in FEWER Picard iterations than steps while staying
   in the same ballpark as the exact image (it is an approximation knob with
   a measurable dial, like DeepCache/ToMe).
 - window > S, window = 1, and non-divisible window/step combinations are
   all well-formed (padding/clamping edge cases).
 - the "data"-mesh-sharded window produces the same images as single-device
   (parallel-in-time multi-chip latency scaling is placement, not math).

The reference has no counterpart (strictly sequential 30-step denoise,
`inference_ID-Booth.py:138`); the default pipeline path remains the exact
sequential sampler.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceposegenerator_tpu.diffusion import make_ddpm
from faceposegenerator_tpu.diffusion.parallel_sampler import sample_parallel
from faceposegenerator_tpu.diffusion.sampler import SamplerModels, sample
from faceposegenerator_tpu.core.precision import PARITY_POLICY
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


# equality-grade tests run strict fp32 (PARITY_POLICY): under the bf16
# default policy the W-wide batch quantizes differently from the 2-row
# sequential batch, which is placement jitter, not math
KW = dict(models=TINY, height=64, width=64, policy=PARITY_POLICY)


def test_tolerance_zero_matches_sequential(setup):
    params, ids, neg = setup
    sched = make_ddpm(num_inference_steps=6)
    ref = sample(params, sched, ids, neg, jax.random.key(0), **KW)
    par, iters = sample_parallel(
        params, sched, ids, neg, jax.random.key(0),
        window=4, tolerance=0.0, return_stats=True, **KW,
    )
    # tol=0 accepts only the (exact-by-construction) first window position
    # per iteration => exactly S iterations, sequential-equal images
    assert int(iters) == 6
    np.testing.assert_allclose(np.asarray(par), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_tolerance_zero_matches_sequential_noise_override(setup):
    """Same check on the injected-noise path (the parity-testing contract)."""
    params, ids, neg = setup
    sched = make_ddpm(num_inference_steps=5)
    noise = jax.random.normal(jax.random.key(11), (6, 2, 8, 8, 4), jnp.float32)
    ref = sample(params, sched, ids, neg, jax.random.key(0),
                 noise_override=noise, **KW)
    par = sample_parallel(params, sched, ids, neg, jax.random.key(0),
                          window=3, tolerance=0.0, noise_override=noise, **KW)
    np.testing.assert_allclose(np.asarray(par), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_tolerance_trades_iterations_for_error(setup):
    params, ids, neg = setup
    sched = make_ddpm(num_inference_steps=8)
    ref = sample(params, sched, ids, neg, jax.random.key(0), **KW)
    par, iters = sample_parallel(
        params, sched, ids, neg, jax.random.key(0),
        window=8, tolerance=0.5, return_stats=True, **KW,
    )
    assert int(iters) < 8  # parallel-in-time actually skipped sequential work
    assert np.isfinite(np.asarray(par)).all()
    assert np.abs(np.asarray(par) - np.asarray(ref)).mean() < 0.2
    # deterministic across calls
    par2 = sample_parallel(params, sched, ids, neg, jax.random.key(0),
                           window=8, tolerance=0.5, **KW)
    np.testing.assert_array_equal(np.asarray(par), np.asarray(par2))


@pytest.mark.parametrize("window", [1, 3, 16])
def test_window_edges(setup, window):
    """window=1 (degenerate sequential), window not dividing S, window > S."""
    params, ids, neg = setup
    sched = make_ddpm(num_inference_steps=5)
    ref = sample(params, sched, ids, neg, jax.random.key(1), **KW)
    par, iters = sample_parallel(
        params, sched, ids, neg, jax.random.key(1),
        window=window, tolerance=0.0, return_stats=True, **KW,
    )
    assert int(iters) == 5
    np.testing.assert_allclose(np.asarray(par), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_lora_and_per_request_adapters(setup):
    """Replicated AND per-request (leading request axis) adapters both ride
    the window tiling; tol=0 must match the sequential sampler with the SAME
    adapters."""
    params, ids, neg = setup
    sched = make_ddpm(num_inference_steps=4)
    lora_u = unet2d.init_lora(jax.random.key(2), params["unet"], rank=4)
    lora_u = jax.tree.map(lambda x: x + 0.01, lora_u)
    lora = {"unet": lora_u, "text_encoder": None}
    ref = sample(params, sched, ids, neg, jax.random.key(3), lora=lora, **KW)
    par = sample_parallel(params, sched, ids, neg, jax.random.key(3),
                          window=4, tolerance=0.0, lora=lora, **KW)
    np.testing.assert_allclose(np.asarray(par), np.asarray(ref), rtol=2e-4, atol=2e-4)

    # per-request: stack two distinct adapters along a leading (B=2) axis
    lora_b = jax.tree.map(
        lambda a: jnp.stack([a, a * 2.0], axis=0), lora_u
    )
    lora_pr = {"unet": lora_b, "text_encoder": None}
    scale = jnp.asarray([1.0, 0.5], jnp.float32)
    ref_pr = sample(params, sched, ids, neg, jax.random.key(3),
                    lora=lora_pr, lora_scale=scale, **KW)
    par_pr = sample_parallel(params, sched, ids, neg, jax.random.key(3),
                             window=4, tolerance=0.0, lora=lora_pr,
                             lora_scale=scale, **KW)
    np.testing.assert_allclose(
        np.asarray(par_pr), np.asarray(ref_pr), rtol=2e-4, atol=2e-4
    )


def test_mesh_sharded_window_matches_single_device(setup):
    """tolerance=0 is the placement-independent invariant: the Picard path
    degenerates to the sequential chain regardless of how the window shards,
    so sharded == single to numerics jitter. (With tolerance>0 the
    accept/reject decisions are float-sensitive, so placement may pick a
    different — equally in-tolerance — iteration path; that mode is checked
    for finiteness/ballpark only.)"""
    params, ids, neg = setup
    from jax.sharding import Mesh

    sched = make_ddpm(num_inference_steps=6)
    single = sample_parallel(params, sched, ids, neg, jax.random.key(7),
                             window=4, tolerance=0.0, **KW)
    devs = np.array(jax.devices()[:4]).reshape(4)
    with Mesh(devs, ("data",)) as mesh:
        sharded = sample_parallel(params, sched, ids, neg, jax.random.key(7),
                                  window=4, tolerance=0.0, mesh=mesh, **KW)
        loose = sample_parallel(params, sched, ids, neg, jax.random.key(7),
                                window=4, tolerance=0.3, mesh=mesh, **KW)
    # the sharded program fuses/reduces differently; measured CPU-mesh
    # jitter is ~5e-4 on [0,1] images (40/24576 elements past 2e-4)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(single), rtol=1e-3, atol=1e-3
    )
    assert np.isfinite(np.asarray(loose)).all()
    assert np.abs(np.asarray(loose) - np.asarray(single)).mean() < 0.2
