"""End-to-end jitted sampler tests on tiny model configs."""

import jax
import jax.numpy as jnp
import numpy as np

from faceposegenerator_tpu.core.precision import PARITY_POLICY
from faceposegenerator_tpu.diffusion import make_ddpm, make_dpm_solver
from faceposegenerator_tpu.diffusion.sampler import SamplerModels, sample
from faceposegenerator_tpu.models import clip_text, unet2d, vae


TINY = SamplerModels(
    text_cfg=clip_text.CLIPTextConfig(
        vocab_size=128, hidden_size=48, num_layers=2, num_heads=4, intermediate_size=96
    ),
    unet_cfg=unet2d.UNetConfig(
        block_out_channels=(32, 64, 64, 64), cross_attention_dim=48, head_dim=8
    ),
    vae_cfg=vae.VAEConfig(block_out_channels=(32, 32, 32, 32)),
)


def _tiny_params():
    return {
        "text_encoder": clip_text.init(jax.random.key(0), TINY.text_cfg),
        "unet": unet2d.init(jax.random.key(1), TINY.unet_cfg),
        "vae": vae.init(jax.random.key(2), TINY.vae_cfg),
    }


def test_sampler_end_to_end_ddpm_and_dpm():
    params = _tiny_params()
    sched = make_ddpm(num_inference_steps=4)
    ids = jax.random.randint(jax.random.key(3), (2, 77), 0, 128)
    neg = jnp.zeros_like(ids)
    img = sample(
        params, sched, ids, neg, jax.random.key(0),
        models=TINY, height=64, width=64, policy=PARITY_POLICY,
    )
    assert img.shape == (2, 64, 64, 3)
    assert np.isfinite(np.asarray(img)).all()
    assert 0.0 <= float(img.min()) and float(img.max()) <= 1.0

    dsched = make_dpm_solver(num_inference_steps=4)
    img2 = sample(
        params, dsched, ids, neg, jax.random.key(0),
        models=TINY, height=64, width=64, policy=PARITY_POLICY, scheduler="dpm",
    )
    assert img2.shape == (2, 64, 64, 3)
    assert np.isfinite(np.asarray(img2)).all()


def test_sampler_deterministic_given_key():
    params = _tiny_params()
    sched = make_ddpm(num_inference_steps=3)
    ids = jax.random.randint(jax.random.key(3), (1, 77), 0, 128)
    neg = jnp.zeros_like(ids)
    a = sample(params, sched, ids, neg, jax.random.key(7), models=TINY, height=64, width=64, policy=PARITY_POLICY)
    b = sample(params, sched, ids, neg, jax.random.key(7), models=TINY, height=64, width=64, policy=PARITY_POLICY)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = sample(params, sched, ids, neg, jax.random.key(8), models=TINY, height=64, width=64, policy=PARITY_POLICY)
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_sampler_unroll_matches_fori_loop():
    """`unroll>1` (scan-unrolled denoise loop, BENCH_UNROLL) is a pure
    scheduling change: same step math, same PRNG stream, same result up to
    fusion-order rounding."""
    params = _tiny_params()
    sched = make_ddpm(num_inference_steps=5)  # non-divisible by unroll=2
    ids = jax.random.randint(jax.random.key(3), (2, 77), 0, 128)
    neg = jnp.zeros_like(ids)
    a = sample(params, sched, ids, neg, jax.random.key(11), models=TINY,
               height=64, width=64, policy=PARITY_POLICY)
    b = sample(params, sched, ids, neg, jax.random.key(11), models=TINY,
               height=64, width=64, policy=PARITY_POLICY, unroll=2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_sampler_noise_override_reproduces_prng_path():
    """Injecting the same noise tensors gives identical output — the
    parity-testing mechanism."""
    params = _tiny_params()
    S = 3
    sched = make_ddpm(num_inference_steps=S)
    ids = jax.random.randint(jax.random.key(3), (1, 77), 0, 128)
    neg = jnp.zeros_like(ids)
    key = jax.random.key(9)
    key2, sub = jax.random.split(key)
    noises = [jax.random.normal(sub, (1, 8, 8, 4), jnp.float32)]
    for i in range(S):
        noises.append(jax.random.normal(jax.random.fold_in(key2, i), (1, 8, 8, 4), jnp.float32))
    # NOTE: sample() splits then folds the *original* key; replicate that
    a = sample(params, sched, ids, neg, key, models=TINY, height=64, width=64, policy=PARITY_POLICY)
    # rebuild the same stream the sampler uses internally
    k, s0 = jax.random.split(key)
    override = [jax.random.normal(s0, (1, 8, 8, 4), jnp.float32)]
    for i in range(S):
        override.append(jax.random.normal(jax.random.fold_in(k, i), (1, 8, 8, 4), jnp.float32))
    b = sample(
        params, sched, ids, neg, key, models=TINY, height=64, width=64,
        policy=PARITY_POLICY, noise_override=jnp.stack(override),
    )
    # in-jit PRNG vs injected noise produce identical streams but different
    # XLA fusion rounding; agreement is to float-epsilon levels only
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
