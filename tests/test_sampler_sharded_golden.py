"""Sharded sampling on the 8-device CPU mesh + golden-value regression
(fixed seed, tiny models — catches silent numerical drift; SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from faceposegenerator_tpu.core.mesh import make_mesh
from faceposegenerator_tpu.core.precision import PARITY_POLICY
from faceposegenerator_tpu.diffusion import make_ddpm
from faceposegenerator_tpu.diffusion.sampler import SamplerModels, sample, sample_data_parallel
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


def _params():
    return {
        "text_encoder": clip_text.init(jax.random.key(0), TINY.text_cfg),
        "unet": unet2d.init(jax.random.key(1), TINY.unet_cfg),
        "vae": vae.init(jax.random.key(2), TINY.vae_cfg),
    }


def test_data_parallel_sampling_matches_single_device():
    params = _params()
    sched = make_ddpm(num_inference_steps=2)
    ids = jax.random.randint(jax.random.key(3), (8, 77), 0, 128)
    neg = jnp.zeros_like(ids)
    single = sample(
        params, sched, ids, neg, jax.random.key(5),
        models=TINY, height=64, width=64, policy=PARITY_POLICY,
    )
    mesh = make_mesh()
    sharded = sample_data_parallel(
        mesh, params, sched, ids, neg, jax.random.key(5),
        models=TINY, height=64, width=64, policy=PARITY_POLICY,
    )
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=5e-4)


def test_sampler_golden_statistics():
    """Fixed-seed sampler output statistics — a drift tripwire. If this
    fails after an intentional numerical change, re-derive the constants
    with the printed values."""
    params = _params()
    sched = make_ddpm(num_inference_steps=3)
    ids = jnp.asarray(np.arange(77)[None] % 128, jnp.int32)
    img = sample(
        params, sched, ids, jnp.zeros_like(ids), jax.random.key(42),
        models=TINY, height=64, width=64, policy=PARITY_POLICY,
    )
    mean = float(img.mean())
    std = float(img.std())
    # golden values captured at framework v0.1 (fp32 CPU, seed 42)
    assert img.shape == (1, 64, 64, 3)
    np.testing.assert_allclose(mean, 0.4905956, atol=2e-3)
    np.testing.assert_allclose(std, 0.1442591, atol=2e-3)


def test_2d_parallel_sampling_matches_single_device():
    """data×model (4×2) mesh sampling — batch sharded AND the UNet
    tensor-sharded — must reproduce the single-device output."""
    from faceposegenerator_tpu.core.mesh import make_mesh
    from faceposegenerator_tpu.diffusion.sampler import sample_2d_parallel

    params = _params()
    sched = make_ddpm(num_inference_steps=2)
    ids = jax.random.randint(jax.random.key(7), (8, 77), 0, 128)
    neg = jnp.zeros_like(ids)
    single = sample(
        params, sched, ids, neg, jax.random.key(9),
        models=TINY, height=64, width=64, policy=PARITY_POLICY,
    )
    mesh = make_mesh(model=2)  # 4 data × 2 model
    sharded = sample_2d_parallel(
        mesh, params, sched, ids, neg, jax.random.key(9),
        models=TINY, height=64, width=64, policy=PARITY_POLICY,
    )
    # TP psums change fp reduction order; 2e-3 on [0,1] images is noise-level
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=2e-3)


def test_pipeline_to_mesh_matches_single_device():
    """StableDiffusionPipeline.to_mesh (data-parallel generation, used by
    `cli generate --data_parallel`) reproduces the single-device pipeline,
    including a LoRA set AFTER the mesh placement (replicated on set)."""
    from faceposegenerator_tpu.diffusion.lora_io import zero_lora
    from faceposegenerator_tpu.pipelines.txt2img import StableDiffusionPipeline

    params = _params()
    ids = jax.random.randint(jax.random.key(11), (8, 77), 0, 128)

    def build():
        return StableDiffusionPipeline(dict(params), models=TINY, policy=PARITY_POLICY)

    single_pipe = build()
    single = single_pipe(
        input_ids=ids, num_inference_steps=2, height=64, width=64, seed=3,
        output_type="np",
    )
    mesh_pipe = build()
    mesh_pipe.to_mesh(make_mesh())
    # LoRA set after mesh placement must be replicated (not left host-side)
    lora = zero_lora(params["unet"], params["text_encoder"], rank=4)
    mesh_pipe.set_lora(lora)
    sharded = mesh_pipe(
        input_ids=ids, num_inference_steps=2, height=64, width=64, seed=3,
        output_type="np",
    )
    np.testing.assert_allclose(sharded, single, atol=5e-4)
    # batch not divisible by the data axis is a clear error, not a crash
    import pytest

    with pytest.raises(ValueError, match="data"):
        mesh_pipe(input_ids=ids[:3], num_inference_steps=2, height=64, width=64)


def test_sampler_flash_path_matches_reference():
    """The composed sampler with the Pallas flash attention (interpret mode
    on CPU) reproduces the reference-einsum sampler — covers the packed
    kernel inside the full CFG loop, not just the unit tests."""
    import dataclasses as _dc

    params = _params()
    sched = make_ddpm(num_inference_steps=2)
    ids = jax.random.randint(jax.random.key(3), (2, 77), 0, 128)
    neg = jnp.zeros_like(ids)
    ref = sample(
        params, sched, ids, neg, jax.random.key(5),
        models=TINY, height=64, width=64, policy=PARITY_POLICY,
    )
    flash_models = _dc.replace(TINY, attn_impl="flash")
    out = sample(
        params, sched, ids, neg, jax.random.key(5),
        models=flash_models, height=64, width=64, policy=PARITY_POLICY,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3, rtol=1e-3)
