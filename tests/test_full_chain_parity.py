"""Full-chain per-step fp32 parity: jitted sampler vs all-torch loop
(VERDICT r3 #2; BASELINE.md "fp32 bit-comparable per denoising step").

The per-model parity tests certify each block in isolation; this one
certifies the deployed CHAIN — a scheduler/CFG/noise-indexing wiring bug
(e.g. guidance applied as c + g(c-u), noise stream off by one, decode
missing the 1/0.18215 scale) would pass every per-model test and fail
here at step 1.

Both sides: tiny transformers CLIPTextModel + TUNet + TVAE mirrors sharing
ONE set of weights via the bridge converters; identical pre-drawn noise
(`noise_override`); 30 steps (the reference inference op point,
`inference_ID-Booth.py:48`); PARITY_POLICY fp32 with reference attention.
The JAX side is the REAL `sample()` jit with `return_trajectory=True`.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from faceposegenerator_tpu.bridge.full_chain import compare_full_chain  # noqa: E402
from faceposegenerator_tpu.bridge.torch_mirror import TUNet, TVAE  # noqa: E402
from faceposegenerator_tpu.bridge.torch_weights import (  # noqa: E402
    convert_clip_text_state_dict,
    convert_unet_state_dict,
    convert_vae_state_dict,
)
from faceposegenerator_tpu.core.precision import PARITY_POLICY  # noqa: E402
from faceposegenerator_tpu.diffusion import make_ddpm  # noqa: E402
from faceposegenerator_tpu.diffusion.sampler import SamplerModels, sample  # noqa: E402
from faceposegenerator_tpu.models import clip_text, unet2d, vae  # noqa: E402

TINY_UNET = unet2d.UNetConfig(
    block_out_channels=(32, 64, 64, 64), cross_attention_dim=48, head_dim=8
)
TINY_VAE = vae.VAEConfig(block_out_channels=(32, 32, 32, 32))


def _sd_numpy(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def chain():
    """One weight set, both frameworks."""
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=512, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=77, hidden_act="gelu",
    )
    torch.manual_seed(0)
    tm_text = transformers.CLIPTextModel(hf_cfg).eval()
    tm_unet = TUNet(TINY_UNET).eval()
    tm_vae = TVAE(TINY_VAE).eval()

    text_cfg = clip_text.CLIPTextConfig(
        vocab_size=512, hidden_size=48, num_layers=2, num_heads=4,
        intermediate_size=96, hidden_act="gelu",
    )
    params = {
        "text_encoder": convert_clip_text_state_dict(_sd_numpy(tm_text), text_cfg),
        "unet": convert_unet_state_dict(_sd_numpy(tm_unet), TINY_UNET),
        "vae": convert_vae_state_dict(_sd_numpy(tm_vae), TINY_VAE),
    }
    models = SamplerModels(
        text_cfg=text_cfg, unet_cfg=TINY_UNET, vae_cfg=TINY_VAE,
        attn_impl="reference",
    )

    def text_fn(ids_np):
        with torch.no_grad():
            return tm_text(torch.from_numpy(ids_np)).last_hidden_state.numpy()

    return params, models, text_fn, tm_unet, tm_vae


def test_full_chain_per_step_parity_30_steps(chain):
    params, models, text_fn, tm_unet, tm_vae = chain
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 512, (2, 77)).astype(np.int64)
    neg = np.zeros_like(ids)

    report = compare_full_chain(
        params, models, text_fn, tm_unet, tm_vae, ids, neg,
        steps=30, guidance_scale=5.0, height=64, width=64, seed=0,
    )
    per_step = report["latent_max_abs_per_step"]
    assert len(per_step) == 30
    # fp32 agreement at EVERY scheduler step: per-model parity is ~2e-4;
    # the chain accumulates across 30 UNet+scheduler compositions on two
    # different execution orders (one fused XLA program vs op-by-op torch)
    assert report["latent_max_abs"] < 5e-3, per_step
    # early steps must be near-bitwise (no room for accumulated drift yet):
    # a wiring bug shows up HERE as an O(1) delta at step 0/1
    assert per_step[0] < 5e-4, per_step
    assert report["image_max_abs"] < 5e-3


def test_full_chain_trajectory_matches_final_image(chain):
    """The trajectory probe must not perturb the production program: the
    images from return_trajectory=True equal the default program's output
    (same noise stream), and traj[-1] is the latent the decode consumed."""
    params, models, text_fn, tm_unet, tm_vae = chain
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 512, (1, 77)).astype(np.int64)
    neg = np.zeros_like(ids)
    sched = make_ddpm(num_inference_steps=4)
    noise = jnp.asarray(
        rng.standard_normal((5, 1, 8, 8, 4)).astype(np.float32)
    )
    kw = dict(models=models, guidance_scale=5.0, height=64, width=64,
              policy=PARITY_POLICY, noise_override=noise)
    img_default = sample(
        params, sched, jnp.asarray(ids), jnp.asarray(neg), jax.random.key(0), **kw
    )
    img_traj, traj = sample(
        params, sched, jnp.asarray(ids), jnp.asarray(neg), jax.random.key(0),
        return_trajectory=True, **kw,
    )
    np.testing.assert_array_equal(np.asarray(img_default), np.asarray(img_traj))
    assert traj.shape == (4, 1, 8, 8, 4)
    # decoding traj[-1] independently reproduces the returned image
    dec = vae.decode(params["vae"], traj[-1], TINY_VAE, policy=PARITY_POLICY)
    np.testing.assert_allclose(
        np.asarray(jnp.clip(dec * 0.5 + 0.5, 0, 1)), np.asarray(img_traj),
        atol=1e-6,
    )


def test_trajectory_rejects_approx_modes(chain):
    params, models, *_ = chain
    sched = make_ddpm(num_inference_steps=4)
    ids = jnp.zeros((1, 77), jnp.int32)
    with pytest.raises(ValueError, match="EXACT chain"):
        sample(params, sched, ids, ids, jax.random.key(0), models=models,
               height=64, width=64, policy=PARITY_POLICY,
               return_trajectory=True, deepcache_interval=2)
    with pytest.raises(ValueError, match="EXACT chain"):
        sample(params, sched, ids, ids, jax.random.key(0), models=models,
               height=64, width=64, policy=PARITY_POLICY,
               return_trajectory=True, cfg_interval=(0, 2))


def test_full_chain_dpm_trajectory_finite(chain):
    """DPM trajectory support (used by `cli parity --full_chain` when a
    checkpoint selects the validation sampler): deterministic, finite, and
    the last trajectory entry decodes to the returned image."""
    from faceposegenerator_tpu.diffusion import make_dpm_solver

    params, models, *_ = chain
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, 512, (1, 77)))
    neg = jnp.zeros_like(ids)
    sched = make_dpm_solver(num_inference_steps=4)
    noise = jnp.asarray(rng.standard_normal((5, 1, 8, 8, 4)).astype(np.float32))
    img, traj = sample(
        params, sched, ids, neg, jax.random.key(0), models=models,
        scheduler="dpm", height=64, width=64, policy=PARITY_POLICY,
        noise_override=noise, return_trajectory=True,
    )
    assert np.isfinite(np.asarray(traj)).all()
    dec = vae.decode(params["vae"], traj[-1], TINY_VAE, policy=PARITY_POLICY)
    np.testing.assert_allclose(
        np.asarray(jnp.clip(dec * 0.5 + 0.5, 0, 1)), np.asarray(img), atol=1e-6
    )
