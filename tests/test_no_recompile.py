"""LoRA checkpoint swaps must NOT retrace/recompile the sampler — the
merge-without-recompile north star (PROGRESS/BASELINE: "LoRA checkpoints
load and merge ... without recompiles")."""

import jax
import jax.numpy as jnp
import numpy as np

from faceposegenerator_tpu.diffusion import make_ddpm
from faceposegenerator_tpu.diffusion.sampler import SamplerModels, sample
from faceposegenerator_tpu.models import clip_text, unet2d, vae
from faceposegenerator_tpu.core.precision import PARITY_POLICY


TINY = SamplerModels(
    text_cfg=clip_text.CLIPTextConfig(
        vocab_size=64, hidden_size=32, num_layers=1, num_heads=4, intermediate_size=64
    ),
    unet_cfg=unet2d.UNetConfig(
        block_out_channels=(32, 32, 32, 32), cross_attention_dim=32, head_dim=8
    ),
    vae_cfg=vae.VAEConfig(block_out_channels=(32, 32, 32, 32)),
)


def test_lora_swap_no_retrace():
    params = {
        "text_encoder": clip_text.init(jax.random.key(0), TINY.text_cfg),
        "unet": unet2d.init(jax.random.key(1), TINY.unet_cfg),
        "vae": vae.init(jax.random.key(2), TINY.vae_cfg),
    }
    sched = make_ddpm(num_inference_steps=2)
    ids = jax.random.randint(jax.random.key(3), (1, 77), 0, 64)
    neg = jnp.zeros_like(ids)

    lora_a = {"unet": unet2d.init_lora(jax.random.key(4), params["unet"], rank=4), "text_encoder": None}
    lora_b = jax.tree.map(lambda x: x + 0.03, lora_a)

    def run(lora):
        return sample(
            params, sched, ids, neg, jax.random.key(0),
            models=TINY, height=64, width=64, policy=PARITY_POLICY, lora=lora,
        )

    out_a = run(lora_a)
    n_compiles = sample._cache_size()
    out_b = run(lora_b)  # different weights, same structure
    assert sample._cache_size() == n_compiles, "LoRA swap triggered a retrace"
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))

    # different identity seed also reuses the program
    sample(params, sched, ids, neg, jax.random.key(7), models=TINY, height=64, width=64, policy=PARITY_POLICY, lora=lora_b)
    assert sample._cache_size() == n_compiles
