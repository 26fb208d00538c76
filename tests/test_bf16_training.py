"""bf16-policy training regression: gradients flow through conv stacks with
bf16 params/activations (caught live: preferred_element_type upcast broke
the conv transpose rule's dtype agreement — only fp32 paths were tested)."""

import jax
import jax.numpy as jnp
import numpy as np

from faceposegenerator_tpu.core.precision import Policy
from faceposegenerator_tpu.diffusion import make_ddpm
from faceposegenerator_tpu.models import clip_text, unet2d, vae, iresnet
from faceposegenerator_tpu.training import idbooth

BF16 = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)


def test_bf16_idbooth_grads():
    bundle = idbooth.ModelBundle(
        text_cfg=clip_text.CLIPTextConfig(
            vocab_size=64, hidden_size=32, num_layers=1, num_heads=4, intermediate_size=64
        ),
        unet_cfg=unet2d.UNetConfig(
            block_out_channels=(32, 32, 32, 32), cross_attention_dim=32, head_dim=8
        ),
        vae_cfg=vae.VAEConfig(block_out_channels=(32, 32, 32, 32)),
        arcface_cfg=iresnet.config_for("r18", num_features=32),
    )
    ap, ast = iresnet.init(jax.random.key(3), bundle.arcface_cfg)
    frozen = {
        "text_encoder": clip_text.init(jax.random.key(0), bundle.text_cfg, dtype=jnp.bfloat16),
        "unet": unet2d.init(jax.random.key(1), bundle.unet_cfg, dtype=jnp.bfloat16),
        "vae": vae.init(jax.random.key(2), bundle.vae_cfg, dtype=jnp.bfloat16),
        "arcface": {"params": ap, "state": ast},
    }
    cfg = idbooth.IDBoothConfig(which_loss="triplet_prior", resolution=64)
    trainable = idbooth.init_trainable(jax.random.key(4), cfg, bundle, frozen["unet"])
    loss_fn = idbooth.make_loss_fn(cfg, bundle, make_ddpm(), BF16)
    batch = {
        "pixel_values": jax.random.uniform(jax.random.key(10), (2, 64, 64, 3), minval=-1, maxval=1),
        "input_ids": jax.random.randint(jax.random.key(11), (2, 77), 0, 64),
        "gt_embeds": jax.random.normal(jax.random.key(12), (2, 32)),
    }
    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        trainable, frozen, batch, jax.random.key(0)
    )
    assert np.isfinite(float(loss))
    flat, _ = jax.tree.flatten(grads)
    gnorm = float(sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in flat)) ** 0.5
    assert np.isfinite(gnorm) and gnorm > 0
