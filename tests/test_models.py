"""Model-level tests: shapes, causality, LoRA identity, and IResNet parity
against the reference torch implementation used as a numerical oracle
(imported read-only from /root/reference — not copied)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceposegenerator_tpu.core.precision import PARITY_POLICY
from faceposegenerator_tpu.models import clip_text, unet2d, vae, iresnet


TINY_TEXT = clip_text.CLIPTextConfig(
    vocab_size=128, hidden_size=64, num_layers=2, num_heads=4, intermediate_size=128
)
TINY_UNET = unet2d.UNetConfig(
    block_out_channels=(32, 64, 96, 96), cross_attention_dim=48, head_dim=8
)
TINY_VAE = vae.VAEConfig(block_out_channels=(32, 32, 64, 64))


def test_clip_shapes_and_causality():
    params = clip_text.init(jax.random.key(0), TINY_TEXT)
    ids = jax.random.randint(jax.random.key(1), (2, 77), 0, 128)
    out = clip_text.apply(params, ids, TINY_TEXT, policy=PARITY_POLICY)
    assert out.shape == (2, 77, 64)
    # causality: changing a later token must not affect earlier positions
    ids2 = ids.at[:, 50].set((ids[:, 50] + 1) % 128)
    out2 = clip_text.apply(params, ids2, TINY_TEXT, policy=PARITY_POLICY)
    np.testing.assert_allclose(
        np.asarray(out[:, :50]), np.asarray(out2[:, :50]), atol=1e-5
    )
    assert not np.allclose(np.asarray(out[:, 50]), np.asarray(out2[:, 50]))


def test_unet_shapes():
    params = unet2d.init(jax.random.key(0), TINY_UNET)
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 4))
    t = jnp.array([10, 500])
    ctx = jax.random.normal(jax.random.key(2), (2, 77, 48))
    out = unet2d.apply(params, x, t, ctx, TINY_UNET, policy=PARITY_POLICY)
    assert out.shape == x.shape
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_unet_timestep_embedding_diffusers_semantics():
    emb = unet2d.timestep_embedding(jnp.array([0.0, 999.0]), 320, True, 0)
    assert emb.shape == (2, 320)
    # t=0: cos half = 1, sin half = 0 (flip_sin_to_cos puts cos first)
    np.testing.assert_allclose(np.asarray(emb[0, :160]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 160:]), 0.0, atol=1e-6)


def test_unet_lora_zero_is_identity_and_nonzero_changes():
    params = unet2d.init(jax.random.key(0), TINY_UNET)
    lora = unet2d.init_lora(jax.random.key(3), params, rank=4)
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 4))
    t = jnp.array([100])
    ctx = jax.random.normal(jax.random.key(2), (1, 77, 48))
    base = unet2d.apply(params, x, t, ctx, TINY_UNET, policy=PARITY_POLICY)
    with_zero = unet2d.apply(params, x, t, ctx, TINY_UNET, policy=PARITY_POLICY, lora=lora)
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_zero), atol=1e-6)
    # perturb one B matrix → output changes
    lora["mid_block"]["attentions"][0]["blocks"][0]["attn1"]["q"]["b"] = (
        jnp.ones_like(lora["mid_block"]["attentions"][0]["blocks"][0]["attn1"]["q"]["b"])
    )
    changed = unet2d.apply(params, x, t, ctx, TINY_UNET, policy=PARITY_POLICY, lora=lora)
    assert not np.allclose(np.asarray(base), np.asarray(changed))


def test_unet_remat_matches():
    params = unet2d.init(jax.random.key(0), TINY_UNET)
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 4))
    t = jnp.array([100])
    ctx = jax.random.normal(jax.random.key(2), (1, 77, 48))
    a = unet2d.apply(params, x, t, ctx, TINY_UNET, policy=PARITY_POLICY)
    b = unet2d.apply(params, x, t, ctx, TINY_UNET, policy=PARITY_POLICY, remat=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_vae_roundtrip_shapes():
    params = vae.init(jax.random.key(0), TINY_VAE)
    img = jax.random.uniform(jax.random.key(1), (1, 64, 64, 3), minval=-1, maxval=1)
    moments = vae.encode_moments(params, img, TINY_VAE, policy=PARITY_POLICY)
    assert moments[0].shape == (1, 8, 8, 4)
    lat = vae.sample_latents(moments, jax.random.key(2), TINY_VAE)
    assert lat.shape == (1, 8, 8, 4)
    out = vae.decode(params, lat, TINY_VAE, policy=PARITY_POLICY)
    assert out.shape == img.shape
    assert np.isfinite(np.asarray(out)).all()


def _torch_iresnet18():
    import sys

    sys.path.insert(0, "/root/reference")
    from ArcFace_files.backbones import iresnet as torch_iresnet

    return torch_iresnet.iresnet18(num_features=512)


def _copy_params_to_torch(tm, params, state):
    """Load our JAX init into the reference torch model (oracle direction)."""
    import torch

    def setc(conv, p):
        conv.weight.data = torch.from_numpy(np.asarray(p["w"]).transpose(3, 2, 0, 1).copy())

    def setbn(bn, p, s):
        bn.weight.data = torch.from_numpy(np.asarray(p["g"]).copy())
        bn.bias.data = torch.from_numpy(np.asarray(p["b"]).copy())
        bn.running_mean.data = torch.from_numpy(np.asarray(s["mean"]).copy())
        bn.running_var.data = torch.from_numpy(np.asarray(s["var"]).copy())

    setc(tm.conv1, params["conv1"])
    setbn(tm.bn1, params["bn1"], state["bn1"])
    tm.prelu.weight.data = torch.from_numpy(np.asarray(params["prelu1"]).copy())
    for li in range(1, 5):
        layer = getattr(tm, f"layer{li}")
        for bi, blk in enumerate(layer):
            bp, bs = params[f"layer{li}"][bi], state[f"layer{li}"][bi]
            setbn(blk.bn1, bp["bn1"], bs["bn1"])
            setc(blk.conv1, bp["conv1"])
            setbn(blk.bn2, bp["bn2"], bs["bn2"])
            blk.prelu.weight.data = torch.from_numpy(np.asarray(bp["prelu"]).copy())
            setc(blk.conv2, bp["conv2"])
            setbn(blk.bn3, bp["bn3"], bs["bn3"])
            if blk.downsample is not None:
                setc(blk.downsample[0], bp["down_conv"])
                setbn(blk.downsample[1], bp["down_bn"], bs["down_bn"])
    setbn(tm.bn2, params["bn2"], state["bn2"])
    # fc: our flatten is NHWC (h, w, c); torch is (c, h, w)
    w = np.asarray(params["fc"]["w"]).reshape(512, 7, 7, 512).transpose(0, 3, 1, 2).reshape(512, -1)
    tm.fc.weight.data = torch.from_numpy(w.copy())
    tm.fc.bias.data = torch.from_numpy(np.asarray(params["fc"]["b"]).copy())
    setbn(tm.features, params["features_bn"], state["features_bn"])
    tm.features.weight.data.fill_(1.0)


def test_iresnet18_parity_vs_reference_torch():
    torch = pytest.importorskip("torch")
    cfg = iresnet.config_for("r18")
    params, state = iresnet.init(jax.random.key(0), cfg)
    # randomize BN stats a bit so the test is not trivially normalized
    state = jax.tree.map(lambda x: x + 0.01, state)

    tm = _torch_iresnet18()
    _copy_params_to_torch(tm, params, state)
    tm.eval()

    img = np.random.default_rng(0).uniform(-1, 1, (2, 112, 112, 3)).astype(np.float32)
    emb, _ = iresnet.apply(params, state, jnp.asarray(img), cfg, policy=PARITY_POLICY)
    with torch.no_grad():
        temb = tm(torch.from_numpy(img.transpose(0, 3, 1, 2).copy())).numpy()
    np.testing.assert_allclose(np.asarray(emb), temb, atol=2e-3, rtol=1e-3)


def test_iresnet_train_mode_updates_state():
    cfg = iresnet.config_for("r18", dropout=0.4)
    params, state = iresnet.init(jax.random.key(0), cfg)
    img = jax.random.uniform(jax.random.key(1), (4, 112, 112, 3), minval=-1, maxval=1)
    emb, new_state = iresnet.apply(
        params, state, img, cfg, train=True, dropout_key=jax.random.key(2)
    )
    assert emb.shape == (4, 512)
    assert not np.allclose(
        np.asarray(new_state["bn1"]["mean"]), np.asarray(state["bn1"]["mean"])
    )


def test_unet_honors_norm_groups():
    """cfg.norm_groups must reach every group_norm call — channels not
    divisible by 32 only work when the configured group count is used."""
    cfg = unet2d.UNetConfig(
        block_out_channels=(24, 48, 48, 48),
        cross_attention_dim=24,
        head_dim=8,
        norm_groups=8,
    )
    params = unet2d.init(jax.random.key(0), cfg)
    out = unet2d.apply(
        params,
        jnp.zeros((1, 16, 16, 4)),
        jnp.asarray([3]),
        jnp.zeros((1, 77, 24)),
        cfg,
        attn_impl="reference",
    )
    assert out.shape == (1, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()
