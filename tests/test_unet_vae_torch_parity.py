"""Torch-oracle parity for the UNet and VAE (the two largest models).

A minimal torch mirror of the diffusers `UNet2DConditionModel` /
`AutoencoderKL` wiring (resblock, transformer/GEGLU, up/down sampling, VAE
mid attention — diffusers semantics cited in `models/unet2d.py:1-22` and
`models/vae.py:1-11`) is built HERE, module names chosen so `state_dict()`
produces the exact diffusers key layout. Weights flow through
`bridge.torch_weights.convert_unet_state_dict` / `convert_vae_state_dict`,
so a key-mapping or block-wiring mistake in the bridge or the models fails
these tests — previously the two models had only structural round-trips.

Covers: full tiny-config UNet + VAE encode/decode, AND single blocks at the
real SD2.1 channel/head shapes (320ch resblock, 5-head/64-dim transformer
with 1024-dim cross-attention, 512ch VAE attention).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from faceposegenerator_tpu.bridge.torch_weights import (
    convert_unet_state_dict,
    convert_vae_state_dict,
)
from faceposegenerator_tpu.core.precision import PARITY_POLICY
from faceposegenerator_tpu.models import unet2d, vae

from faceposegenerator_tpu.bridge.torch_mirror import (
    TResnetBlock,
    TTransformer2D,
    TUNet,
    TVAE,
    TVAEAttn,
)

torch.manual_seed(0)


def _sd_numpy(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2).contiguous()


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

TINY_UNET = unet2d.UNetConfig(
    block_out_channels=(32, 64, 64, 64), cross_attention_dim=48, head_dim=8
)
TINY_VAE = vae.VAEConfig(block_out_channels=(32, 32, 32, 32))


def test_unet_full_torch_parity_tiny():
    tm = TUNet(TINY_UNET).eval()
    params = convert_unet_state_dict(_sd_numpy(tm), TINY_UNET)
    rng = np.random.default_rng(0)
    lat = rng.standard_normal((2, 16, 16, 4)).astype(np.float32)
    t = np.array([7, 531], np.int64)
    ctx = rng.standard_normal((2, 77, 48)).astype(np.float32)

    with torch.no_grad():
        ref = tm(_nchw(lat), torch.from_numpy(t), torch.from_numpy(ctx))
    ref = ref.permute(0, 2, 3, 1).numpy()

    out = unet2d.apply(
        params, jnp.asarray(lat), jnp.asarray(t), jnp.asarray(ctx), TINY_UNET,
        policy=PARITY_POLICY, attn_impl="reference",
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)


def test_vae_full_torch_parity_tiny():
    tm = TVAE(TINY_VAE).eval()
    params = convert_vae_state_dict(_sd_numpy(tm), TINY_VAE)
    rng = np.random.default_rng(1)
    img = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        mean_t, logvar_t = tm.encode_moments(_nchw(img))
    mean_j, logvar_j = vae.encode_moments(params, jnp.asarray(img), TINY_VAE, policy=PARITY_POLICY)
    np.testing.assert_allclose(
        np.asarray(mean_j), mean_t.permute(0, 2, 3, 1).numpy(), atol=2e-4, rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(logvar_j), logvar_t.permute(0, 2, 3, 1).numpy(), atol=2e-4, rtol=2e-4
    )

    lat = (rng.standard_normal((2, 4, 4, 4)) * 0.2).astype(np.float32)
    with torch.no_grad():
        dec_t = tm.decode(_nchw(lat))
    dec_j = vae.decode(params, jnp.asarray(lat), TINY_VAE, policy=PARITY_POLICY)
    np.testing.assert_allclose(
        np.asarray(dec_j), dec_t.permute(0, 2, 3, 1).numpy(), atol=3e-4, rtol=3e-4
    )


def test_sd21_resblock_real_shape_parity():
    """One resblock at the real SD2.1 level-0 shape: 320ch, 64×64, temb 1280."""
    tm = TResnetBlock(320, 320, 1280).eval()
    sd = {f"r.{k}": v.detach().numpy() for k, v in tm.state_dict().items()}
    from faceposegenerator_tpu.bridge.torch_weights import _resblock

    p = _resblock(sd, "r", jnp.float32)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 64, 64, 320)).astype(np.float32)
    temb = rng.standard_normal((1, 1280)).astype(np.float32)
    with torch.no_grad():
        ref = tm(_nchw(x), torch.from_numpy(temb)).permute(0, 2, 3, 1).numpy()
    out = unet2d._resblock_apply(p, jnp.asarray(x), jnp.asarray(temb), PARITY_POLICY)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=5e-4)


def test_sd21_transformer_real_shape_parity():
    """One transformer at real SD2.1 level-0 config: C=320, 5 heads × 64,
    cross-attention dim 1024 (spatial 32×32 to keep CPU time sane — the
    head-split/wiring under test is sequence-length independent)."""
    cfg = unet2d.SD21_UNET_CONFIG
    tm = TTransformer2D(320, cfg.cross_attention_dim, cfg.head_dim).eval()
    sd = {f"tr.{k}": v.detach().numpy() for k, v in tm.state_dict().items()}
    from faceposegenerator_tpu.bridge.torch_weights import _transformer

    p = _transformer(sd, "tr", jnp.float32)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 32, 32, 320)).astype(np.float32)
    ctx = rng.standard_normal((1, 77, 1024)).astype(np.float32)
    with torch.no_grad():
        ref = tm(_nchw(x), torch.from_numpy(ctx)).permute(0, 2, 3, 1).numpy()
    out = unet2d._transformer_apply(
        p, jnp.asarray(x), jnp.asarray(ctx), cfg, attn_impl="reference"
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=5e-4)


def test_sd21_vae_attention_real_shape_parity():
    """VAE mid attention at the real 512-channel shape (single head, 512-dim)."""
    tm = TVAEAttn(512).eval()
    sd = {f"a.{k}": v.detach().numpy() for k, v in tm.state_dict().items()}
    from faceposegenerator_tpu.bridge.torch_weights import _vae_attn

    p = _vae_attn(sd, "a", jnp.float32)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 16, 16, 512)).astype(np.float32)
    with torch.no_grad():
        ref = tm(_nchw(x)).permute(0, 2, 3, 1).numpy()
    out = vae._attn_apply(p, jnp.asarray(x), attn_impl="reference")
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=5e-4)
