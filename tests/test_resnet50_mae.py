"""ResNet-50 (swav/simclr trunk) torch-mirror parity + MAE ViT variant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from faceposegenerator_tpu.bridge.torch_mirror import TResNet50
from faceposegenerator_tpu.bridge.torch_weights import (
    convert_dinov2_state_dict,
    convert_resnet50_state_dict,
)
from faceposegenerator_tpu.models import dinov2, resnet50


def test_resnet50_torch_parity():
    torch.manual_seed(0)
    tm = TResNet50().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_resnet50_state_dict(sd)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2).contiguous()).numpy()
    out = resnet50.apply(params, jnp.asarray(x))
    assert out.shape == (2, 2048)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3, rtol=2e-3)

    # the `module.`-prefixed SwAV layout converts too
    params2 = convert_resnet50_state_dict({f"module.{k}": v for k, v in sd.items()})
    out2 = resnet50.apply(params2, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=0)


def test_mae_vit_no_layerscale():
    """MAE config: plain timm ViT (no LayerScale keys in the pytree); the
    hub-layout converter round-trips a layerscale-free state dict."""
    cfg = dinov2.DINOv2Config(
        hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
        patch_size=16, image_size=32, layerscale=False,
    )
    params = dinov2.init(jax.random.key(0), cfg)
    assert "ls1" not in params["layers"][0]
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 3)), jnp.float32)
    feats = dinov2.cls_feature(params, x, cfg)
    assert feats.shape == (2, 32) and np.isfinite(np.asarray(feats)).all()

    # hub layout without ls keys converts and matches
    hub = {
        "cls_token": np.asarray(params["cls_token"]),
        "pos_embed": np.asarray(params["pos_embed"]),
        "patch_embed.proj.weight": np.asarray(params["patch_embed"]["w"]).transpose(3, 2, 0, 1),
        "patch_embed.proj.bias": np.asarray(params["patch_embed"]["b"]),
        "norm.weight": np.asarray(params["final_norm"]["g"]),
        "norm.bias": np.asarray(params["final_norm"]["b"]),
    }
    for i, lp in enumerate(params["layers"]):
        p = f"blocks.{i}"
        hub[f"{p}.norm1.weight"] = np.asarray(lp["norm1"]["g"])
        hub[f"{p}.norm1.bias"] = np.asarray(lp["norm1"]["b"])
        hub[f"{p}.attn.qkv.weight"] = np.concatenate([np.asarray(lp[n]["w"]) for n in ("q", "k", "v")])
        hub[f"{p}.attn.qkv.bias"] = np.concatenate([np.asarray(lp[n]["b"]) for n in ("q", "k", "v")])
        hub[f"{p}.attn.proj.weight"] = np.asarray(lp["out"]["w"])
        hub[f"{p}.attn.proj.bias"] = np.asarray(lp["out"]["b"])
        hub[f"{p}.norm2.weight"] = np.asarray(lp["norm2"]["g"])
        hub[f"{p}.norm2.bias"] = np.asarray(lp["norm2"]["b"])
        hub[f"{p}.mlp.fc1.weight"] = np.asarray(lp["fc1"]["w"])
        hub[f"{p}.mlp.fc1.bias"] = np.asarray(lp["fc1"]["b"])
        hub[f"{p}.mlp.fc2.weight"] = np.asarray(lp["fc2"]["w"])
        hub[f"{p}.mlp.fc2.bias"] = np.asarray(lp["fc2"]["b"])
    params2 = convert_dinov2_state_dict(hub, cfg)
    feats2 = dinov2.cls_feature(params2, x, cfg)
    np.testing.assert_allclose(np.asarray(feats2), np.asarray(feats), atol=1e-6)


def test_ssl_encoders_registered():
    from faceposegenerator_tpu.evaluation import dgm

    for name in ("swav", "simclr", "mae", "sinception"):
        assert name in dgm._ENCODERS
    # smoke one of them (resnet trunk is the cheapest)
    enc = dgm._ENCODERS["swav"](weights_path=None)
    feats = enc(np.zeros((2, 32, 32, 3), np.uint8))
    assert feats.shape == (2, 2048) and np.isfinite(feats).all()
