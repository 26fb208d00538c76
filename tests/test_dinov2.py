"""DINOv2 encoder: architecture parity vs transformers.Dinov2Model with
synced random weights (the reference's primary dgm-eval encoder —
`dgm_eval/models/load_encoder.py:14-25`, hub dinov2_vitl14)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceposegenerator_tpu.bridge.torch_weights import convert_dinov2_state_dict
from faceposegenerator_tpu.core.precision import PARITY_POLICY
from faceposegenerator_tpu.models import dinov2

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def _small_pair(image_size=28):
    """A tiny Dinov2Model + matching DINOv2Config (patch 14 → 2×2 grid)."""
    hf_cfg = transformers.Dinov2Config(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        image_size=image_size,
        patch_size=14,
        layerscale_value=0.1,  # nontrivial LayerScale
    )
    torch.manual_seed(0)
    model = transformers.Dinov2Model(hf_cfg).eval()
    cfg = dinov2.DINOv2Config(
        hidden_size=64, num_layers=2, num_heads=4, intermediate_size=128,
        patch_size=14, image_size=image_size,
    )
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_dinov2_state_dict(sd, cfg)
    return model, cfg, params


def test_dinov2_transformers_parity_exact_grid():
    model, cfg, params = _small_pair(image_size=28)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 28, 28, 3)).astype(np.float32)

    with torch.no_grad():
        out = model(torch.from_numpy(x).permute(0, 3, 1, 2).contiguous())
    hidden_ref = out.last_hidden_state.numpy()  # final-LN sequence
    pooled_ref = out.pooler_output.numpy()  # CLS token

    hidden = dinov2.apply(params, jnp.asarray(x), cfg, policy=PARITY_POLICY)
    np.testing.assert_allclose(np.asarray(hidden), hidden_ref, atol=2e-5, rtol=2e-5)

    cls = dinov2.cls_feature(params, jnp.asarray(x), cfg, policy=PARITY_POLICY)
    np.testing.assert_allclose(np.asarray(cls), pooled_ref, atol=2e-5, rtol=2e-5)


def test_dinov2_pos_embed_interpolation():
    """Feeding a different resolution than the trained grid interpolates the
    position embeddings (dgm-eval feeds 224² into the 518-trained model).
    transformers uses torch bicubic; jax.image bicubic differs slightly at
    the edges, so tolerance is loose — the exact-grid test above pins the
    rest of the network."""
    model, cfg, params = _small_pair(image_size=42)  # trained grid 3×3
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 28, 28, 3)).astype(np.float32)  # 2×2 grid

    with torch.no_grad():
        out = model(torch.from_numpy(x).permute(0, 3, 1, 2).contiguous())
    pooled_ref = out.pooler_output.numpy()
    cls = dinov2.cls_feature(params, jnp.asarray(x), cfg, policy=PARITY_POLICY)
    assert np.asarray(cls).shape == pooled_ref.shape
    # direction agreement (cosine) rather than elementwise equality
    a = np.asarray(cls).ravel()
    b = pooled_ref.ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.99, f"interpolated-pos-embed cosine {cos}"


def test_dinov2_hub_key_layout():
    """The converter also accepts the facebookresearch/dinov2 hub layout
    (fused qkv, ls{1,2}.gamma, patch_embed.proj) — what torch.hub serves."""
    _, cfg, params_hf = _small_pair(image_size=28)
    D = cfg.hidden_size

    # rebuild a hub-style state dict from the converted params
    hub = {
        "cls_token": np.asarray(params_hf["cls_token"]),
        "pos_embed": np.asarray(params_hf["pos_embed"]),
        "patch_embed.proj.weight": np.asarray(params_hf["patch_embed"]["w"]).transpose(3, 2, 0, 1),
        "patch_embed.proj.bias": np.asarray(params_hf["patch_embed"]["b"]),
        "norm.weight": np.asarray(params_hf["final_norm"]["g"]),
        "norm.bias": np.asarray(params_hf["final_norm"]["b"]),
    }
    for i, lp in enumerate(params_hf["layers"]):
        p = f"blocks.{i}"
        hub[f"{p}.norm1.weight"] = np.asarray(lp["norm1"]["g"])
        hub[f"{p}.norm1.bias"] = np.asarray(lp["norm1"]["b"])
        hub[f"{p}.attn.qkv.weight"] = np.concatenate(
            [np.asarray(lp[n]["w"]) for n in ("q", "k", "v")], axis=0
        )
        hub[f"{p}.attn.qkv.bias"] = np.concatenate(
            [np.asarray(lp[n]["b"]) for n in ("q", "k", "v")], axis=0
        )
        hub[f"{p}.attn.proj.weight"] = np.asarray(lp["out"]["w"])
        hub[f"{p}.attn.proj.bias"] = np.asarray(lp["out"]["b"])
        hub[f"{p}.ls1.gamma"] = np.asarray(lp["ls1"])
        hub[f"{p}.ls2.gamma"] = np.asarray(lp["ls2"])
        hub[f"{p}.norm2.weight"] = np.asarray(lp["norm2"]["g"])
        hub[f"{p}.norm2.bias"] = np.asarray(lp["norm2"]["b"])
        hub[f"{p}.mlp.fc1.weight"] = np.asarray(lp["fc1"]["w"])
        hub[f"{p}.mlp.fc1.bias"] = np.asarray(lp["fc1"]["b"])
        hub[f"{p}.mlp.fc2.weight"] = np.asarray(lp["fc2"]["w"])
        hub[f"{p}.mlp.fc2.bias"] = np.asarray(lp["fc2"]["b"])

    params_hub = convert_dinov2_state_dict(hub, cfg)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 28, 28, 3)), jnp.float32)
    a = dinov2.cls_feature(params_hf, x, cfg, policy=PARITY_POLICY)
    b = dinov2.cls_feature(params_hub, x, cfg, policy=PARITY_POLICY)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_dinov2_dgm_encoder_runs():
    """The registered dgm-eval encoder: uint8 batch → 224² bicubic +
    imagenet norm → CLS features (random-weights fallback, vits14 for
    speed)."""
    from faceposegenerator_tpu.evaluation import dgm

    enc = dgm._ENCODERS["dinov2"](weights_path=None, arch="vits14")
    batch = np.zeros((2, 64, 64, 3), np.uint8)
    feats = enc(batch)
    assert feats.shape == (2, 384) and np.isfinite(feats).all()
