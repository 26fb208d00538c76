"""CLIP vision tower: parity vs transformers.CLIPVisionModel with synced
random weights (dgm-eval 'clip' encoder, ln_post(CLS) features)."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from faceposegenerator_tpu.bridge.torch_weights import convert_clip_vision_state_dict
from faceposegenerator_tpu.core.precision import PARITY_POLICY
from faceposegenerator_tpu.models import clip_vision


def test_clip_vision_transformers_parity():
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        image_size=32,
        patch_size=16,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    model = transformers.CLIPVisionModel(hf_cfg).eval()
    cfg = clip_vision.CLIPVisionConfig(
        hidden_size=64, num_layers=2, num_heads=4, intermediate_size=128,
        image_size=32, patch_size=16, hidden_act="quick_gelu",
    )
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_clip_vision_state_dict(sd, cfg)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(x).permute(0, 3, 1, 2).contiguous())
    # pooler_output = post_layernorm(cls) — exactly our cls_feature contract
    ref = out.pooler_output.numpy()
    got = clip_vision.cls_feature(params, jnp.asarray(x), cfg, policy=PARITY_POLICY)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=2e-5)

    # the pre-pool hidden states match too
    np.testing.assert_allclose(
        np.asarray(clip_vision.apply(params, jnp.asarray(x), cfg, policy=PARITY_POLICY)),
        out.last_hidden_state.numpy(),
        atol=2e-5, rtol=2e-5,
    )


def test_clip_dgm_encoder_runs():
    from faceposegenerator_tpu.evaluation import dgm

    enc = dgm._ENCODERS["clip"](weights_path=None, arch="vitb32")
    feats = enc(np.zeros((2, 64, 64, 3), np.uint8))
    assert feats.shape == (2, 768) and np.isfinite(feats).all()
