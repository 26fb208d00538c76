"""Data2Vec-Vision (BEiT): parity vs transformers.Data2VecVisionModel with
synced random weights — rel-pos bias, no-bias key, LayerScale, mean pooler."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from faceposegenerator_tpu.bridge.torch_weights import convert_data2vec_state_dict
from faceposegenerator_tpu.models import data2vec_vision


def test_data2vec_transformers_parity():
    hf_cfg = transformers.Data2VecVisionConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        image_size=32,
        patch_size=16,
        use_relative_position_bias=True,
        use_mean_pooling=True,
        layer_scale_init_value=0.1,
    )
    torch.manual_seed(0)
    model = transformers.Data2VecVisionModel(hf_cfg, add_pooling_layer=True).eval()
    # nontrivial relative-position bias tables
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "relative_position_bias_table" in name:
                p.normal_(0, 0.5)
    cfg = data2vec_vision.Data2VecVisionConfig(
        hidden_size=64, num_layers=2, num_heads=4, intermediate_size=128,
        image_size=32, patch_size=16,
    )
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_data2vec_state_dict(sd, cfg)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(x).permute(0, 3, 1, 2).contiguous())
    pooled_ref = out.pooler_output.numpy()
    got = data2vec_vision.pooled_feature(params, jnp.asarray(x), cfg)
    np.testing.assert_allclose(np.asarray(got), pooled_ref, atol=2e-5, rtol=2e-5)


def test_data2vec_encoder_registered():
    from faceposegenerator_tpu.evaluation import dgm

    assert "data2vec" in dgm._ENCODERS
