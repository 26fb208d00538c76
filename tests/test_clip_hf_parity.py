"""CLIP text encoder parity against HuggingFace transformers (real oracle).

Builds a random-weight `transformers.CLIPTextModel` with SD2.1-shaped
hyperparameters (no downloads), exports its state dict through the weights
bridge, and compares last_hidden_state — validating the bridge key mapping
AND the encoder math (causal mask, exact GELU, LayerNorm placement) against
the exact module the reference uses (`train_ID-Booth.py:599-630`).
"""

import numpy as np
import pytest

from faceposegenerator_tpu.bridge.torch_weights import convert_clip_text_state_dict
from faceposegenerator_tpu.core.precision import PARITY_POLICY
from faceposegenerator_tpu.models import clip_text


def test_clip_parity_vs_transformers():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=1000,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        max_position_embeddings=77,
        hidden_act="gelu",  # SD2.1 uses exact gelu
    )
    torch.manual_seed(0)
    hf_model = transformers.CLIPTextModel(hf_cfg).eval()

    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    our_cfg = clip_text.CLIPTextConfig(
        vocab_size=1000, hidden_size=64, num_layers=3, num_heads=4,
        intermediate_size=128, hidden_act="gelu",
    )
    params = convert_clip_text_state_dict(sd, our_cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 1000, (2, 77)).astype(np.int64)

    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids)).last_hidden_state.numpy()

    import jax.numpy as jnp

    out = clip_text.apply(params, jnp.asarray(ids), our_cfg, policy=PARITY_POLICY)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_clip_parity_quick_gelu_variant():
    """SD1.x uses quick_gelu — verify that activation path too."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=500, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=77, hidden_act="quick_gelu",
    )
    torch.manual_seed(1)
    hf_model = transformers.CLIPTextModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    our_cfg = clip_text.CLIPTextConfig(
        vocab_size=500, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, hidden_act="quick_gelu",
    )
    params = convert_clip_text_state_dict(sd, our_cfg)
    ids = np.random.default_rng(1).integers(0, 500, (1, 77)).astype(np.int64)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids)).last_hidden_state.numpy()
    import jax.numpy as jnp

    out = clip_text.apply(params, jnp.asarray(ids), our_cfg, policy=PARITY_POLICY)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)
