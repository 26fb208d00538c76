"""ConvNeXt: torch-mirror parity with synced random weights (dgm-eval
'convnext' encoder)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from faceposegenerator_tpu.bridge.torch_mirror import TConvNeXt
from faceposegenerator_tpu.bridge.torch_weights import convert_convnext_state_dict
from faceposegenerator_tpu.models import convnext


def test_convnext_torch_parity():
    cfg = convnext.ConvNeXtConfig(depths=(2, 2, 2, 2), dims=(16, 32, 48, 64))
    torch.manual_seed(0)
    tm = TConvNeXt(depths=cfg.depths, dims=cfg.dims).eval()
    # nontrivial layerscale
    with torch.no_grad():
        for name, p in tm.named_parameters():
            if name.endswith(".gamma"):
                p.uniform_(0.5, 1.5)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_convnext_state_dict(sd, cfg)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2).contiguous()).numpy()
    out = convnext.apply(params, jnp.asarray(x), cfg)
    assert out.shape == (2, 64)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def test_convnext_encoder_registered():
    from faceposegenerator_tpu.evaluation import dgm

    assert "convnext" in dgm._ENCODERS
