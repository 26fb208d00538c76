"""SimCLRv2 selective-kernel ResNet: torch-mirror parity (r50 sk1 wiring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from faceposegenerator_tpu.bridge.torch_mirror import TSimCLRResNet
from faceposegenerator_tpu.bridge.torch_weights import convert_simclr_state_dict
from faceposegenerator_tpu.models import simclr_resnet


def test_simclr_sk_resnet_torch_parity():
    torch.manual_seed(0)
    tm = TSimCLRResNet(width_multiplier=1).eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_simclr_state_dict(sd)

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2).contiguous()).numpy()
    out = simclr_resnet.apply(params, jnp.asarray(x))
    assert out.shape == (2, 2048)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3, rtol=2e-3)


def test_simclr_encoder_registered():
    from faceposegenerator_tpu.evaluation import dgm

    assert "simclr" in dgm._ENCODERS
