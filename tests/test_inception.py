"""FID InceptionV3: torch-mirror parity with synced random weights (the
dgm-eval registry default encoder — `models/load_encoder.py:14-25`,
pytorch-fid patches per `dgm_eval/models/inception.py:229-340`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from faceposegenerator_tpu.bridge.torch_mirror import TInceptionV3
from faceposegenerator_tpu.bridge.torch_weights import convert_inception_state_dict
from faceposegenerator_tpu.models import inception_v3


def test_inception_torch_parity():
    torch.manual_seed(0)
    tm = TInceptionV3().eval()
    # nontrivial BN statistics so the inference-BN fold is actually tested
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_inception_state_dict(sd)

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 299, 299, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2).contiguous()).numpy()
    out = inception_v3.apply(params, jnp.asarray(x))
    assert out.shape == (2, 2048)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3, rtol=2e-3)


def test_inception_dgm_encoder_runs():
    from faceposegenerator_tpu.evaluation import dgm

    enc = dgm._ENCODERS["inception"](weights_path=None)
    feats = enc(np.zeros((2, 64, 64, 3), np.uint8))
    assert feats.shape == (2, 2048) and np.isfinite(feats).all()
