"""Backbone registry: every family initializes and embeds; SE/remat work."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceposegenerator_tpu.core.precision import PARITY_POLICY
from faceposegenerator_tpu.models import iresnet
from faceposegenerator_tpu.models.registry import get_model


@pytest.mark.parametrize("name", ["r18", "mbf", "vit_t"])
def test_registry_embeds(name):
    init, apply, cfg = get_model(name, num_features=128)
    params, state = init(jax.random.key(0))
    x = jax.random.uniform(jax.random.key(1), (2, 112, 112, 3), minval=-1, maxval=1)
    emb = apply(params, state, x, policy=PARITY_POLICY)
    assert emb.shape == (2, 128)
    assert emb.dtype == jnp.float32
    assert np.isfinite(np.asarray(emb)).all()


def test_iresnet_se_variant():
    cfg = iresnet.IResNetConfig(depths=(1, 1, 1, 1), num_features=32, use_se=True)
    params, state = iresnet.init(jax.random.key(0), cfg)
    assert "se_fc1" in params["layer1"][0]
    x = jax.random.uniform(jax.random.key(1), (1, 112, 112, 3), minval=-1, maxval=1)
    emb, _ = iresnet.apply(params, state, x, cfg, policy=PARITY_POLICY)
    assert np.isfinite(np.asarray(emb)).all()


def test_iresnet_remat_matches_plain():
    base = iresnet.IResNetConfig(depths=(1, 1, 1, 1), num_features=32)
    params, state = iresnet.init(jax.random.key(0), base)
    x = jax.random.uniform(jax.random.key(1), (1, 112, 112, 3), minval=-1, maxval=1)
    a, _ = iresnet.apply(params, state, x, base, policy=PARITY_POLICY)
    rcfg = iresnet.IResNetConfig(depths=(1, 1, 1, 1), num_features=32, remat=True)
    b, _ = iresnet.apply(params, state, x, rcfg, policy=PARITY_POLICY)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_registry_r2060_plan():
    init, apply, cfg = get_model("r2060")
    assert tuple(cfg.depths) == (3, 128, 896, 3)
    assert cfg.remat  # deep variant defaults to per-block checkpointing


def test_vit_masking_changes_train_output():
    from faceposegenerator_tpu.models import vit_face

    cfg = vit_face.FaceViTConfig(embed_dim=64, depth=2, num_features=32, mask_ratio=0.3)
    params, state = vit_face.init(jax.random.key(0), cfg)
    x = jax.random.uniform(jax.random.key(1), (2, 112, 112, 3))
    eval_out = vit_face.apply(params, state, x, cfg, policy=PARITY_POLICY)
    train_out = vit_face.apply(
        params, state, x, cfg, policy=PARITY_POLICY, train=True, mask_key=jax.random.key(2)
    )
    assert not np.allclose(np.asarray(eval_out), np.asarray(train_out))
