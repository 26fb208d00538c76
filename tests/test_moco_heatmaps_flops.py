"""MoCo builder, FD heatmaps, and compiler-FLOPs utility tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from faceposegenerator_tpu.core.flops import cost_analysis, flops
from faceposegenerator_tpu.evaluation.heatmaps import (
    fit_real_gaussian,
    make_heatmap_fn,
    overlay_heatmap,
)
from faceposegenerator_tpu.training import moco


def _toy_encoder():
    def init(key):
        return {"w": jax.random.normal(key, (128, 48))}

    def apply(params, x):
        return x.reshape(x.shape[0], -1) @ params["w"].T

    return init, apply


def test_moco_step_and_queue():
    cfg = moco.MoCoConfig(dim=128, queue_size=256, momentum=0.9)
    init, apply = _toy_encoder()
    state = moco.init_moco(jax.random.key(0), init, cfg)
    opt = optax.sgd(0.1)
    opt_state = opt.init(state["params_q"])
    q = jax.random.normal(jax.random.key(1), (8, 4, 4, 3))
    k = q + 0.01 * jax.random.normal(jax.random.key(2), q.shape)
    loss, state2, opt_state, aux = moco.moco_step(
        state, apply, opt, opt_state, q, k, cfg
    )
    assert np.isfinite(float(loss))
    assert int(state2["queue_ptr"]) == 8
    # key encoder is an EMA blend, not the raw query params
    assert not np.allclose(
        np.asarray(state2["params_k"]["w"]), np.asarray(state2["params_q"]["w"])
    )
    # on the first step the queue holds only random negatives, so the
    # near-identical positive pair must win the InfoNCE argmax
    assert float(aux["acc"]) == 1.0
    # further steps remain finite as real keys enter the queue
    for i in range(3):
        loss, state2, opt_state, aux = moco.moco_step(
            state2, apply, opt, opt_state, q, k, cfg
        )
        assert np.isfinite(float(loss))


def test_moco_shuffle_bn_roundtrip():
    x = jnp.arange(12.0).reshape(6, 2)
    shuffled, (perm, inv) = moco.shuffle_bn(x, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(shuffled[inv]), np.asarray(x))


def test_heatmap_localizes_sensitive_pixels():
    rng = np.random.default_rng(0)
    reps_real = rng.standard_normal((200, 6)).astype(np.float32)
    mu, prec = fit_real_gaussian(reps_real)

    def encode(x):
        # feature = mean of a specific 2x2 patch per dim → gradient localized
        return jnp.stack([x[:, 0, 0, 0], x[:, 1, 1, 0], x[:, 2, 2, 0],
                          x[:, 3, 3, 0], x[:, 0, 3, 0], x[:, 3, 0, 0]], axis=1)

    fn = make_heatmap_fn(encode, mu, prec)
    imgs = jnp.asarray(rng.standard_normal((2, 4, 4, 1)), jnp.float32)
    scores, maps = fn(imgs)
    assert scores.shape == (2,) and maps.shape == (2, 4, 4)
    m = np.asarray(maps[0])
    # saliency only on the 6 probed pixels
    assert m[0, 0] > 0 and m[1, 1] > 0
    assert m[0, 1] == 0 and m[2, 3] == 0

    over = overlay_heatmap(np.zeros((4, 4, 3), np.uint8), m)
    assert over.shape == (4, 4, 3) and over[..., 0].max() > 0


def test_cost_analysis_matmul_flops():
    a = jnp.zeros((128, 256))
    b = jnp.zeros((256, 512))
    got = flops(lambda a, b: a @ b, a, b)
    if got is None:
        pytest.skip("backend reports no cost analysis")
    assert got == pytest.approx(2 * 128 * 256 * 512, rel=0.1)
