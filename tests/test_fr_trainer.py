"""FR train-step tests: loss decreases on a toy problem, BN/EMA state moves,
plateau scheduler semantics, sharded execution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceposegenerator_tpu.core.mesh import make_mesh, shard_batch, replicate
from faceposegenerator_tpu.core.precision import PARITY_POLICY
from faceposegenerator_tpu.training import fr


def _tiny_cfg(**kw):
    base = dict(
        network="iresnet18", embedding_size=32, dropout=0.0, batch_size=8,
        num_classes=4, loss="AdaFace",
    )
    base.update(kw)
    return fr.FRConfig(**base)


def _batch(n=8, n_classes=4, seed=0):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, n_classes, n)
    # images: class-dependent mean + noise so the problem is learnable
    means = rng.standard_normal((n_classes, 1, 1, 3)).astype(np.float32)
    imgs = means[labels] + 0.1 * rng.standard_normal((n, 112, 112, 3)).astype(np.float32)
    return {"images": jnp.asarray(imgs), "labels": jnp.asarray(labels)}


@pytest.mark.parametrize("loss", ["AdaFace", "ArcFace", "CosFace", "ElasticCosFace"])
def test_fr_step_runs_all_heads(loss):
    cfg = _tiny_cfg(loss=loss)
    params, state = fr.init_train_state(jax.random.key(0), cfg)
    opt = fr.make_optimizer(cfg)
    opt_state = opt.init(params)
    step = fr.make_train_step(cfg, opt, policy=PARITY_POLICY, donate=False)
    p2, s2, o2, m = step(params, state, opt_state, _batch(), jax.random.key(1))
    assert np.isfinite(float(m["loss"]))
    # BN running stats updated
    assert not np.allclose(
        np.asarray(s2["bn"]["bn1"]["mean"]), np.asarray(state["bn"]["bn1"]["mean"])
    )
    if loss == "AdaFace":
        assert float(s2["adaface"]["batch_mean"]) != 20.0


def test_fr_loss_decreases():
    cfg = _tiny_cfg(loss="CosFace")
    params, state = fr.init_train_state(jax.random.key(0), cfg)
    opt = fr.make_optimizer(cfg)
    opt_state = opt.init(params)
    step = fr.make_train_step(cfg, opt, policy=PARITY_POLICY, donate=False)
    batch = _batch()
    first = None
    for i in range(8):
        params, state, opt_state, m = step(params, state, opt_state, batch, jax.random.key(i))
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < first


def test_plateau_scheduler():
    cfg = _tiny_cfg(plateau_patience=1)
    sched = fr.PlateauScheduler(cfg)
    assert sched.update(0.5) == 1.0  # improvement
    assert sched.update(0.4) == 1.0  # 1 bad epoch (patience 1)
    assert sched.update(0.4) == pytest.approx(0.1)  # 2nd bad → decay
    assert sched.update(0.9) == pytest.approx(0.1)  # improvement, scale kept


def test_fr_step_sharded():
    cfg = _tiny_cfg(loss="ArcFace")
    params, state = fr.init_train_state(jax.random.key(0), cfg)
    opt = fr.make_optimizer(cfg)
    opt_state = opt.init(params)
    step = fr.make_train_step(cfg, opt, policy=PARITY_POLICY, donate=False)
    mesh = make_mesh()
    batch = shard_batch(mesh, _batch(n=16))
    params = replicate(mesh, params)
    state = replicate(mesh, state)
    opt_state = replicate(mesh, opt_state)
    p2, s2, o2, m = step(params, state, opt_state, batch, jax.random.key(1))
    assert np.isfinite(float(m["loss"]))


def test_embed_fn_shapes():
    cfg = _tiny_cfg()
    params, state = fr.init_train_state(jax.random.key(0), cfg)
    embed = fr.make_embed_fn(cfg, params, state, policy=PARITY_POLICY)
    out = embed(jnp.zeros((2, 112, 112, 3)))
    assert out.shape == (2, 32)


def test_fr_driver_mesh_epoch_matches_single_device(tmp_path):
    """Epoch-level DP FR training through the driver: a 4-device mesh run
    with the sharded loader reproduces the 1-device run (same order_seed →
    same global batches)."""
    from PIL import Image

    from faceposegenerator_tpu.data.fr_dataset import FlatDirDataset
    from faceposegenerator_tpu.training import fr_driver

    rng = np.random.default_rng(0)
    root = tmp_path / "flat"
    root.mkdir()
    for label in range(4):
        for i in range(4):
            Image.fromarray(rng.integers(0, 255, (112, 112, 3), np.uint8)).save(
                root / f"{label}_{label}_{i}.jpg"
            )

    cfg = _tiny_cfg(batch_size=4, num_epochs=2, lr_schedule="step")

    def run(tag, mesh):
        ds = FlatDirDataset(str(root), image_size=112, seed=0)
        out = str(tmp_path / tag)
        r = fr_driver.train_fr_run(
            cfg, ds, out, val_bins=None, policy=PARITY_POLICY, seed=0, mesh=mesh,
        )
        best = np.load(out + "/best_backbone.npz")
        return r, best

    r4, best4 = run("mesh4", make_mesh(devices=jax.devices()[:4]))
    r1, best1 = run("mesh1", make_mesh(devices=jax.devices()[:1]))
    assert not r4["skipped"] and not r1["skipped"]
    # final backbone params agree to fp32 resharding tolerance
    keys = [k for k in best4.files if k.startswith("params")][:20]
    for k in keys:
        a, b = best4[k], best1[k]
        # absolute+relative: near-zero leaves (zero-init biases under weight
        # decay, ~1e-12) must not fail a pure relative criterion
        assert np.linalg.norm(a - b) < 5e-3 * np.linalg.norm(b) + 1e-6, k
