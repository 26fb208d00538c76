"""dgm-eval CLI equivalent + FR driver end-to-end on tiny data."""

import io
import json
import os
import pickle

import jax
import numpy as np
import pytest

from faceposegenerator_tpu.evaluation import dgm
from faceposegenerator_tpu.training import fr, fr_driver
from faceposegenerator_tpu.data.fr_dataset import FlatDirDataset
from faceposegenerator_tpu.core.precision import PARITY_POLICY


def _image_dir(tmp_path, name, n=12, cls_sub=False, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    root = tmp_path / name
    for i in range(n):
        d = root / (str(i % 3) if cls_sub else "")
        d.mkdir(parents=True, exist_ok=True)
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(d / f"{i}.png")
    return str(root)


def test_dgm_main_end_to_end(tmp_path):
    real = _image_dir(tmp_path, "real", cls_sub=True, seed=0)
    gen = _image_dir(tmp_path, "gen", cls_sub=True, seed=1)
    out = str(tmp_path / "out")
    scores = dgm.main(
        [real, gen, "--model", "pixel", "--metrics", "fd", "kd", "prdc", "vendi", "authpct", "sw",
         "--nsample", "100", "--output_dir", out]
    )
    s = scores["gen"]
    for key in ("fd", "kd_value", "precision", "recall", "density", "coverage", "vendi", "authpct", "sw_approx"):
        assert key in s, key
        assert np.isfinite(s[key])
    assert os.path.exists(os.path.join(out, "scores_gen.json"))
    assert os.path.exists(os.path.join(out, "aggregate.json"))
    # representation caching: second run hits the cache (same result)
    scores2 = dgm.main(
        [real, gen, "--model", "pixel", "--metrics", "fd", "--nsample", "100",
         "--output_dir", out]
    )
    assert scores2["gen"]["fd"] == pytest.approx(s["fd"], rel=1e-6)


def _toy_bin(n_pairs=8, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.integers(0, 255, (2 * n_pairs, 112, 112, 3), np.uint8)
    issame = (np.arange(n_pairs) % 2 == 0)
    return imgs, issame


def test_fr_driver_train_and_test(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    data_root = tmp_path / "fr_data"
    data_root.mkdir()
    for label in range(3):
        for i in range(4):
            Image.fromarray(rng.integers(0, 255, (112, 112, 3), np.uint8)).save(
                data_root / f"{label}_{i}.jpg"
            )
    cfg = fr.FRConfig(
        network="iresnet18", embedding_size=32, dropout=0.0, batch_size=4,
        loss="CosFace", num_epochs=2, early_stop_patience=99,
    )
    dataset = FlatDirDataset(str(data_root))
    out = str(tmp_path / "run")
    bins = {"lfw": _toy_bin()}
    res = fr_driver.train_fr_run(
        cfg, dataset, out, val_bins=bins, policy=PARITY_POLICY, max_steps_per_epoch=2
    )
    assert not res["skipped"]
    assert os.path.exists(os.path.join(out, "best_backbone.npz"))
    assert os.path.exists(os.path.join(out, "fr_config.json"))
    assert len(res["history"]) == 2

    # skip-if-done
    res2 = fr_driver.train_fr_run(cfg, dataset, out, val_bins=bins, policy=PARITY_POLICY)
    assert res2["skipped"]

    # test_FR equivalent
    cfg_test = cfg.replace(num_classes=dataset.num_classes)
    report = fr_driver.test_fr_run(
        cfg_test, os.path.join(out, "best_backbone.npz"), bins,
        output_json=os.path.join(out, "test_results.json"), policy=PARITY_POLICY,
    )
    assert "lfw" in report and "average_accuracy" in report
    assert os.path.exists(os.path.join(out, "test_results.json"))
    saved = json.load(open(os.path.join(out, "test_results.json")))
    assert saved["lfw"]["accuracy"] == pytest.approx(report["lfw"]["accuracy"])


def test_dgm_heatmaps_grid(tmp_path):
    """--heatmaps mechanism: _write_gradcam_grid samples generated images,
    computes leave-one-out FD GradCAMs through a tap-capable encoder, and
    writes one overlay grid PNG (reference `__main__.py:358-364`)."""
    import jax
    from PIL import Image

    from faceposegenerator_tpu.evaluation.dgm import _write_gradcam_grid
    from faceposegenerator_tpu.evaluation.heatmaps import make_dinov2_gradcam_encoder
    from faceposegenerator_tpu.models import dinov2

    rng = np.random.default_rng(0)
    gen = tmp_path / "gen"
    gen.mkdir()
    for i in range(6):
        Image.fromarray(rng.integers(0, 255, (56, 56, 3), np.uint8)).save(
            gen / f"{i}.png"
        )

    cfg = dinov2.DINOv2Config(
        hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
        patch_size=14,
    )
    params = dinov2.init(jax.random.key(0), cfg)

    class Enc:
        gradcam_encode = staticmethod(make_dinov2_gradcam_encoder(params, cfg))

        @staticmethod
        def gradcam_preprocess(batch):
            return np.asarray(batch, np.float32) / 255.0  # already 56²

    reps_real = rng.standard_normal((30, 32))
    reps_gen = rng.standard_normal((6, 32))
    out = tmp_path / "heat.png"
    _write_gradcam_grid(str(gen), Enc, reps_real, reps_gen, str(out),
                        nsample=100, seed=0, count=4)
    assert out.exists()
    grid = np.asarray(Image.open(out))
    assert grid.shape[2] == 3 and grid.size > 0
