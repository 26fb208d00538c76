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
