"""Data layer + pipeline driver tests: alignment math, DreamBooth dataset
collate, MTCNN nets/cascade plumbing, embed extraction, prompt sweep."""

import json
import os

import jax
import numpy as np
import pytest

from faceposegenerator_tpu.data import align
from faceposegenerator_tpu.data.dreambooth import DreamBoothDataset
from faceposegenerator_tpu.models import mtcnn
from faceposegenerator_tpu.pipelines.embed_extract import extract_folder_embeddings
from faceposegenerator_tpu.pipelines import sweep


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(0)
    src = rng.uniform(0, 100, (5, 2))
    theta = 0.3
    R = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    dst = 1.7 * src @ R.T + np.array([10.0, -5.0])
    m = align.umeyama_similarity(src, dst)
    mapped = src @ m[:, :2].T + m[:, 2]
    np.testing.assert_allclose(mapped, dst, atol=1e-4)


def test_estimate_norm_and_crop():
    # landmarks exactly at the template → identity-ish warp
    img = np.random.default_rng(1).integers(0, 255, (112, 112, 3), np.uint8)
    m = align.estimate_norm(align.ARCFACE_TEMPLATE_112)
    np.testing.assert_allclose(m, np.array([[1, 0, 0], [0, 1, 0]], np.float32), atol=1e-4)
    out = align.norm_crop(img, align.ARCFACE_TEMPLATE_112)
    assert out.shape == (112, 112, 3)
    np.testing.assert_allclose(out, img, atol=1)


def test_pad_and_bbox_crop():
    img = np.ones((100, 80, 3), np.uint8) * 200
    padded, px, py = align.pad_image(img, 0.5)
    assert padded.shape == (200, 160, 3) and px == 40 and py == 50
    crop = align.bbox_crop_resize(img, np.array([10, 10, 50, 50]), 112)
    assert crop.shape == (112, 112, 3)


def _make_image_tree(tmp_path, n_inst=3, n_class=4, res=96):
    from PIL import Image

    inst = tmp_path / "images" / "id1"
    cls = tmp_path / "class"
    emb = tmp_path / "ArcFace_embeds" / "id1"
    for d in (inst, cls, emb):
        d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n_inst):
        Image.fromarray(rng.integers(0, 255, (res + 10, res, 3), np.uint8)).save(
            inst / f"img_{i}.jpg"
        )
        np.save(emb / f"img_{i}.npy", rng.standard_normal(512).astype(np.float32))
    for i in range(n_class):
        Image.fromarray(rng.integers(0, 255, (res, res + 20, 3), np.uint8)).save(
            cls / f"c_{i}.jpg"
        )
    return str(inst), str(cls), str(emb)


def test_dreambooth_dataset_collate(tmp_path):
    inst, cls, emb = _make_image_tree(tmp_path)
    ids = np.arange(77, dtype=np.int32)
    ds = DreamBoothDataset(
        inst, ids, class_dir=cls, class_ids=ids + 1, embeds_dir=emb, resolution=64
    )
    assert len(ds) == 4  # max(3 instance, 4 class)
    batches = list(ds.batches(batch_size=2))
    assert len(batches) == 2
    b = batches[0]
    assert b["pixel_values"].shape == (4, 64, 64, 3)  # [2 inst; 2 class]
    assert b["input_ids"].shape == (4, 77)
    assert b["gt_embeds"].shape == (4, 512)
    assert b["pixel_values"].min() >= -1 and b["pixel_values"].max() <= 1
    # instance halves carry real (nonzero) embeds; class half zeros fallback
    assert np.abs(b["gt_embeds"][:2]).max() > 0
    np.testing.assert_allclose(b["gt_embeds"][2:], 0)


def test_mtcnn_net_shapes():
    params = mtcnn.init(jax.random.key(0))
    prob, reg = mtcnn.pnet_apply(params["pnet"], np.zeros((1, 48, 64, 3), np.float32))
    # pnet: conv(3)→pool2→conv(3)→conv(3): 48→46→23→21→19 ; 64→62→31→29→27
    assert prob.shape == (1, 19, 27) and reg.shape == (1, 19, 27, 4)
    prob, reg = mtcnn.rnet_apply(params["rnet"], np.zeros((5, 24, 24, 3), np.float32))
    assert prob.shape == (5,) and reg.shape == (5, 4)
    prob, reg, lmk = mtcnn.onet_apply(params["onet"], np.zeros((5, 48, 48, 3), np.float32))
    assert prob.shape == (5,) and reg.shape == (5, 4) and lmk.shape == (5, 10)


def test_mtcnn_cascade_runs_random_weights():
    det = mtcnn.MTCNN()
    img = np.random.default_rng(0).integers(0, 255, (160, 120, 3), np.uint8)
    out = det.detect(img, landmarks=True)
    assert len(out) == 3  # (boxes, probs, landmarks) — possibly all None


def test_mtcnn_state_dict_conversion_shapes():
    # build a fake facenet-pytorch state dict with correct shapes
    sd = {}

    def add_conv(prefix, cout, cin, k):
        sd[f"{prefix}.weight"] = np.zeros((cout, cin, k, k), np.float32)
        sd[f"{prefix}.bias"] = np.zeros((cout,), np.float32)

    def add_fc(prefix, cout, cin):
        sd[f"{prefix}.weight"] = np.zeros((cout, cin), np.float32)
        sd[f"{prefix}.bias"] = np.zeros((cout,), np.float32)

    def add_prelu(prefix, c):
        sd[f"{prefix}.weight"] = np.zeros((c,), np.float32)

    add_conv("pnet.conv1", 10, 3, 3); add_prelu("pnet.prelu1", 10)
    add_conv("pnet.conv2", 16, 10, 3); add_prelu("pnet.prelu2", 16)
    add_conv("pnet.conv3", 32, 16, 3); add_prelu("pnet.prelu3", 32)
    add_conv("pnet.conv4_1", 2, 32, 1); add_conv("pnet.conv4_2", 4, 32, 1)
    add_conv("rnet.conv1", 28, 3, 3); add_prelu("rnet.prelu1", 28)
    add_conv("rnet.conv2", 48, 28, 3); add_prelu("rnet.prelu2", 48)
    add_conv("rnet.conv3", 64, 48, 2); add_prelu("rnet.prelu3", 64)
    add_fc("rnet.dense4", 128, 576); add_prelu("rnet.prelu4", 128)
    add_fc("rnet.dense5_1", 2, 128); add_fc("rnet.dense5_2", 4, 128)
    add_conv("onet.conv1", 32, 3, 3); add_prelu("onet.prelu1", 32)
    add_conv("onet.conv2", 64, 32, 3); add_prelu("onet.prelu2", 64)
    add_conv("onet.conv3", 64, 64, 3); add_prelu("onet.prelu3", 64)
    add_conv("onet.conv4", 128, 64, 2); add_prelu("onet.prelu4", 128)
    add_fc("onet.dense5", 256, 1152); add_prelu("onet.prelu5", 256)
    add_fc("onet.dense6_1", 2, 256); add_fc("onet.dense6_2", 4, 256)
    add_fc("onet.dense6_3", 10, 256)

    params = mtcnn.convert_mtcnn_state_dict(sd)
    ref = mtcnn.init(jax.random.key(0))
    ref_shapes = jax.tree.map(lambda x: x.shape, ref)
    got_shapes = jax.tree.map(lambda x: x.shape, params)
    assert ref_shapes == got_shapes


def test_extract_folder_embeddings(tmp_path):
    from PIL import Image

    root = tmp_path / "FACE" / "images"
    (root / "id1").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (120, 120, 3), np.uint8)).save(
            root / "id1" / f"f_{i}.jpg"
        )
    out = tmp_path / "FACE" / "ArcFace_embeds"

    def embed_fn(x):
        return x.reshape(x.shape[0], -1)[:, :16]

    res = extract_folder_embeddings(str(root), str(out), embed_fn, detector=None)
    assert res["files_without_faces"] == []
    files = sorted(os.listdir(out / "id1"))
    assert files == ["f_0.npy", "f_1.npy", "f_2.npy"]  # per-image contract
    assert np.load(out / "id1" / "f_0.npy").shape == (16,)
    assert (out / "files_without_faces.json").exists()


def test_prompt_sweep_builders():
    combos = sweep.build_prompt_combinations(add_background=True)
    assert len(combos) == 21  # "" + 10 backgrounds × 2
    prompts = sweep.build_prompts("id_7", {"id_7": "male"}, combos, seed=0)
    assert len(prompts) == 21
    assert all("sks person" in p for p in prompts)
    assert any("male" in p for p in prompts)
    assert any("side-portrait" in p for p in prompts)  # pose coin-flip
    assert any("background" in p for p in prompts)
    # deterministic given seed
    assert prompts == sweep.build_prompts("id_7", {"id_7": "male"}, combos, seed=0)


def test_save_image_grid(tmp_path):
    imgs = np.random.default_rng(0).uniform(0, 1, (6, 8, 8, 3)).astype(np.float32)
    path = str(tmp_path / "grid.png")
    sweep.save_image_grid(imgs, path, per_row=3)
    from PIL import Image

    g = Image.open(path)
    assert g.size == (24, 16)
