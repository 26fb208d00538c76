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


import jax.numpy as jnp


def _golden_mtcnn_params():
    """Hand-constructed weights that fire on a BRIGHT SQUARE: P-Net channel 0
    averages brightness through the stack and the face logit is 50·feat−5
    (prob≈1 on the square, ≈0.007 on black); R-Net/O-Net always pass with
    zero regression and fixed landmark fractions. Pins the cascade logic
    (pyramid, NMS, regression, squaring, landmark mapping) before real
    facenet-pytorch weights are available."""

    def conv(kh, kw, cin, cout, w=None, b=None):
        return {
            "w": jnp.zeros((kh, kw, cin, cout)) if w is None else w,
            "b": jnp.zeros((cout,)) if b is None else b,
        }

    def fc(cout, cin, b=None):
        return {"w": jnp.zeros((cout, cin)), "b": jnp.zeros((cout,)) if b is None else b}

    w1 = np.zeros((3, 3, 3, 10), np.float32)
    w1[:, :, :, 0] = 1.0 / 27.0  # channel 0 = brightness average
    w2 = np.zeros((3, 3, 10, 16), np.float32)
    w2[:, :, 0, 0] = 1.0 / 9.0
    w3 = np.zeros((3, 3, 16, 32), np.float32)
    w3[:, :, 0, 0] = 1.0 / 9.0
    wcls = np.zeros((1, 1, 32, 2), np.float32)
    wcls[0, 0, 0, 1] = 50.0  # with bias -45: fires only when the whole
    # 12x12 receptive field is bright (feat≈1), not on partial overlaps
    pnet = {
        "conv1": conv(3, 3, 3, 10, jnp.asarray(w1)), "prelu1": jnp.zeros((10,)),
        "conv2": conv(3, 3, 10, 16, jnp.asarray(w2)), "prelu2": jnp.zeros((16,)),
        "conv3": conv(3, 3, 16, 32, jnp.asarray(w3)), "prelu3": jnp.zeros((32,)),
        "cls": conv(1, 1, 32, 2, jnp.asarray(wcls), jnp.asarray([0.0, -45.0])),
        "reg": conv(1, 1, 32, 4),
    }
    rnet = {
        "conv1": conv(3, 3, 3, 28), "prelu1": jnp.zeros((28,)),
        "conv2": conv(3, 3, 28, 48), "prelu2": jnp.zeros((48,)),
        "conv3": conv(2, 2, 48, 64), "prelu3": jnp.zeros((64,)),
        "fc": fc(128, 64 * 3 * 3), "prelu4": jnp.zeros((128,)),
        "cls": fc(2, 128, jnp.asarray([0.0, 5.0])),  # always pass
        "reg": fc(4, 128),
    }
    lmk_bias = jnp.asarray([0.3, 0.7, 0.5, 0.3, 0.7, 0.3, 0.3, 0.5, 0.7, 0.7])
    onet = {
        "conv1": conv(3, 3, 3, 32), "prelu1": jnp.zeros((32,)),
        "conv2": conv(3, 3, 32, 64), "prelu2": jnp.zeros((64,)),
        "conv3": conv(3, 3, 64, 64), "prelu3": jnp.zeros((64,)),
        "conv4": conv(2, 2, 64, 128), "prelu4": jnp.zeros((128,)),
        "fc": fc(256, 128 * 3 * 3), "prelu5": jnp.zeros((256,)),
        "cls": fc(2, 256, jnp.asarray([0.0, 5.0])),
        "reg": fc(4, 256),
        "lmk": fc(10, 256, lmk_bias),
    }
    return {"pnet": pnet, "rnet": rnet, "onet": onet}


def test_mtcnn_cascade_golden_bright_square():
    det = mtcnn.MTCNN(params=_golden_mtcnn_params())
    img = np.zeros((96, 96, 3), np.float32)
    img[24:72, 24:72] = 255.0  # the "face"

    boxes, probs, points = det.detect(img, landmarks=True)
    assert boxes is not None and len(boxes) >= 1
    # top detection centers on the bright square
    x0, y0, x1, y1 = boxes[0]
    cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
    assert 24 <= cx <= 72 and 24 <= cy <= 72, boxes[0]
    assert probs[0] > 0.9
    # landmarks at the configured fractions, inside the box
    pts = points[0]
    assert pts.shape == (5, 2)
    assert (pts[:, 0] >= x0 - 1).all() and (pts[:, 0] <= x1 + 1).all()
    np.testing.assert_allclose(pts[2, 0], x0 + 0.5 * (x1 - x0), rtol=1e-5)

    # an all-black image finds nothing
    none_box, none_prob = det.detect(np.zeros((96, 96, 3), np.float32))
    assert none_box is None and none_prob is None


def test_mtcnn_detect_batch_matches_single():
    """detect_batch shares the pyramid and batches the net calls; results
    must equal per-image detect, including None for face-less images
    (reference batch contract, extract_ArcFace_embeds.py:42-52)."""
    det = mtcnn.MTCNN(params=_golden_mtcnn_params())
    face = np.zeros((96, 96, 3), np.float32)
    face[24:72, 24:72] = 255.0
    face2 = np.zeros((96, 96, 3), np.float32)
    face2[8:40, 40:88] = 255.0
    blank = np.zeros((96, 96, 3), np.float32)

    single = [det.detect(im, landmarks=True) for im in (face, face2, blank)]
    batch = det.detect_batch(np.stack([face, face2, blank]), landmarks=True)

    for b in range(3):
        sb, sp, sl = single[b]
        bb, bp, bl = batch[0][b], batch[1][b], batch[2][b]
        if sb is None:
            assert bb is None and bp is None and bl is None
        else:
            np.testing.assert_allclose(bb, sb, rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(bp, sp, rtol=1e-5)
            np.testing.assert_allclose(bl, sl, rtol=1e-5, atol=1e-5)
