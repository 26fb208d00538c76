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
    """Hand-constructed bright-square cascade weights — now shipped in the
    package (shared with the end-to-end embed bench); the golden tests below
    still pin their behavior."""
    return mtcnn.brightness_cascade_params()


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


def test_extract_embeddings_streaming_matches_folder_path(tmp_path):
    """The streaming e2e extractor (decode → batched detect → device
    crop+embed, fixed-size cross-folder batches) must agree with the
    per-folder reference path: same missing-face set, near-identical
    embeddings (device bilinear crop vs host cv2 crop)."""
    from PIL import Image

    from faceposegenerator_tpu.core.precision import PARITY_POLICY
    from faceposegenerator_tpu.models import iresnet
    from faceposegenerator_tpu.pipelines.embed_extract import (
        extract_embeddings_streaming,
        make_arcface_embed_fn,
        make_crop_embed_fn,
    )

    rng = np.random.default_rng(0)
    src = tmp_path / "images"
    n_per, res = 3, 96
    for ident in range(3):
        d = src / f"{ident}"
        d.mkdir(parents=True)
        for i in range(n_per):
            img = np.full((res, res, 3), 20, np.uint8)
            if not (ident == 2 and i == 2):  # one face-less image
                s = 48
                y, x = rng.integers(4, res - s - 4, 2)
                img[y : y + s, x : x + s] = 255
            Image.fromarray(img).save(d / f"{i}.png")

    detector = mtcnn.MTCNN(params=mtcnn.brightness_cascade_params())
    cfg = iresnet.config_for("r18", num_features=64)
    params, state = iresnet.init(jax.random.key(0), cfg)
    embed_fn = make_arcface_embed_fn(params, state, cfg, PARITY_POLICY)
    crop_embed = make_crop_embed_fn(params, state, cfg, PARITY_POLICY)

    from faceposegenerator_tpu.pipelines.embed_extract import extract_folder_embeddings

    out_a = tmp_path / "ref"
    out_b = tmp_path / "stream"
    ra = extract_folder_embeddings(str(src), str(out_a), embed_fn, detector=detector)
    rb = extract_embeddings_streaming(
        str(src), str(out_b), crop_embed, detector, batch_size=4, use_native=False
    )
    assert ra["files_without_faces"] == rb["files_without_faces"] == ["2/2.png"]

    import os as _os

    for ident in ("0", "1", "2"):
        files_a = sorted(_os.listdir(out_a / ident))
        files_b = sorted(_os.listdir(out_b / ident))
        assert files_a == files_b
        for f in files_a:
            ea = np.load(out_a / ident / f)
            eb = np.load(out_b / ident / f)
            # device bilinear box-sampling vs cv2 integer-crop+resize differ
            # at box edges; random-weight r18 amplifies that — the real
            # contract is "same faces found, same embedding up to crop
            # semantics" (cosine ≈ 0.97+ here)
            cos = float(ea @ eb / (np.linalg.norm(ea) * np.linalg.norm(eb)))
            assert cos > 0.90, (ident, f, cos)


def test_extract_streaming_pads_tail_batch_one_program(tmp_path):
    """5 images with batch_size=4: the tail batch is padded, every real
    image still gets exactly one embedding, padded slots are discarded."""
    from PIL import Image

    from faceposegenerator_tpu.pipelines.embed_extract import (
        extract_embeddings_streaming,
    )

    src = tmp_path / "images" / "0"
    src.mkdir(parents=True)
    for i in range(5):
        img = np.full((64, 64, 3), 20, np.uint8)
        img[8:56, 8:56] = 255
        Image.fromarray(img).save(src / f"{i}.png")

    detector = mtcnn.MTCNN(params=mtcnn.brightness_cascade_params())
    calls = []

    def fake_crop_embed(imgs, boxes):
        calls.append(np.asarray(imgs).shape)
        return np.ones((imgs.shape[0], 8), np.float32)

    out = tmp_path / "out"
    r = extract_embeddings_streaming(
        str(tmp_path / "images"), str(out), fake_crop_embed, detector,
        batch_size=4, use_native=False,
    )
    assert r["files_without_faces"] == []
    assert sorted(s[0] for s in calls) == [4, 4]  # both batches padded/full
    import os as _os

    assert sorted(_os.listdir(out / "0")) == [f"{i}.npy" for i in range(5)]
