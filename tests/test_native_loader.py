"""Native C++ data-loader core (`faceposegenerator_tpu/native/loader.cpp`).

Owns the layer the reference rides mxnet native code for — RecordIO batch
extraction (`FR_training/utils/dataset.py:73-120`) and JPEG decode
(`FR_training/utils/verification.py:246-288`). Oracles: the pure-Python
reader (`data/recordio.py`) for record parsing, PIL for JPEG decode, and a
numpy bilinear reference for the fused resize+normalize.
"""

import io
import os

import numpy as np
import pytest

from faceposegenerator_tpu import native
from faceposegenerator_tpu.data import recordio

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native loader unavailable: {native.build_error()}"
)


def _jpeg_bytes(rng, w, h, quality=95):
    from PIL import Image

    arr = rng.integers(0, 256, (h, w, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


@pytest.fixture(scope="module")
def rec_dataset(tmp_path_factory):
    """Synthetic insightface-layout .rec/.idx: meta record 0 + 12 images."""
    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("rec")
    rec, idx = str(d / "train.rec"), str(d / "train.idx")
    records = [(np.asarray([1.0, 5.0], np.float32), b"")]  # meta record
    sizes = [(112, 112)] * 8 + [(96, 130), (130, 96), (112, 112), (200, 200)]
    for i, (w, h) in enumerate(sizes):
        records.append((np.asarray([float(i % 5)], np.float32), _jpeg_bytes(rng, w, h)))
    recordio.write_records(rec, idx, records)
    return rec, idx, records


def test_read_idx_matches_python(rec_dataset):
    rec, idx, _ = rec_dataset
    mod = native.load()
    kb, ob = mod.read_idx(idx)
    keys = np.frombuffer(kb, np.int64)
    offs = np.frombuffer(ob, np.int64)
    py = recordio.read_idx(idx)
    assert list(keys) == sorted(py)
    assert [py[k] for k in keys] == list(offs)


def test_read_records_matches_python(rec_dataset):
    rec, idx, records = rec_dataset
    mod = native.load()
    py_idx = recordio.read_idx(idx)
    offsets = [py_idx[k] for k in sorted(py_idx)]
    out = mod.read_records(rec, offsets)
    assert len(out) == len(records)
    py_records = list(recordio.iter_records(rec))
    for (lab_b, payload), (py_lab, py_payload) in zip(out, py_records):
        np.testing.assert_array_equal(np.frombuffer(lab_b, np.float32), py_lab)
        assert payload == py_payload


def test_decode_rgb_matches_pil(rec_dataset):
    """libjpeg decode must agree with PIL (both libjpeg-turbo) to ≤1 LSB."""
    from PIL import Image

    _, _, records = rec_dataset
    mod = native.load()
    for _, payload in records[1:4]:
        rgb, w, h = mod.decode_rgb(payload)
        got = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
        ref = np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
        assert got.shape == ref.shape
        assert np.max(np.abs(got.astype(np.int16) - ref.astype(np.int16))) <= 1


def _np_bilinear(img, size):
    """Pixel-center-aligned bilinear (cv2.INTER_LINEAR, no antialias)."""
    h, w = img.shape[:2]
    fy = np.clip((np.arange(size) + 0.5) * (h / size) - 0.5, 0, None)
    fx = np.clip((np.arange(size) + 0.5) * (w / size) - 0.5, 0, None)
    y0 = np.clip(fy.astype(int), 0, h - 2)
    x0 = np.clip(fx.astype(int), 0, w - 2)
    wy = (fy - y0)[:, None, None]
    wx = (fx - x0)[None, :, None]
    a = img[y0][:, x0].astype(np.float32)
    b = img[y0][:, x0 + 1].astype(np.float32)
    c = img[y0 + 1][:, x0].astype(np.float32)
    d = img[y0 + 1][:, x0 + 1].astype(np.float32)
    return (a * (1 - wx) + b * wx) * (1 - wy) + (c * (1 - wx) + d * wx) * wy


def test_decode_batch_identity_and_resize(rec_dataset):
    """decode_batch = decode → bilinear resize → (x/255-0.5)/0.5, NHWC fp32."""
    from PIL import Image

    _, _, records = rec_dataset
    mod = native.load()
    payloads = [p for _, p in records[1:]]
    out = np.empty((len(payloads), 112, 112, 3), np.float32)
    mod.decode_batch(payloads, out, 112, 4)
    for i, payload in enumerate(payloads):
        ref = np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
        if ref.shape[:2] != (112, 112):
            ref_f = _np_bilinear(ref, 112)
        else:
            ref_f = ref.astype(np.float32)
        expect = (ref_f / 255.0 - 0.5) / 0.5
        np.testing.assert_allclose(out[i], expect, atol=2 / 255.0)


def test_decode_batch_corrupt_raises(rec_dataset):
    mod = native.load()
    out = np.empty((1, 112, 112, 3), np.float32)
    with pytest.raises(ValueError, match="JPEG decode failed"):
        mod.decode_batch([b"not a jpeg"], out, 112, 1)


def test_mxfacedataset_native_batches_match_pil(tmp_path):
    """The dataset's native batch path must agree with the PIL item path.

    All records pre-sized to 112 (the insightface layout — resize is the
    identity), so decode+normalize must agree to JPEG-decoder LSB wobble;
    resize semantics are covered separately against the numpy oracle (PIL
    antialiases downscales, the native path is plain bilinear by design)."""
    rng = np.random.default_rng(4)
    rec, idx = str(tmp_path / "t.rec"), str(tmp_path / "t.idx")
    records = [(np.asarray([0.0, 6.0], np.float32), b"")] + [
        (np.asarray([float(i % 3)], np.float32), _jpeg_bytes(rng, 112, 112))
        for i in range(12)
    ]
    recordio.write_records(rec, idx, records)
    ds_native = recordio.MXFaceDataset(rec, idx, use_native=True)
    ds_py = recordio.MXFaceDataset(rec, idx, use_native=False)
    assert ds_native._native is not None and ds_py._native is None
    assert len(ds_native) == len(ds_py) == 12
    n_batches = 0
    for bn, bp in zip(
        ds_native.batches(4, shuffle=True, seed=3), ds_py.batches(4, shuffle=True, seed=3)
    ):
        np.testing.assert_array_equal(bn["labels"], bp["labels"])
        np.testing.assert_allclose(bn["images"], bp["images"], atol=1.5 / 255.0)
        n_batches += 1
    assert n_batches == 3


def test_native_throughput_smoke(rec_dataset):
    """Not a perf assertion (1-core CI host) — just that a larger
    multi-threaded decode round-trips without corruption."""
    rng = np.random.default_rng(7)
    payloads = [_jpeg_bytes(rng, 112, 112) for _ in range(64)]
    mod = native.load()
    out = np.empty((64, 112, 112, 3), np.float32)
    mod.decode_batch(payloads, out, 112, 8)
    assert np.isfinite(out).all() and out.min() >= -1.0 and out.max() <= 1.0


def test_batches_fall_back_to_pil_for_non_jpeg_payloads(tmp_path):
    """RecordIO payloads aren't always JPEG (mxnet accepts PNG too): the
    native batch path must fall back to the per-item PIL decode for batches
    libjpeg rejects, not raise."""
    from PIL import Image

    rng = np.random.default_rng(11)
    rec, idx = str(tmp_path / "p.rec"), str(tmp_path / "p.idx")

    def png_bytes(w, h):
        buf = io.BytesIO()
        Image.fromarray(rng.integers(0, 256, (h, w, 3), np.uint8)).save(buf, "PNG")
        return buf.getvalue()

    records = [(np.asarray([0.0, 3.0], np.float32), b"")] + [
        (np.asarray([float(i)], np.float32), png_bytes(112, 112)) for i in range(4)
    ]
    recordio.write_records(rec, idx, records)
    ds = recordio.MXFaceDataset(rec, idx, use_native=True)
    assert ds._native is not None
    batches = list(ds.batches(2, shuffle=False))
    assert len(batches) == 2
    for b in batches:
        assert b["images"].shape == (2, 112, 112, 3)
        assert np.isfinite(b["images"]).all()
    np.testing.assert_array_equal(
        np.concatenate([b["labels"] for b in batches]), [0, 1, 2, 3]
    )


@pytest.mark.skipif(
    not native.available(), reason=f"native loader unavailable: {native.build_error()}"
)
def test_write_png_batch_lossless_roundtrip(tmp_path):
    """The stored-deflate PNG writer must emit spec-valid PNGs that decode
    back to the EXACT input pixels (lossless), including non-square."""
    from PIL import Image

    mod = native.load()
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (3, 40, 56, 3), np.uint8)
    paths = [str(tmp_path / f"{i}.png") for i in range(3)]
    mod.write_png_batch(np.ascontiguousarray(imgs), 40, 56, paths, 2)
    for i, p in enumerate(paths):
        back = np.asarray(Image.open(p))
        np.testing.assert_array_equal(back, imgs[i])
    # shape mismatch rejected
    with pytest.raises(ValueError):
        mod.write_png_batch(np.ascontiguousarray(imgs), 41, 56, paths, 2)
