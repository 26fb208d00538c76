"""RecordIO round-trip + layout converter tests."""

import io
import os

import numpy as np

from faceposegenerator_tpu.data import recordio
from faceposegenerator_tpu.data.conditional import conditional_to_flat, flat_to_conditional


def _jpeg_bytes(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return buf.getvalue()


def test_recordio_roundtrip_and_dataset(tmp_path):
    rng = np.random.default_rng(0)
    records = [(np.asarray([0.0, 6.0], np.float32), b"")]  # meta record
    for i in range(6):
        label = float(i // 3)
        records.append(
            (np.asarray([label], np.float32), _jpeg_bytes(rng.integers(0, 255, (112, 112, 3), np.uint8)))
        )
    rec = str(tmp_path / "train.rec")
    idx = str(tmp_path / "train.idx")
    recordio.write_records(rec, idx, records)

    # low-level iteration sees all 7 records
    seen = list(recordio.iter_records(rec))
    assert len(seen) == 7
    np.testing.assert_allclose(seen[0][0], [0.0, 6.0])

    ds = recordio.MXFaceDataset(rec)
    assert ds.has_meta and len(ds) == 6
    img, label = ds[0]
    assert img.shape == (112, 112, 3) and -1 <= img.min() and img.max() <= 1
    labels = sorted(ds[i][1] for i in range(6))
    assert labels == [0, 0, 0, 1, 1, 1]
    batches = list(ds.batches(3, shuffle=False))
    assert len(batches) == 2 and batches[0]["images"].shape == (3, 112, 112, 3)


def test_layout_converters(tmp_path):
    from PIL import Image

    flat = tmp_path / "flat"
    flat.mkdir()
    rng = np.random.default_rng(0)
    for ident in ("3", "5"):
        for i in range(2):
            Image.fromarray(rng.integers(0, 255, (8, 8, 3), np.uint8)).save(
                flat / f"{ident}_{i}.jpg"
            )
    cond = str(tmp_path / "cond")
    counts = flat_to_conditional(str(flat), cond)
    assert counts == {"3": 2, "5": 2}
    assert sorted(os.listdir(cond)) == ["3", "5"]

    flat2 = str(tmp_path / "flat2")
    n = conditional_to_flat(cond, flat2)
    assert n == 4
    assert sorted(os.listdir(flat2)) == ["3_0.jpg", "3_1.jpg", "5_0.jpg", "5_1.jpg"]
