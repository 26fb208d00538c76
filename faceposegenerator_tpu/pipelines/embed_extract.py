"""ArcFace embedding extraction pipeline.

Behavioral rebuild of `extract_ArcFace_embeds.py` with the per-image
contract fixed (SURVEY.md §3.3: the reference batches MTCNN over an
identity folder but then embeds only the LAST crop and saves a single
`.pt` per folder, while the trainer expects per-image embeds at
`train_ID-Booth.py:271,326`). Here every image gets its own embedding:

  images/<id>/*.jpg → detect (MTCNN) → bbox crop → 112² → [-1,1] →
  IResNet-100 (batched on device) → ArcFace_embeds/<id>/<image>.npy

Detection failures are recorded in `files_without_faces.json`
(`extract_ArcFace_embeds.py:77-82`).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List

import numpy as np

from ..data.align import bbox_crop_resize, to_arcface_input
from ..data.dreambooth import list_images


def extract_folder_embeddings(
    images_root: str,
    output_root: str,
    embed_fn: Callable[[np.ndarray], np.ndarray],
    detector=None,
    batch_size: int = 32,
) -> Dict[str, List[str]]:
    """Process every identity subfolder of `images_root`.

    embed_fn: (B, 112, 112, 3) [-1,1] fp32 -> (B, 512) — a jitted ArcFace
    forward. detector: MTCNN-like `.detect(img)` or None (whole image).
    Returns {"files_without_faces": [...]} and writes per-image .npy files.
    """
    from PIL import Image

    os.makedirs(output_root, exist_ok=True)
    missing: List[str] = []

    for id_folder in sorted(os.listdir(images_root)):
        src = os.path.join(images_root, id_folder)
        if not os.path.isdir(src):
            continue
        dst = os.path.join(output_root, id_folder)
        os.makedirs(dst, exist_ok=True)
        names = list_images(src)
        imgs = [
            np.asarray(Image.open(os.path.join(src, name)).convert("RGB"))
            for name in names
        ]
        faces, face_names = [], []
        if detector is not None and imgs:
            # the reference stacks the whole identity folder into one detect
            # call (`extract_ArcFace_embeds.py:42-52`); use the batched
            # cascade when all images share a size, else fall back per-image
            boxes_list: List = []
            if hasattr(detector, "detect_batch") and len({im.shape for im in imgs}) == 1:
                boxes_list = detector.detect_batch(np.stack(imgs))[0]
            else:
                boxes_list = [detector.detect(im)[0] for im in imgs]
            for name, img, boxes in zip(names, imgs, boxes_list):
                if boxes is None or len(boxes) == 0:
                    missing.append(os.path.join(id_folder, name))
                    continue
                faces.append(bbox_crop_resize(img, boxes[0], 112))
                face_names.append(name)
        else:
            for name, img in zip(names, imgs):
                faces.append(
                    bbox_crop_resize(img, np.array([0, 0, img.shape[1], img.shape[0]]), 112)
                )
                face_names.append(name)

        # batched device embedding
        for start in range(0, len(faces), batch_size):
            chunk = np.stack(faces[start : start + batch_size])
            embs = np.asarray(embed_fn(to_arcface_input(chunk)))
            for j, name in enumerate(face_names[start : start + batch_size]):
                np.save(os.path.join(dst, os.path.splitext(name)[0] + ".npy"), embs[j])

    with open(os.path.join(output_root, "files_without_faces.json"), "w") as f:
        json.dump(missing, f, indent=2)
    return {"files_without_faces": missing}


def make_crop_embed_fn(params, state, cfg=None, policy=None):
    """Jitted (images [0,255] fp32 (B,H,W,3), boxes (B,4)) -> (B,512).

    The TPU-first embed hot path: bbox crop (differentiable bilinear
    `ops.image.crop_and_resize`, static shapes), ArcFace normalization and
    the IResNet forward run as ONE device program — no host per-image
    crop/resize (`extract_ArcFace_embeds.py:55-72` does all of that on
    host before the batched forward)."""
    import jax
    import jax.numpy as jnp

    from ..core.precision import DEFAULT_POLICY
    from ..models import iresnet
    from ..ops.image import crop_and_resize

    cfg = cfg or iresnet.IResNetConfig()
    policy = policy or DEFAULT_POLICY

    @jax.jit
    def crop_embed(imgs, boxes):
        crops = crop_and_resize(imgs.astype(jnp.float32), boxes, 112)
        x = (crops / 255.0 - 0.5) / 0.5
        e, _ = iresnet.apply(params, state, x, cfg, policy=policy, train=False)
        return e

    return crop_embed


def calibrate_embed_quant(params, state, images, cfg=None, policy=None, margin: float = 1.1):
    """Freeze STATIC activation scales onto a quantized IResNet from eager
    forwards over calibration `images` ((B,112,112,3) in [-1,1]; a list
    runs multiple batches).

    Textbook post-training static quantization — for a BN-stabilized CNN
    the activation ranges are data-stable, which is why static scales are
    the standard int8 deployment path for this model class. Measured on
    v5e (`perf/r3ao_queue.jsonl`): bs4096 embed 9867 img/s static vs 7268
    dynamic (+36%) vs 6358 bf16 (+55%) — the dynamic amax passes were the
    gap between int8's 2× MXU rate and its measured +14%.

    Returns the static params tree (input `params` is not modified)."""
    import jax.numpy as jnp

    from ..core.precision import DEFAULT_POLICY
    from ..models import iresnet
    from ..ops import quant as quant_ops

    cfg = cfg or iresnet.IResNetConfig()
    policy = policy or DEFAULT_POLICY
    batches = images if isinstance(images, (list, tuple)) else [images]
    with quant_ops.observe_act_scales() as calib:
        for x in batches:
            iresnet.apply(
                params, state, jnp.asarray(x), cfg, policy=policy, train=False
            )
    if not calib:
        raise ValueError("no quantized sites observed — quantize_iresnet first")
    return quant_ops.freeze_act_scales(params, calib, margin=margin)


def _decode_files_batch(paths: List[str], native_mod=None, expect_hw=None):
    """Decode JPEG/PNG files to one (B,H,W,3) [0,255] fp32 stack. JPEGs ride
    the native C++ thread-parallel decoder when available (decode_batch
    outputs [-1,1]; rescaled here); PIL otherwise."""
    from PIL import Image

    if (
        native_mod is not None
        and expect_hw is not None
        and expect_hw[0] == expect_hw[1]
        and all(p.lower().endswith((".jpg", ".jpeg")) for p in paths)
    ):
        payloads = [open(p, "rb").read() for p in paths]
        out = np.empty((len(paths), expect_hw[0], expect_hw[1], 3), np.float32)
        try:
            native_mod.decode_batch(payloads, out, expect_hw[0], 8)
            return out * 127.5 + 127.5
        except ValueError:
            pass  # odd payload → PIL below
    imgs = [np.asarray(Image.open(p).convert("RGB"), np.float32) for p in paths]
    return np.stack(imgs)


def extract_embeddings_streaming(
    images_root: str,
    output_root: str,
    crop_embed_fn: Callable,
    detector,
    batch_size: int = 64,
    use_native: bool = True,
) -> Dict[str, List[str]]:
    """End-to-end streaming extraction: decode → batched MTCNN detect →
    device crop+embed, with batch i+1's file decode overlapping batch i's
    detect/embed (ThreadPoolExecutor pipeline). Batches are FIXED SIZE and
    cross identity-folder boundaries — the device sees one program.

    All images must share one resolution (the aligned-dataset layout the
    reference extracts from). Writes per-image `.npy` embeds and
    `files_without_faces.json` like `extract_folder_embeddings`.
    """
    from concurrent.futures import ThreadPoolExecutor

    native_mod = None
    if use_native:
        from .. import native as native_pkg

        native_mod = native_pkg.load()

    os.makedirs(output_root, exist_ok=True)
    entries: List[tuple] = []  # (id_folder, name, path)
    for id_folder in sorted(os.listdir(images_root)):
        src = os.path.join(images_root, id_folder)
        if not os.path.isdir(src):
            continue
        os.makedirs(os.path.join(output_root, id_folder), exist_ok=True)
        for name in list_images(src):
            entries.append((id_folder, name, os.path.join(src, name)))

    missing: List[str] = []
    if not entries:
        with open(os.path.join(output_root, "files_without_faces.json"), "w") as f:
            json.dump(missing, f, indent=2)
        return {"files_without_faces": missing}

    from PIL import Image

    with Image.open(entries[0][2]) as probe:
        expect_hw = (probe.size[1], probe.size[0])

    batches = [entries[i : i + batch_size] for i in range(0, len(entries), batch_size)]
    pool = ThreadPoolExecutor(max_workers=1)  # decode pipelining (decode is
    # internally thread-parallel via the native loader)

    def decode(batch):
        return _decode_files_batch([p for _, _, p in batch], native_mod, expect_hw)

    try:
        fut = pool.submit(decode, batches[0])
        for bi, batch in enumerate(batches):
            imgs = fut.result()
            if len(batch) < batch_size:
                # pad the tail batch: ONE compiled program for the whole run
                pad = batch_size - len(batch)
                imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, axis=0)])
            if imgs.shape[1:3] != expect_hw:
                raise ValueError(
                    "extract_embeddings_streaming needs a uniform image size; "
                    "use extract_folder_embeddings for mixed sizes"
                )
            if bi + 1 < len(batches):
                fut = pool.submit(decode, batches[bi + 1])  # overlap decode
            boxes_list = detector.detect_batch(imgs)[0] if detector is not None else [
                np.array([[0, 0, imgs.shape[2], imgs.shape[1]]], np.float32)
            ] * imgs.shape[0]
            boxes = np.zeros((imgs.shape[0], 4), np.float32)
            ok = np.zeros((imgs.shape[0],), bool)
            for j, bl in enumerate(boxes_list):
                if j >= len(batch) or bl is None or len(bl) == 0:
                    if j < len(batch):
                        missing.append(os.path.join(batch[j][0], batch[j][1]))
                    boxes[j] = (0, 0, imgs.shape[2], imgs.shape[1])  # dummy
                else:
                    boxes[j] = bl[0][:4]
                    ok[j] = True
            embs = np.asarray(crop_embed_fn(imgs, boxes))
            for j, (id_folder, name, _) in enumerate(batch):
                if ok[j]:
                    np.save(
                        os.path.join(
                            output_root, id_folder, os.path.splitext(name)[0] + ".npy"
                        ),
                        embs[j],
                    )
    finally:
        pool.shutdown()

    with open(os.path.join(output_root, "files_without_faces.json"), "w") as f:
        json.dump(missing, f, indent=2)
    return {"files_without_faces": missing}


def make_arcface_embed_fn(params, state, cfg=None, policy=None):
    """Jitted frozen-ArcFace embed function
    (`prepare_locked_ArcFace_model`, `ArcFace_files/ArcFace_functions.py:27-36`)."""
    import jax

    from ..core.precision import DEFAULT_POLICY
    from ..models import iresnet

    cfg = cfg or iresnet.IResNetConfig()
    policy = policy or DEFAULT_POLICY

    @jax.jit
    def embed(x):
        e, _ = iresnet.apply(params, state, x, cfg, policy=policy, train=False)
        return e

    return embed
