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
