"""Face alignment: similarity transform to the ArcFace 112² template.

Reference behavior (`utils/detect_align_crop_data.py:132-196`): estimate a
similarity transform from 5 detected landmarks to the insightface ArcFace
reference points (the classic 112×96 template with +8px x-shift for 112×112),
then warp-crop to 112². Implemented with the closed-form Umeyama algorithm
(numpy SVD) + cv2 warpAffine — host-side preprocessing producing batched
device tensors (SURVEY.md §1 L5 → TPU mapping).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# insightface 5-point template for 112×96, x+8 → 112×112 (public constants;
# reference `utils/detect_align_crop_data.py:182-196`)
ARCFACE_TEMPLATE_112 = np.array(
    [
        [38.2946, 51.6963],
        [73.5318, 51.5014],
        [56.0252, 71.7366],
        [41.5493, 92.3655],
        [70.7299, 92.2041],
    ],
    dtype=np.float32,
)


def umeyama_similarity(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Closed-form least-squares similarity transform (rotation+scale+shift)
    mapping src (N,2) onto dst (N,2). Returns a 2x3 affine matrix."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    n, d = src.shape
    mu_s, mu_d = src.mean(0), dst.mean(0)
    sc, dc = src - mu_s, dst - mu_d
    cov = dc.T @ sc / n
    u, s, vt = np.linalg.svd(cov)
    sign = np.ones(d)
    if np.linalg.det(cov) < 0:
        sign[-1] = -1
    r = u @ np.diag(sign) @ vt
    var_s = (sc**2).sum() / n
    scale = (s * sign).sum() / var_s if var_s > 0 else 1.0
    t = mu_d - scale * r @ mu_s
    m = np.zeros((2, 3))
    m[:, :2] = scale * r
    m[:, 2] = t
    return m.astype(np.float32)


def estimate_norm(landmarks_5: np.ndarray, image_size: int = 112) -> np.ndarray:
    """5-landmark (5,2) -> 2x3 warp matrix onto the ArcFace template
    (reference `estimate_norm`, `utils/detect_align_crop_data.py:132-167`)."""
    assert landmarks_5.shape == (5, 2)
    dst = ARCFACE_TEMPLATE_112 * (image_size / 112.0)
    return umeyama_similarity(landmarks_5, dst)


def norm_crop(img: np.ndarray, landmarks_5: np.ndarray, image_size: int = 112) -> np.ndarray:
    """Warp-crop an HWC uint8/float image to the aligned template
    (reference `norm_crop`, `utils/detect_align_crop_data.py:169-179`)."""
    import cv2

    m = estimate_norm(np.asarray(landmarks_5, np.float32), image_size)
    return cv2.warpAffine(img, m, (image_size, image_size), borderValue=0.0)


def pad_image(img: np.ndarray, fraction: float = 0.5) -> Tuple[np.ndarray, int, int]:
    """Zero-pad each side by `fraction` of the dimension — the reference pads
    50% before detection so MTCNN finds faces near borders
    (`utils/detect_align_crop_data.py:81-105`). Returns (padded, px, py)."""
    h, w = img.shape[:2]
    py, px = int(h * fraction), int(w * fraction)
    out = np.zeros((h + 2 * py, w + 2 * px) + img.shape[2:], img.dtype)
    out[py : py + h, px : px + w] = img
    return out, px, py


def bbox_crop_resize(
    img: np.ndarray, bbox: np.ndarray, out_size: int = 112
) -> np.ndarray:
    """Plain bbox crop + resize — the looser alignment used inside training
    and embed extraction (`train_ID-Booth.py:1088-1092`,
    `extract_ArcFace_embeds.py:55-68`)."""
    import cv2

    h, w = img.shape[:2]
    x0, y0, x1, y1 = [int(round(float(v))) for v in bbox[:4]]
    x0, y0 = max(0, x0), max(0, y0)
    x1, y1 = min(w, x1), min(h, y1)
    if x1 <= x0 or y1 <= y0:
        return cv2.resize(img, (out_size, out_size))
    return cv2.resize(img[y0:y1, x0:x1], (out_size, out_size))


def to_arcface_input(faces: np.ndarray) -> np.ndarray:
    """uint8 (B,112,112,3) -> fp32 [-1,1] NHWC ArcFace input (reference
    `preprocess_image_for_ArcFace`, `ArcFace_files/ArcFace_functions.py:14-25`)."""
    x = np.asarray(faces, np.float32) / 255.0
    return (x - 0.5) / 0.5
