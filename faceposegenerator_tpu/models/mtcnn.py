"""MTCNN face-detection cascade (P-Net / R-Net / O-Net) — JAX port.

The reference uses facenet-pytorch's `MTCNN(image_size=112, margin=0)` for
batch detection in preprocessing (`extract_ArcFace_embeds.py:28,52`,
`utils/detect_align_crop_data.py`) and *inside the ID-Booth training loop*
(`train_ID-Booth.py:982,1085,1115`). Here the three tiny convnets are pure
JAX (jitted, batched over crops) and the cascade (image pyramid, NMS, box
regression, landmark extraction) is numpy orchestration — the nets dominate
the compute and run on device.

Weight source: a facenet-pytorch-layout state dict (pnet/rnet/onet `.pt`),
converted by `convert_mtcnn_state_dict` (OIHW→HWIO etc.). Random init is
provided for tests; detection quality obviously requires real weights.

Architecture (standard MTCNN, Zhang et al. 2016):
  P-Net: conv3x3×10 →PReLU→maxpool2→conv3x3×16→PReLU→conv3x3×32→PReLU
         → 1x1 heads: face prob (2), bbox reg (4)            [fully conv]
  R-Net: conv3x3×28→pool3s2→conv3x3×48→pool3s2→conv2x2×64→fc128
         → heads: prob (2), reg (4)                          [24×24 input]
  O-Net: conv3x3×32→pool3s2→conv3x3×64→pool3s2→conv3x3×64→pool2→conv2x2×128
         →fc256 → heads: prob (2), reg (4), landmarks (10)   [48×48 input]
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .unet2d import conv2d


# ---------------------------------------------------------------------------
# net definitions (functional; NHWC)
# ---------------------------------------------------------------------------


def _prelu(x, a):
    return jnp.maximum(x, 0) + a.astype(x.dtype) * jnp.minimum(x, 0)


def _maxpool(x, k, s, ceil=True):
    pad = ((0, 0), (0, 0))
    if ceil:
        h, w = x.shape[1], x.shape[2]
        ph = max(0, (-(h - k) % s))
        pw = max(0, (-(w - k) % s))
        pad = ((0, ph), (0, pw))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
        ((0, 0), pad[0], pad[1], (0, 0)),
    )


def _conv_init(key, kh, kw, cin, cout, dtype=jnp.float32):
    fan = kh * kw * cin
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.normal(k1, (kh, kw, cin, cout), dtype) * (2.0 / fan) ** 0.5,
        "b": jnp.zeros((cout,), dtype),
    }


def _fc_init(key, cout, cin, dtype=jnp.float32):
    return {
        "w": jax.random.normal(key, (cout, cin), dtype) * (1.0 / cin) ** 0.5,
        "b": jnp.zeros((cout,), dtype),
    }


def init_pnet(key):
    ks = jax.random.split(key, 8)
    return {
        "conv1": _conv_init(ks[0], 3, 3, 3, 10), "prelu1": jnp.full((10,), 0.25),
        "conv2": _conv_init(ks[1], 3, 3, 10, 16), "prelu2": jnp.full((16,), 0.25),
        "conv3": _conv_init(ks[2], 3, 3, 16, 32), "prelu3": jnp.full((32,), 0.25),
        "cls": _conv_init(ks[3], 1, 1, 32, 2),
        "reg": _conv_init(ks[4], 1, 1, 32, 4),
    }


def init_rnet(key):
    ks = jax.random.split(key, 8)
    return {
        "conv1": _conv_init(ks[0], 3, 3, 3, 28), "prelu1": jnp.full((28,), 0.25),
        "conv2": _conv_init(ks[1], 3, 3, 28, 48), "prelu2": jnp.full((48,), 0.25),
        "conv3": _conv_init(ks[2], 2, 2, 48, 64), "prelu3": jnp.full((64,), 0.25),
        "fc": _fc_init(ks[3], 128, 64 * 3 * 3), "prelu4": jnp.full((128,), 0.25),
        "cls": _fc_init(ks[4], 2, 128),
        "reg": _fc_init(ks[5], 4, 128),
    }


def init_onet(key):
    ks = jax.random.split(key, 10)
    return {
        "conv1": _conv_init(ks[0], 3, 3, 3, 32), "prelu1": jnp.full((32,), 0.25),
        "conv2": _conv_init(ks[1], 3, 3, 32, 64), "prelu2": jnp.full((64,), 0.25),
        "conv3": _conv_init(ks[2], 3, 3, 64, 64), "prelu3": jnp.full((64,), 0.25),
        "conv4": _conv_init(ks[3], 2, 2, 64, 128), "prelu4": jnp.full((128,), 0.25),
        "fc": _fc_init(ks[4], 256, 128 * 3 * 3), "prelu5": jnp.full((256,), 0.25),
        "cls": _fc_init(ks[5], 2, 256),
        "reg": _fc_init(ks[6], 4, 256),
        "lmk": _fc_init(ks[7], 10, 256),
    }


def init(key):
    k1, k2, k3 = jax.random.split(key, 3)
    return {"pnet": init_pnet(k1), "rnet": init_rnet(k2), "onet": init_onet(k3)}


@jax.jit
def pnet_apply(p, x):
    """x: (B, H, W, 3) normalized; returns (prob map (B,h,w), reg (B,h,w,4))."""
    h = conv2d(x, p["conv1"], padding=0)
    h = _prelu(h, p["prelu1"])
    h = _maxpool(h, 2, 2)
    h = conv2d(h, p["conv2"], padding=0)
    h = _prelu(h, p["prelu2"])
    h = conv2d(h, p["conv3"], padding=0)
    h = _prelu(h, p["prelu3"])
    cls = conv2d(h, p["cls"], padding=0)
    reg = conv2d(h, p["reg"], padding=0)
    prob = jax.nn.softmax(cls.astype(jnp.float32), axis=-1)[..., 1]
    return prob, reg


def _flat_nchw(h):
    """facenet-pytorch flattens NCHW with a permute(0,3,2,1) quirk; we flatten
    our NHWC as (W, H, C)-major to match its fc weight layout."""
    return jnp.transpose(h, (0, 2, 1, 3)).reshape(h.shape[0], -1)


@jax.jit
def rnet_apply(p, x):
    h = conv2d(x, p["conv1"], padding=0)
    h = _prelu(h, p["prelu1"])
    h = _maxpool(h, 3, 2)
    h = conv2d(h, p["conv2"], padding=0)
    h = _prelu(h, p["prelu2"])
    h = _maxpool(h, 3, 2)
    h = conv2d(h, p["conv3"], padding=0)
    h = _prelu(h, p["prelu3"])
    h = _flat_nchw(h)
    h = h @ p["fc"]["w"].T + p["fc"]["b"]
    h = _prelu(h, p["prelu4"])
    cls = h @ p["cls"]["w"].T + p["cls"]["b"]
    reg = h @ p["reg"]["w"].T + p["reg"]["b"]
    return jax.nn.softmax(cls.astype(jnp.float32), axis=-1)[:, 1], reg


@jax.jit
def onet_apply(p, x):
    h = conv2d(x, p["conv1"], padding=0)
    h = _prelu(h, p["prelu1"])
    h = _maxpool(h, 3, 2)
    h = conv2d(h, p["conv2"], padding=0)
    h = _prelu(h, p["prelu2"])
    h = _maxpool(h, 3, 2)
    h = conv2d(h, p["conv3"], padding=0)
    h = _prelu(h, p["prelu3"])
    h = _maxpool(h, 2, 2)
    h = conv2d(h, p["conv4"], padding=0)
    h = _prelu(h, p["prelu4"])
    h = _flat_nchw(h)
    h = h @ p["fc"]["w"].T + p["fc"]["b"]
    h = _prelu(h, p["prelu5"])
    cls = h @ p["cls"]["w"].T + p["cls"]["b"]
    reg = h @ p["reg"]["w"].T + p["reg"]["b"]
    lmk = h @ p["lmk"]["w"].T + p["lmk"]["b"]
    return jax.nn.softmax(cls.astype(jnp.float32), axis=-1)[:, 1], reg, lmk


# ---------------------------------------------------------------------------
# cascade (numpy orchestration)
# ---------------------------------------------------------------------------


def _nms(boxes: np.ndarray, scores: np.ndarray, thresh: float, method: str = "union"):
    order = scores.argsort()[::-1]
    keep = []
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        if method == "min":
            iou = inter / np.minimum(area[i], area[order[1:]])
        else:
            iou = inter / (area[i] + area[order[1:]] - inter)
        order = order[1:][iou <= thresh]
    return np.asarray(keep, np.int64)


def _square(boxes):
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    side = np.maximum(w, h)
    cx = boxes[:, 0] + w / 2
    cy = boxes[:, 1] + h / 2
    out = boxes.copy()
    out[:, 0] = cx - side / 2
    out[:, 1] = cy - side / 2
    out[:, 2] = cx + side / 2
    out[:, 3] = cy + side / 2
    return out


def _crop_batch(img: np.ndarray, boxes: np.ndarray, size: int) -> np.ndarray:
    import cv2

    h, w = img.shape[:2]
    out = np.zeros((len(boxes), size, size, 3), np.float32)
    for i, b in enumerate(boxes):
        x1, y1, x2, y2 = [int(round(v)) for v in b[:4]]
        cx1, cy1 = max(0, x1), max(0, y1)
        cx2, cy2 = min(w, x2), min(h, y2)
        if cx2 <= cx1 or cy2 <= cy1:
            continue
        patch = np.zeros((y2 - y1, x2 - x1, 3), img.dtype)
        patch[cy1 - y1 : cy2 - y1, cx1 - x1 : cx2 - x1] = img[cy1:cy2, cx1:cx2]
        out[i] = cv2.resize(patch.astype(np.float32), (size, size))
    return out


def _norm(x):
    return (x - 127.5) / 128.0


# ------------------------------------------------------------------------
# device-side cascade hot paths (round 3)
#
# The embed_e2e bench exposed the host cost of the original formulation on
# the TPU VM's SINGLE CPU: per-scale cv2 pyramid resizes (B×#scales host
# resizes) and per-candidate cv2 stage crops (thousands per batch) measured
# 52 s per 64-image detect batch. Both now run on device: one dispatch per
# pyramid scale (resize+normalize+P-Net fused) and one dispatch per cascade
# stage (gather→zero-pad crop→resize→normalize→net over ALL candidates,
# padded to power-of-two buckets so the jit cache stays small).
# ------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(2, 3))
def _pnet_scale_apply(p, imgs, sh, sw):
    r = jax.image.resize(imgs, (imgs.shape[0], sh, sw, imgs.shape[3]), "bilinear")
    return pnet_apply(p, _norm(r))


def _crop_zero_pad_single(img, box, size: int):
    """Device mirror of `_crop_batch` semantics for one candidate: the box
    is rounded to ints, the patch is ZERO outside the image, and the patch
    is bilinearly resampled to (size, size) with cv2's half-pixel centers."""
    h, w = img.shape[0], img.shape[1]
    x1, y1, x2, y2 = [jnp.round(box[i]) for i in range(4)]
    t = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    ys = y1 + t * (y2 - y1) - 0.5  # image coords of sample centers
    xs = x1 + t * (x2 - x1) - 0.5

    yf = jnp.floor(ys)
    xf = jnp.floor(xs)
    wy = (ys - yf)[:, None, None]
    wx = (xs - xf)[None, :, None]
    y0 = yf.astype(jnp.int32)
    x0 = xf.astype(jnp.int32)

    def tap(yi, xi):
        ok = ((yi >= 0) & (yi < h))[:, None, None] * ((xi >= 0) & (xi < w))[None, :, None]
        rows = jnp.take(img, jnp.clip(yi, 0, h - 1), axis=0)
        vals = jnp.take(rows, jnp.clip(xi, 0, w - 1), axis=1)
        return vals * ok

    top = tap(y0, x0) * (1 - wx) + tap(y0, x0 + 1) * wx
    bot = tap(y0 + 1, x0) * (1 - wx) + tap(y0 + 1, x0 + 1) * wx
    return top * (1 - wy) + bot * wy


@functools.partial(jax.jit, static_argnums=(4, 5))
def _stage_apply(net_params, imgs, idx, boxes, size, which):
    """Gather each candidate's image, crop+resize on device, run the stage
    net — ONE dispatch for the whole candidate set."""

    def one(i, b):
        return _crop_zero_pad_single(imgs[i], b, size)

    crops = jax.vmap(one)(idx, boxes)
    x = _norm(crops)
    return rnet_apply(net_params, x) if which == "rnet" else onet_apply(net_params, x)


_STAGE_CHUNK = 2048  # per-dispatch candidate cap: a single vmapped program
# over 16k candidates × full-image gathers crashed the TPU compiler
# (perf/r3_embed_retry2.err); ≤2048 compiles and runs fine, and the chunk
# loop preserves exact cascade semantics for pathological candidate counts


def _run_stage_device(net_params, which, imgs_dev, idx, boxes, size):
    n = len(idx)
    outs = []
    for start in range(0, n, _STAGE_CHUNK):
        cidx = idx[start : start + _STAGE_CHUNK]
        cboxes = boxes[start : start + _STAGE_CHUNK, :4]
        cn = len(cidx)
        m = 128
        while m < cn:
            m *= 2
        idx_p = np.zeros(m, np.int32)
        idx_p[:cn] = cidx
        boxes_p = np.zeros((m, 4), np.float32)
        boxes_p[:cn] = cboxes
        out = _stage_apply(
            net_params, imgs_dev, jnp.asarray(idx_p), jnp.asarray(boxes_p), size, which
        )
        outs.append(tuple(np.asarray(o)[:cn] for o in out))
    return tuple(np.concatenate([o[k] for o in outs]) for k in range(len(outs[0])))


class MTCNN:
    """Cascade detector.

    detect(img) -> (boxes (N,4), probs (N,), landmarks (N,5,2)) or
    (None, None, None) — mirroring `mtcnn.detect(img, landmarks=...)`.
    """

    def __init__(
        self,
        params: Optional[Dict] = None,
        thresholds=(0.6, 0.7, 0.7),
        min_face_size: int = 20,
        factor: float = 0.709,
    ):
        self.params = params if params is not None else init(jax.random.key(0))
        self.thresholds = thresholds
        self.min_face_size = min_face_size
        self.factor = factor

    def _pyramid_scales(self, h, w):
        m = 12.0 / self.min_face_size
        min_side = min(h, w) * m
        scales = []
        s = m
        while min_side >= 12:
            scales.append(s)
            s *= self.factor
            min_side *= self.factor
        return scales

    def detect(self, img: np.ndarray, landmarks: bool = False):
        """Single-image detection = batch-of-1 `detect_batch`."""
        res = self.detect_batch(np.asarray(img, np.float32)[None], landmarks=landmarks)
        if landmarks:
            return res[0][0], res[1][0], res[2][0]
        return res[0][0], res[1][0]

    def detect_batch(self, imgs: np.ndarray, landmarks: bool = False):
        """Batched detection over same-sized images.

        The reference stacks a whole identity folder and detects in one call
        (`extract_ArcFace_embeds.py:42-52`); here the image pyramid is shared
        across the batch and each cascade stage runs as ONE device call over
        all images' candidates (P-Net per scale over the full batch; R-Net/
        O-Net over the concatenated crop set with an image-index vector),
        instead of a per-image pyramid loop.

        Returns (boxes, probs[, points]) as per-image lists; entries are
        None where no face survived — matching `detect`'s contract.
        """
        imgs = np.asarray(imgs, np.float32)
        if imgs.ndim != 4:
            raise ValueError("expected (B, H, W, C) image batch")
        B, h, w = imgs.shape[:3]
        imgs_dev = jnp.asarray(imgs)  # resident once; every stage reads it

        # ---- stage 1: P-Net over the shared pyramid, batched over images
        # (resize+normalize+net = ONE dispatch per scale, on device)
        per_img = [[] for _ in range(B)]
        for scale in self._pyramid_scales(h, w):
            sh, sw = int(np.ceil(h * scale)), int(np.ceil(w * scale))
            if sh < 12 or sw < 12:
                continue
            prob, reg = _pnet_scale_apply(self.params["pnet"], imgs_dev, sh, sw)
            prob = np.asarray(prob)
            reg = np.asarray(reg)
            stride, cell = 2, 12
            for b in range(B):
                ys, xs = np.where(prob[b] > self.thresholds[0])
                if len(ys) == 0:
                    continue
                bb = np.stack(
                    [
                        (stride * xs) / scale,
                        (stride * ys) / scale,
                        (stride * xs + cell) / scale,
                        (stride * ys + cell) / scale,
                    ],
                    axis=1,
                )
                r = reg[b, ys, xs]
                scores = prob[b, ys, xs]
                keep = _nms(bb, scores, 0.5)
                per_img[b].append(
                    np.concatenate([bb[keep], scores[keep, None], r[keep]], axis=1)
                )

        def _none_result():
            nones = [None] * B
            return (nones, list(nones), list(nones)) if landmarks else (nones, list(nones))

        # per-image stage-1 NMS + regression + square
        cand = [None] * B
        for b in range(B):
            if not per_img[b]:
                continue
            boxes = np.concatenate(per_img[b])
            keep = _nms(boxes[:, :4], boxes[:, 4], 0.7)
            boxes = boxes[keep]
            bw = boxes[:, 2] - boxes[:, 0]
            bh = boxes[:, 3] - boxes[:, 1]
            reg_boxes = np.stack(
                [
                    boxes[:, 0] + boxes[:, 5] * bw,
                    boxes[:, 1] + boxes[:, 6] * bh,
                    boxes[:, 2] + boxes[:, 7] * bw,
                    boxes[:, 3] + boxes[:, 8] * bh,
                ],
                axis=1,
            )
            cand[b] = _square(reg_boxes)

        def _gathered_stage(boxes_per_img, size, net):
            """Run the stage once over every image's candidates; crops are
            gathered/resampled ON DEVICE in the same dispatch as the net
            (the original per-candidate host cv2 crops measured 52 s per
            64×250² batch on the single-CPU TPU VM)."""
            idx, boxes = [], []
            for b in range(B):
                if boxes_per_img[b] is not None and len(boxes_per_img[b]):
                    idx.append(np.full(len(boxes_per_img[b]), b, np.int32))
                    boxes.append(np.asarray(boxes_per_img[b][:, :4], np.float32))
            if not idx:
                return None, None
            idx = np.concatenate(idx)
            out = _run_stage_device(
                self.params["rnet" if size == 24 else "onet"],
                "rnet" if size == 24 else "onet",
                imgs_dev, idx, np.concatenate(boxes), size,
            )
            return idx, out

        # ---- stage 2: R-Net, one call over all candidates
        idx, out = _gathered_stage(cand, 24, rnet_apply)
        if idx is None:
            return _none_result()
        prob_all, reg_all = out
        for b in range(B):
            sel = idx == b
            if cand[b] is None or not sel.any():
                cand[b] = None
                continue
            boxes4, prob, reg = cand[b], prob_all[sel], reg_all[sel]
            mask = prob > self.thresholds[1]
            if not mask.any():
                cand[b] = None
                continue
            boxes4, prob, reg = boxes4[mask], prob[mask], reg[mask]
            keep = _nms(boxes4, prob, 0.7)
            boxes4, prob, reg = boxes4[keep], prob[keep], reg[keep]
            bw = boxes4[:, 2] - boxes4[:, 0]
            bh = boxes4[:, 3] - boxes4[:, 1]
            cand[b] = _square(
                np.stack(
                    [
                        boxes4[:, 0] + reg[:, 0] * bw,
                        boxes4[:, 1] + reg[:, 1] * bh,
                        boxes4[:, 2] + reg[:, 2] * bw,
                        boxes4[:, 3] + reg[:, 3] * bh,
                    ],
                    axis=1,
                )
            )

        # ---- stage 3: O-Net, one call over all survivors
        idx, out = _gathered_stage(cand, 48, onet_apply)
        if idx is None:
            return _none_result()
        prob_all, reg_all, lmk_all = out
        final_boxes, final_probs, final_points = [None] * B, [None] * B, [None] * B
        for b in range(B):
            sel = idx == b
            if cand[b] is None or not sel.any():
                continue
            boxes4, prob, reg, lmk = cand[b], prob_all[sel], reg_all[sel], lmk_all[sel]
            mask = prob > self.thresholds[2]
            if not mask.any():
                continue
            boxes4, prob, reg, lmk = boxes4[mask], prob[mask], reg[mask], lmk[mask]
            bw = boxes4[:, 2] - boxes4[:, 0]
            bh = boxes4[:, 3] - boxes4[:, 1]
            points = np.stack(
                [
                    boxes4[:, 0:1] + lmk[:, 0:5] * bw[:, None],
                    boxes4[:, 1:2] + lmk[:, 5:10] * bh[:, None],
                ],
                axis=2,
            )
            final = np.stack(
                [
                    boxes4[:, 0] + reg[:, 0] * bw,
                    boxes4[:, 1] + reg[:, 1] * bh,
                    boxes4[:, 2] + reg[:, 2] * bw,
                    boxes4[:, 3] + reg[:, 3] * bh,
                ],
                axis=1,
            )
            keep = _nms(final, prob, 0.7, method="min")
            final, prob, points = final[keep], prob[keep], points[keep]
            order = prob.argsort()[::-1]
            final_boxes[b] = final[order]
            final_probs[b] = prob[order]
            final_points[b] = points[order]
        if landmarks:
            return final_boxes, final_probs, final_points
        return final_boxes, final_probs


def convert_mtcnn_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """facenet-pytorch MTCNN state dict → our pytree. Expects keys prefixed
    pnet./rnet./onet. with their layer names (conv1..., dense4/5/6...)."""

    def conv(prefix):
        return {
            "w": jnp.asarray(np.asarray(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)),
            "b": jnp.asarray(sd[f"{prefix}.bias"]),
        }

    def fc(prefix):
        return {"w": jnp.asarray(sd[f"{prefix}.weight"]), "b": jnp.asarray(sd[f"{prefix}.bias"])}

    def pr(prefix):
        return jnp.asarray(np.asarray(sd[f"{prefix}.weight"]).reshape(-1))

    return {
        "pnet": {
            "conv1": conv("pnet.conv1"), "prelu1": pr("pnet.prelu1"),
            "conv2": conv("pnet.conv2"), "prelu2": pr("pnet.prelu2"),
            "conv3": conv("pnet.conv3"), "prelu3": pr("pnet.prelu3"),
            "cls": conv("pnet.conv4_1"), "reg": conv("pnet.conv4_2"),
        },
        "rnet": {
            "conv1": conv("rnet.conv1"), "prelu1": pr("rnet.prelu1"),
            "conv2": conv("rnet.conv2"), "prelu2": pr("rnet.prelu2"),
            "conv3": conv("rnet.conv3"), "prelu3": pr("rnet.prelu3"),
            "fc": fc("rnet.dense4"), "prelu4": pr("rnet.prelu4"),
            "cls": fc("rnet.dense5_1"), "reg": fc("rnet.dense5_2"),
        },
        "onet": {
            "conv1": conv("onet.conv1"), "prelu1": pr("onet.prelu1"),
            "conv2": conv("onet.conv2"), "prelu2": pr("onet.prelu2"),
            "conv3": conv("onet.conv3"), "prelu3": pr("onet.prelu3"),
            "conv4": conv("onet.conv4"), "prelu4": pr("onet.prelu4"),
            "fc": fc("onet.dense5"), "prelu5": pr("onet.prelu5"),
            "cls": fc("onet.dense6_1"), "reg": fc("onet.dense6_2"),
            "lmk": fc("onet.dense6_3"),
        },
    }


def brightness_cascade_params() -> Dict:
    """Deterministic hand-constructed weights that fire on a BRIGHT SQUARE:
    P-Net channel 0 averages brightness through the stack and the face logit
    is 50·feat−45 (prob≈1 only when the whole 12×12 receptive field is
    bright); R-Net/O-Net always pass with zero regression and fixed landmark
    fractions.

    Exercises the full cascade (pyramid, NMS, regression, squaring, landmark
    mapping) without real facenet-pytorch weights — used by the golden
    cascade tests and the end-to-end embed benchmark (synthetic bright-square
    faces make detection deterministic so the measured work matches the real
    pipeline's)."""

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
    wcls[0, 0, 0, 1] = 50.0
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
