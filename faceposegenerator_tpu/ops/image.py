"""Differentiable image ops for the in-training-loop identity branch.

The reference crops the MTCNN bbox with tensor indexing then resizes to 112²
(`train_ID-Booth.py:1088-1092`, `cropped_image_to_arcface_input:444-455`) —
a host-synced, data-dependent-shape operation. The TPU-native equivalent is
`crop_and_resize`: bilinear sampling on a bbox-parameterized grid — static
output shape, fully jittable, differentiable w.r.t. the image (so the
identity-loss gradient flows back through the VAE decode), and batchable.
"No face found" is handled by masking the loss, not by Python branching
(SURVEY.md §7 hard part (b)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def crop_and_resize(
    images: jax.Array,
    boxes: jax.Array,
    out_size: int = 112,
) -> jax.Array:
    """Bilinear crop-and-resize (NHWC).

    images: (B, H, W, C); boxes: (B, 4) as (x0, y0, x1, y1) in pixel coords
    (float, may be fractional; clamped to the image). Returns
    (B, out_size, out_size, C) with gradients into `images`.
    """
    b, h, w, c = images.shape
    x0, y0, x1, y1 = [boxes[:, i] for i in range(4)]
    x0 = jnp.clip(x0, 0, w - 1)
    x1 = jnp.clip(x1, 0, w - 1)
    y0 = jnp.clip(y0, 0, h - 1)
    y1 = jnp.clip(y1, 0, h - 1)

    # sample centers of out_size positions along each box edge
    t = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size
    ys = y0[:, None] + t[None, :] * (y1 - y0)[:, None]  # (B, S)
    xs = x0[:, None] + t[None, :] * (x1 - x0)[:, None]

    yf = jnp.floor(ys)
    xf = jnp.floor(xs)
    wy = (ys - yf)[:, :, None, None]  # (B, S, 1, 1)
    wx = (xs - xf)[:, None, :, None]  # (B, 1, S, 1)
    yi0 = jnp.clip(yf.astype(jnp.int32), 0, h - 1)
    yi1 = jnp.clip(yi0 + 1, 0, h - 1)
    xi0 = jnp.clip(xf.astype(jnp.int32), 0, w - 1)
    xi1 = jnp.clip(xi0 + 1, 0, w - 1)

    def gather_rows(img, yi):
        return jnp.take(img, yi, axis=0)  # (S, W, C)

    def gather_cols(img, xi):
        return jnp.take(img, xi, axis=1)  # (S, S, C)

    def per_image(img, yi0, yi1, xi0, xi1):
        r0 = gather_rows(img, yi0)
        r1 = gather_rows(img, yi1)
        p00 = gather_cols(r0, xi0)
        p01 = gather_cols(r0, xi1)
        p10 = gather_cols(r1, xi0)
        p11 = gather_cols(r1, xi1)
        return p00, p01, p10, p11

    p00, p01, p10, p11 = jax.vmap(per_image)(images, yi0, yi1, xi0, xi1)
    top = p00 * (1 - wx) + p01 * wx
    bot = p10 * (1 - wx) + p11 * wx
    return top * (1 - wy) + bot * wy


def resize_bilinear(images: jax.Array, out_hw) -> jax.Array:
    """Plain bilinear resize (align_corners=False, torch/PIL-style)."""
    b, h, w, c = images.shape
    boxes = jnp.tile(jnp.array([[0.0, 0.0, float(w - 1), float(h - 1)]]), (b, 1))
    # reuse the sampling path for squares; for non-square fall back to jax.image
    if out_hw[0] == out_hw[1]:
        return crop_and_resize(images, boxes, out_hw[0])
    return jax.image.resize(images, (b, out_hw[0], out_hw[1], c), "bilinear")


@jax.jit
def quantize_u8(images: jax.Array) -> jax.Array:
    """[0,1] float → uint8 ON DEVICE (PIL round-half-up semantics).

    Serving/sweep paths quantize before the device→host transfer: 4× fewer
    bytes for precision every consumer (PNG writers, eval preprocessing)
    discards anyway."""
    return jnp.clip(jnp.round(images.astype(jnp.float32) * 255.0), 0, 255).astype(jnp.uint8)


def normalize_to_arcface(face: jax.Array) -> jax.Array:
    """uint8-range [0,255] HWC face crop -> [-1, 1] ArcFace input
    (reference `cropped_image_to_arcface_input`, `train_ID-Booth.py:444-455`:
    resize 112 → /255 → (x-0.5)/0.5)."""
    return (face / 255.0 - 0.5) / 0.5
