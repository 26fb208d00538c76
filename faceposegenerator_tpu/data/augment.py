"""Augmentation policies for FR training.

Behavioral rebuild of the subset the reference configs actually use
(`FR_training/utils/augmentation.py:115-148` `get_conventional_aug_policy`
with `FR_config.py:47`): "hf" (horizontal flip p=0.5) and "ra_n_m"
(RandAugment with n ops at magnitude m, from the torchvision-forked
`rand_augment.py`). Ops are implemented with PIL — host-side preprocessing.
"""

from __future__ import annotations

from typing import Callable, List

import numpy as np


def _pil(img):
    from PIL import Image

    return Image.fromarray(img)


def _np(img):
    return np.asarray(img, np.uint8)


# Each op: (name, fn(PIL, magnitude_fraction) -> PIL)

def _shear_x(img, frac):
    from PIL import Image
    return img.transform(img.size, Image.Transform.AFFINE, (1, 0.3 * frac, 0, 0, 1, 0))


def _shear_y(img, frac):
    from PIL import Image
    return img.transform(img.size, Image.Transform.AFFINE, (1, 0, 0, 0.3 * frac, 1, 0))


def _translate_x(img, frac):
    from PIL import Image
    return img.transform(img.size, Image.Transform.AFFINE, (1, 0, frac * img.size[0] * 0.45, 0, 1, 0))


def _translate_y(img, frac):
    from PIL import Image
    return img.transform(img.size, Image.Transform.AFFINE, (1, 0, 0, 0, 1, frac * img.size[1] * 0.45))


def _rotate(img, frac):
    return img.rotate(30.0 * frac)


def _color(img, frac):
    from PIL import ImageEnhance

    return ImageEnhance.Color(img).enhance(1.0 + 0.9 * frac)


def _contrast(img, frac):
    from PIL import ImageEnhance

    return ImageEnhance.Contrast(img).enhance(1.0 + 0.9 * frac)


def _brightness(img, frac):
    from PIL import ImageEnhance

    return ImageEnhance.Brightness(img).enhance(1.0 + 0.9 * frac)


def _sharpness(img, frac):
    from PIL import ImageEnhance

    return ImageEnhance.Sharpness(img).enhance(1.0 + 0.9 * frac)


def _posterize(img, frac):
    from PIL import ImageOps

    return ImageOps.posterize(img, max(1, 8 - int(abs(frac) * 4)))


def _solarize(img, frac):
    from PIL import ImageOps

    return ImageOps.solarize(img, int(255 - abs(frac) * 255))


def _autocontrast(img, frac):
    from PIL import ImageOps

    return ImageOps.autocontrast(img)


def _equalize(img, frac):
    from PIL import ImageOps

    return ImageOps.equalize(img)


RA_OPS: List = [
    ("Identity", lambda img, f: img),
    ("ShearX", _shear_x),
    ("ShearY", _shear_y),
    ("TranslateX", _translate_x),
    ("TranslateY", _translate_y),
    ("Rotate", _rotate),
    ("Color", _color),
    ("Contrast", _contrast),
    ("Brightness", _brightness),
    ("Sharpness", _sharpness),
    ("Posterize", _posterize),
    ("Solarize", _solarize),
    ("AutoContrast", _autocontrast),
    ("Equalize", _equalize),
]


def rand_augment(num_ops: int = 4, magnitude: int = 16, num_magnitude_bins: int = 31):
    """RandAugment(n, m): apply n random ops at signed magnitude m/30."""

    def apply(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        pil = _pil(img)
        for _ in range(num_ops):
            _, op = RA_OPS[rng.integers(0, len(RA_OPS))]
            frac = magnitude / (num_magnitude_bins - 1)
            if rng.random() < 0.5:
                frac = -frac
            pil = op(pil, frac)
        return _np(pil)

    return apply


def horizontal_flip(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    return img[:, ::-1] if rng.random() < 0.5 else img


def gaussian_blur(sigma_range=(0.1, 2.0), p: float = 0.5):
    """Random Gaussian blur — the one MoCo component on the reference's live
    path (`moco/loader.py` GaussianBlur via `augmentation.py:21`)."""

    def apply(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        if rng.random() >= p:
            return img
        from PIL import Image, ImageFilter

        sigma = rng.uniform(*sigma_range)
        return _np(_pil(img).filter(ImageFilter.GaussianBlur(radius=sigma)))

    return apply


def get_aug_policy(name: str) -> Callable:
    """Dispatcher mirroring `get_conventional_aug_policy`: "hf", "ra_4_16",
    "gan" (hf alias), "hf+ra_4_16"."""
    name = name.lower()
    if name in ("hf", "gan", "flip"):
        return horizontal_flip
    if name.startswith("ra_"):
        _, n, m = name.split("_")
        ra = rand_augment(int(n), int(m))

        def combined(img, rng):
            return ra(horizontal_flip(img, rng), rng)

        return combined
    if name in ("blur", "moco_blur"):
        blur = gaussian_blur()

        def blur_hf(img, rng):
            return blur(horizontal_flip(img, rng), rng)

        return blur_hf
    if name.startswith("faa"):
        # FastAutoAugment policy tables (`FR_training/utils/FAA_policy.py`,
        # 2.4k LoC of tuned tuples) are dataset-specific artifacts never
        # selected by the live configs; load them from the original file if
        # genuinely needed.
        raise NotImplementedError(
            "FAA policies are data artifacts not bundled here; use 'hf', "
            "'ra_N_M', or 'blur'"
        )
    raise ValueError(f"unknown augmentation policy {name!r}")
