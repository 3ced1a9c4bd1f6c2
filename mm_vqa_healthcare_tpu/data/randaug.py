"""RandAugment on PIL (reference m3ae/transforms/randaug.py:14-272).

Same 16-op augment list and magnitude ranges as the reference (which itself
uses the public RandAugment recipe); torchvision-free, driven by an explicit
numpy Generator for reproducibility.
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageDraw, ImageEnhance, ImageOps


def _shear_x(img, v):
    return img.transform(img.size, Image.AFFINE, (1, v, 0, 0, 1, 0))


def _shear_y(img, v):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, v, 1, 0))


def _translate_x(img, v):  # fraction of width
    return img.transform(img.size, Image.AFFINE, (1, 0, v * img.size[0], 0, 1, 0))


def _translate_y(img, v):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, 0, 1, v * img.size[1]))


def _rotate(img, v):
    return img.rotate(v)


def _auto_contrast(img, _):
    return ImageOps.autocontrast(img)


def _invert(img, _):
    return ImageOps.invert(img)


def _equalize(img, _):
    return ImageOps.equalize(img)


def _flip(img, _):
    return ImageOps.mirror(img)


def _solarize(img, v):
    return ImageOps.solarize(img, int(v))


def _posterize(img, v):
    return ImageOps.posterize(img, max(1, int(v)))


def _contrast(img, v):
    return ImageEnhance.Contrast(img).enhance(v)


def _color(img, v):
    return ImageEnhance.Color(img).enhance(v)


def _brightness(img, v):
    return ImageEnhance.Brightness(img).enhance(v)


def _sharpness(img, v):
    return ImageEnhance.Sharpness(img).enhance(v)


def _cutout(img, v, rng):
    if v <= 0.0:
        return img
    size = int(v * img.size[0])
    w, h = img.size
    x0 = int(max(0, rng.uniform(0, w) - size / 2.0))
    y0 = int(max(0, rng.uniform(0, h) - size / 2.0))
    x1, y1 = min(w, x0 + size), min(h, y0 + size)
    img = img.copy()
    ImageDraw.Draw(img).rectangle((x0, y0, x1, y1), fill=(125, 123, 114))
    return img


def _identity(img, _):
    return img


# (op, min_magnitude, max_magnitude) — reference randaug.py augment_list
AUGMENT_LIST = [
    (_auto_contrast, 0, 1),
    (_equalize, 0, 1),
    (_invert, 0, 1),
    (_rotate, 0, 30),
    (_posterize, 0, 4),
    (_solarize, 0, 256),
    (_color, 0.1, 1.9),
    (_contrast, 0.1, 1.9),
    (_brightness, 0.1, 1.9),
    (_sharpness, 0.1, 1.9),
    (_shear_x, 0.0, 0.3),
    (_shear_y, 0.0, 0.3),
    (_translate_x, 0.0, 0.33),
    (_translate_y, 0.0, 0.33),
    (_identity, 0, 1),
    (_flip, 0, 1),
]


class RandAugment:
    """Apply n random ops at magnitude m (of 30) — RandAugment(2, 9)."""

    def __init__(self, n: int = 2, m: int = 9):
        self.n = n
        self.m = m

    def __call__(self, img: Image.Image,
                 rng: np.random.Generator | None = None) -> Image.Image:
        rng = rng or np.random.default_rng()
        idxs = rng.choice(len(AUGMENT_LIST), self.n, replace=True)
        for idx in idxs:
            op, lo, hi = AUGMENT_LIST[idx]
            val = (self.m / 30.0) * (hi - lo) + lo
            if op is _cutout:
                img = op(img, val, rng)
            else:
                img = op(img, val)
        return img
