"""Image transform pipelines (reference m3ae/transforms/transform.py).

torchvision is not a dependency: the pipelines are rebuilt on PIL + numpy
with the same semantics —
  * Resize(size) resizes the SHORT edge to `size` (bicubic), keeping aspect,
  * CenterCrop(size) crops a size x size window,
  * ToTensor + Normalize(mean, std).

Host output layout is HWC float32 (TPU-friendly NHWC), or HWC uint8 when
`device_normalize=True` — in that mode the float conversion + normalize runs
on device inside the jitted step (fused by XLA), cutting host work and
host->device transfer bytes by 4x.

Normalization constants: CLIP (transform.py:60-67), imagenet and inception
(transforms/utils.py:48-65).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np
from PIL import Image

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
INCEPTION_MEAN = (0.5, 0.5, 0.5)
INCEPTION_STD = (0.5, 0.5, 0.5)


def resize_short_edge(image: Image.Image, size: int) -> Image.Image:
    """torchvision Resize(int) semantics: short edge -> size, bicubic."""
    w, h = image.size
    if w <= h:
        ow, oh = size, max(1, int(round(size * h / w)))
    else:
        oh, ow = size, max(1, int(round(size * w / h)))
    if (ow, oh) == (w, h):
        return image
    return image.resize((ow, oh), Image.BICUBIC)


def center_crop(image: Image.Image, size: int) -> Image.Image:
    w, h = image.size
    left = int(round((w - size) / 2.0))
    top = int(round((h - size) / 2.0))
    if w < size or h < size:
        # torchvision pads with 0 when the image is smaller than the crop
        canvas = Image.new("RGB", (max(w, size), max(h, size)))
        canvas.paste(image.convert("RGB"), ((max(w, size) - w) // 2,
                                            (max(h, size) - h) // 2))
        image = canvas
        w, h = image.size
        left = (w - size) // 2
        top = (h - size) // 2
    return image.crop((left, top, left + size, top + size))


def resized_crop_params(w: int, h: int, scale: Tuple[float, float],
                        rng: np.random.Generator) -> Tuple[int, int, int, int]:
    """torchvision RandomResizedCrop box draw (ratio 3/4..4/3):
    (left, top, crop_w, crop_h)."""
    area = w * h
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        log_ratio = (np.log(3 / 4), np.log(4 / 3))
        aspect = np.exp(rng.uniform(*log_ratio))
        cw = int(round(np.sqrt(target_area * aspect)))
        ch = int(round(np.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            left = int(rng.integers(0, w - cw + 1))
            top = int(rng.integers(0, h - ch + 1))
            return left, top, cw, ch
    # fallback: center crop
    in_ratio = w / h
    if in_ratio < 3 / 4:
        cw, ch = w, int(round(w / (3 / 4)))
    elif in_ratio > 4 / 3:
        cw, ch = int(round(h * 4 / 3)), h
    else:
        cw, ch = w, h
    return (w - cw) // 2, (h - ch) // 2, cw, ch


def random_resized_crop(image: Image.Image, size: int,
                        scale: Tuple[float, float],
                        rng: np.random.Generator) -> Image.Image:
    """torchvision RandomResizedCrop (ratio 3/4..4/3), bicubic."""
    w, h = image.size
    left, top, cw, ch = resized_crop_params(w, h, scale, rng)
    crop = image.crop((left, top, left + cw, top + ch))
    return crop.resize((size, size), Image.BICUBIC)


@dataclasses.dataclass
class ImageTransform:
    """One transform pipeline keyed by the reference transform-key strings."""
    key: str
    size: int
    mean: Tuple[float, float, float]
    std: Tuple[float, float, float]
    randaug: bool = False
    resizedcrop: bool = False
    device_normalize: bool = False
    # Move the PIL bicubic resize+crop (the dominant host cost, ~12 ms per
    # sample on a 1-vCPU host) onto the device: emit the full decoded frame
    # (uint8, zero-padded to device_resize_cap) plus a resample spec;
    # ops/device_resize.py does PIL-parity geometry in-jit.  Frames larger
    # than the cap are PIL-downscaled once (long edge -> cap) first.
    device_resize: bool = False
    device_resize_cap: int = 512

    def __call__(self, image: Image.Image,
                 rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng()
        if self.device_resize:
            return self._device_geometry(image, rng)
        if self.randaug:
            from mm_vqa_healthcare_tpu.data.randaug import RandAugment
            image = RandAugment(2, 9)(image.convert("RGB"), rng)
        if self.resizedcrop:
            image = random_resized_crop(image, self.size, (0.9, 1.0), rng)
            image = center_crop(image, self.size)
        else:
            image = resize_short_edge(image, self.size)
            image = center_crop(image, self.size)
        arr = np.asarray(image.convert("RGB"), dtype=np.uint8)  # HWC uint8
        if self.device_normalize:
            return arr
        out = arr.astype(np.float32) / 255.0
        out = (out - np.asarray(self.mean, np.float32)) / np.asarray(self.std, np.float32)
        return out

    def _device_geometry(self, image: Image.Image,
                         rng: np.random.Generator):
        """(padded uint8 frame, resample spec float32[8]) — geometry runs
        on device.  Spec layout: per axis (src_off, crop_off, scale,
        src_size), y axis first (ops/device_resize.py)."""
        cap = self.device_resize_cap
        image = image.convert("RGB")
        if max(image.size) > cap:
            w, h = image.size
            if w >= h:
                nw, nh = cap, max(1, int(round(cap * h / w)))
            else:
                nh, nw = cap, max(1, int(round(cap * w / h)))
            image = image.resize((nw, nh), Image.BICUBIC)
        if self.randaug:
            from mm_vqa_healthcare_tpu.data.randaug import RandAugment
            image = RandAugment(2, 9)(image, rng)
        w, h = image.size
        size = self.size
        if self.resizedcrop:
            left, top, cw, ch = resized_crop_params(w, h, (0.9, 1.0), rng)
            spec = np.asarray([top, 0.0, ch / size, ch,
                               left, 0.0, cw / size, cw], np.float32)
        else:
            if w <= h:
                ow, oh = size, max(1, int(round(size * h / w)))
            else:
                oh, ow = size, max(1, int(round(size * w / h)))
            left = int(round((ow - size) / 2.0))
            top = int(round((oh - size) / 2.0))
            spec = np.asarray([0.0, top, h / oh, h,
                               0.0, left, w / ow, w], np.float32)
        frame = np.zeros((cap, cap, 3), np.uint8)
        frame[:h, :w] = np.asarray(image, np.uint8)
        return frame, spec


_NORMS: Dict[str, Tuple[Tuple[float, ...], Tuple[float, ...]]] = {
    "clip": (CLIP_MEAN, CLIP_STD),
    "imagenet": (IMAGENET_MEAN, IMAGENET_STD),
    "vit": (INCEPTION_MEAN, INCEPTION_STD),
}


def key_to_transform(key: str, size: int,
                     device_normalize: bool = False,
                     device_resize: bool = False,
                     device_resize_cap: int = 512) -> ImageTransform:
    """Registry matching reference transforms/__init__.py:7-15 keys:
    clip, clip_randaug, clip_resizedcrop, imagenet, imagenet_randaug, vit,
    vit_randaug."""
    base = key.replace("_randaug", "").replace("_resizedcrop", "")
    if base not in _NORMS:
        raise KeyError(f"Unknown transform key {key!r}")
    mean, std = _NORMS[base]
    return ImageTransform(
        key=key, size=size, mean=mean, std=std,
        randaug=key.endswith("_randaug"),
        resizedcrop=key.endswith("_resizedcrop"),
        device_normalize=device_normalize,
        device_resize=device_resize,
        device_resize_cap=device_resize_cap,
    )


def keys_to_transforms(keys, size: int, device_normalize: bool = False,
                       device_resize: bool = False,
                       device_resize_cap: int = 512):
    return [key_to_transform(k, size, device_normalize,
                             device_resize, device_resize_cap)
            for k in keys]


def eval_transform_keys(keys):
    """Eval strips _randaug/_resizedcrop (reference base_dataset.py:39-41)."""
    return [k.replace("_randaug", "").replace("_resizedcrop", "") for k in keys]


def device_normalize_fn(mean, std):
    """Returns a jit-friendly uint8->normalized-float fn (device side)."""
    import jax.numpy as jnp
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)

    def fn(img_u8, dtype=jnp.float32):
        x = img_u8.astype(jnp.float32) / 255.0
        return ((x - mean) / std).astype(dtype)
    return fn
