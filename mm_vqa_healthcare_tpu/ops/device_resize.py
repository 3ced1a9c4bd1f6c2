"""Device-side PIL-parity image resize+crop (the host pipeline's hot op).

Profiling the real-data train lane showed PIL bicubic resize at ~12 ms per
sample on this host — the single dominant host cost (randaug's PIL affine
ops are nearest-resample and nearly free).  This op moves the resize/crop
onto the TPU as two separable resampling matmuls (MXU work, ~0.1 ms for a
batch of 16), so the host ships cached decoded uint8 frames and the jitted
step does geometry + normalize.

PIL parity (Pillow ImagingResample, 8bpc path):
  * antialiased bicubic (a = -0.5), filterscale = max(in/out, 1),
    support = 2 * filterscale
  * window [xmin, xmax) = [floor(center - support + 0.5),
    floor(center + support + 0.5)) clipped to the source box; weights
    normalized over the clipped window
  * horizontal pass first, intermediate rounded to uint8 (round half up),
    then vertical pass, rounded again
Differences from PIL: float32 weights instead of PIL's int16 fixed-point
coefficients — per-pixel differences are <=1/255 (see
tests/test_device_resize.py).

The per-sample geometry is a "resample spec" of 8 floats computed on host
(data/transforms.py): per axis (src_offset, crop_offset, scale, src_size).
Output center for pixel x:  src_offset + (x + crop_offset + 0.5) * scale,
sampling clipped to [src_offset, src_offset + src_size).  This one form
expresses:
  * torchvision Resize(short-edge)+CenterCrop  (reference transform.py:60-67)
    -> src_offset 0, crop_offset = center-crop left, scale = in/resized
  * RandomResizedCrop (crop box then resize)    (reference transform.py:70-77)
    -> src_offset = box left/top, crop_offset 0, scale = box/out
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# resample spec layout (float32[8]):
#   [0] y src_offset   [1] y crop_offset   [2] y scale   [3] y src_size
#   [4] x src_offset   [5] x crop_offset   [6] x scale   [7] x src_size
SPEC_SIZE = 8


def _bicubic(t: jax.Array, a: float = -0.5) -> jax.Array:
    at = jnp.abs(t)
    at2, at3 = at * at, at * at * at
    w1 = (a + 2.0) * at3 - (a + 3.0) * at2 + 1.0
    w2 = a * (at3 - 5.0 * at2 + 8.0 * at - 4.0)
    return jnp.where(at < 1.0, w1, jnp.where(at < 2.0, w2, 0.0))


def _axis_matrix(out_len: int, in_cap: int, src_off: jax.Array,
                 crop_off: jax.Array, scale: jax.Array,
                 src_size: jax.Array) -> jax.Array:
    """[out_len, in_cap] PIL-antialiased-bicubic row-normalized weights."""
    x = jnp.arange(out_len, dtype=jnp.float32)[:, None]
    j = jnp.arange(in_cap, dtype=jnp.float32)[None, :]
    center = src_off + (x + crop_off + 0.5) * scale
    filterscale = jnp.maximum(scale, 1.0)
    support = 2.0 * filterscale
    lo = jnp.maximum(jnp.floor(center - support + 0.5), src_off)
    hi = jnp.minimum(jnp.floor(center + support + 0.5), src_off + src_size)
    valid = (j >= lo) & (j < hi)
    w = _bicubic((j + 0.5 - center) / filterscale) * valid
    return w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)


def _round_u8(x: jax.Array) -> jax.Array:
    # PIL clip8: round half up, clip to [0, 255]
    return jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)


def resize_crop(frame_u8: jax.Array, spec: jax.Array,
                out_size: int) -> jax.Array:
    """One padded uint8 frame [Hc, Wc, 3] -> [out, out, 3] float32 in 0..255.

    Matches PIL resize-then-crop / crop-then-resize per the spec; includes
    PIL's per-pass uint8 rounding so parity holds to the fixed-point LSB.
    """
    img = frame_u8.astype(jnp.float32)
    mw = _axis_matrix(out_size, frame_u8.shape[1],
                      spec[4], spec[5], spec[6], spec[7])
    tmp = _round_u8(jnp.einsum("xw,hwc->hxc", mw, img,
                               preferred_element_type=jnp.float32))
    mh = _axis_matrix(out_size, frame_u8.shape[0],
                      spec[0], spec[1], spec[2], spec[3])
    out = _round_u8(jnp.einsum("yh,hxc->yxc", mh, tmp,
                               preferred_element_type=jnp.float32))
    return out


def resize_crop_batch(frames_u8: jax.Array, specs: jax.Array,
                      out_size: int) -> jax.Array:
    """[B, Hc, Wc, 3] uint8 + [B, 8] specs -> [B, out, out, 3] float32
    (0..255 scale, ready for the device normalize tail)."""
    return jax.vmap(lambda f, s: resize_crop(f, s, out_size))(
        frames_u8, specs)
