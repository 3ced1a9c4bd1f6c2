"""Device-side resize+crop (ops/device_resize.py) parity vs the host PIL
pipeline, plus the transform/collate/prepare plumbing and the
uint8-normalize regression for the generative trainers."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from mm_vqa_healthcare_tpu.data.transforms import (
    ImageTransform, center_crop, resize_short_edge)
from mm_vqa_healthcare_tpu.ops.device_resize import (
    resize_crop, resize_crop_batch)


def _rand_image(w, h, seed=0):
    rng = np.random.default_rng(seed)
    # low-frequency content so bicubic differences are representative
    small = rng.integers(0, 255, (max(2, h // 8), max(2, w // 8), 3), np.uint8)
    return Image.fromarray(small).resize((w, h), Image.BICUBIC)


def _short_edge_spec(w, h, size):
    if w <= h:
        ow, oh = size, max(1, int(round(size * h / w)))
    else:
        oh, ow = size, max(1, int(round(size * w / h)))
    left = int(round((ow - size) / 2.0))
    top = int(round((oh - size) / 2.0))
    return np.asarray([0.0, top, h / oh, h, 0.0, left, w / ow, w],
                      np.float32)


@pytest.mark.parametrize("w,h", [(512, 512), (500, 375), (300, 481),
                                 (96, 128), (64, 64)])
def test_short_edge_center_crop_matches_pil(w, h):
    size, cap = 96, 512
    img = _rand_image(w, h, seed=w + h)
    ref = np.asarray(center_crop(resize_short_edge(img, size), size),
                     np.uint8).astype(np.float32)

    frame = np.zeros((cap, cap, 3), np.uint8)
    frame[:h, :w] = np.asarray(img, np.uint8)
    out = np.asarray(resize_crop(jnp.asarray(frame),
                                 jnp.asarray(_short_edge_spec(w, h, size)),
                                 size))
    assert out.shape == (size, size, 3)
    diff = np.abs(out - ref)
    # PIL uses int16 fixed-point filter coefficients; float weights land
    # within the fixed-point LSB
    assert diff.max() <= 2.0, diff.max()
    assert diff.mean() < 0.2, diff.mean()


def test_resized_crop_box_matches_pil():
    w, h, size, cap = 400, 320, 64, 512
    img = _rand_image(w, h, seed=7)
    left, top, cw, ch = 37, 22, 301, 255
    ref = np.asarray(
        img.crop((left, top, left + cw, top + ch)).resize(
            (size, size), Image.BICUBIC), np.uint8).astype(np.float32)

    frame = np.zeros((cap, cap, 3), np.uint8)
    frame[:h, :w] = np.asarray(img, np.uint8)
    spec = np.asarray([top, 0.0, ch / size, ch,
                       left, 0.0, cw / size, cw], np.float32)
    out = np.asarray(resize_crop(jnp.asarray(frame), jnp.asarray(spec), size))
    diff = np.abs(out - ref)
    assert diff.max() <= 2.0, diff.max()
    assert diff.mean() < 0.2, diff.mean()


def test_transform_device_mode_end_to_end():
    """ImageTransform(device_resize) -> collate -> prepare_image_batch
    reproduces the host transform pipeline within fixed-point tolerance."""
    from mm_vqa_healthcare_tpu.data.collate import collate
    from mm_vqa_healthcare_tpu.train.trainer import prepare_image_batch

    size, cap = 48, 256  # cap > every test image so no pre-cap resample
    host_tr = ImageTransform(key="clip", size=size,
                             mean=(0.5, 0.4, 0.3), std=(0.2, 0.25, 0.3))
    dev_tr = ImageTransform(key="clip", size=size,
                            mean=(0.5, 0.4, 0.3), std=(0.2, 0.25, 0.3),
                            device_resize=True, device_resize_cap=cap)
    rng = np.random.default_rng(0)
    items = []
    host_out = []
    for i, (w, h) in enumerate([(100, 80), (128, 128), (60, 90), (200, 64)]):
        img = _rand_image(w, h, seed=i)
        host_out.append(host_tr(img, rng))
        items.append({"image": [dev_tr(img, rng)], "text": ("q", {
            "input_ids": [1, 2], "attention_mask": [1, 1]})})
    batch = collate(items)
    assert batch["image"].shape == (4, cap, cap, 3)
    assert batch["image_spec"].shape == (4, 8)

    prepared = prepare_image_batch(
        {"image": jnp.asarray(batch["image"]),
         "image_spec": jnp.asarray(batch["image_spec"])},
        np.asarray([0.5, 0.4, 0.3], np.float32),
        np.asarray([0.2, 0.25, 0.3], np.float32), size)
    assert "image_spec" not in prepared
    dev = np.asarray(prepared["image"])
    ref = np.stack(host_out)
    # compare in the uint8 domain (un-normalize): per-pass fixed-point
    # rounding can cascade to a few LSB through the two resample passes
    std = np.asarray([0.2, 0.25, 0.3], np.float32)
    diff_u8 = np.abs(dev - ref) * std * 255.0
    assert diff_u8.max() <= 3.0, diff_u8.max()
    assert diff_u8.mean() < 0.3, diff_u8.mean()


def test_oversize_frame_precapped():
    tr = ImageTransform(key="clip", size=48, mean=(0.5,) * 3, std=(0.2,) * 3,
                        device_resize=True, device_resize_cap=96)
    frame, spec = tr(_rand_image(300, 200, seed=3),
                     np.random.default_rng(0))
    assert frame.shape == (96, 96, 3)
    # long edge capped to 96 keeping aspect -> 96x64 content
    assert frame[:64, :96].any()
    assert not frame[64:].any()
    assert spec[7] == 96.0 and spec[3] == 64.0


def test_generative_trainers_normalize_uint8(tmp_path):
    """Regression: with device_transforms=True (the production default) the
    decoder trainer must normalize uint8 batches inside the step — the
    round-2 audit found raw 0..255 values flowing into M3AE.  Loss must
    match the host-float path exactly (both paths quantize through uint8)."""
    from tests import fixtures
    from mm_vqa_healthcare_tpu.train.decoder_trainer import DecoderTrainer

    data_root, label2ans, vocab = fixtures.make_vqa_fixture(str(tmp_path))

    losses = {}
    for device_tf in (False, True):
        cfg = fixtures.tiny_config(data_root, vocab, label2ans,
                                   device_transforms=device_tf,
                                   max_epoch=1, host_decode=True)
        tr = DecoderTrainer(cfg)
        tr.setup_data()
        tr.init_params()
        tr.setup_optimizer(steps_per_epoch=1)
        batch = next(iter(tr.dm.train_loader(0)))
        if device_tf:
            assert batch["image"].dtype == np.uint8
        dev = tr._device_batch(batch, with_targets=True)
        step = tr._get_jitted("train")
        _, _, loss, _ = step(tr.params, tr.opt_state, dev,
                             jax.random.key(0))
        losses[device_tf] = float(loss)
    assert np.isclose(losses[False], losses[True], rtol=1e-5), losses


def test_classifier_trainer_device_resize_eval_parity(tmp_path):
    """Full classifier Trainer with device_resize=True: eval loss matches
    the host-PIL path within the documented 2/255-per-pixel tolerance."""
    from tests import fixtures
    from mm_vqa_healthcare_tpu.train.trainer import Trainer

    data_root, label2ans, vocab = fixtures.make_vqa_fixture(str(tmp_path))
    losses = {}
    for dev_resize in (False, True):
        cfg = fixtures.tiny_config(data_root, vocab, label2ans,
                                   device_transforms=True,
                                   device_resize=dev_resize,
                                   device_resize_cap=64)
        tr = Trainer(cfg)
        tr.setup_data()
        tr.init_params()
        batch = next(iter(tr.dm.val_loader()))
        if dev_resize:
            assert batch["image"].shape[1:] == (64, 64, 3)
            assert "image_spec" in batch
        dev = tr._device_batch(batch)
        step = tr._get_jitted("eval")
        aux = step(tr.params, dev)
        losses[dev_resize] = float(aux["loss"])
    assert np.isclose(losses[False], losses[True], rtol=2e-2), losses
