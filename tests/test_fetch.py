"""Pretrained-weight bootstrap (checkpoint/fetch.py): cache + SHA256
policy and state-dict loading, exercised offline via file:// URLs."""

import hashlib
import os

import numpy as np
import pytest

from mm_vqa_healthcare_tpu.checkpoint import fetch as F


def _write(path, data: bytes):
    with open(path, "wb") as f:
        f.write(data)
    return hashlib.sha256(data).hexdigest()


def test_sha_from_clip_url():
    url = F.CLIP_WEIGHT_URLS["ViT-B/16"]
    assert F.sha_from_clip_url(url) == (
        "5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f")
    assert F.sha_from_clip_url(
        F.SWIN_WEIGHT_URLS["swin_base_patch4_window12_384_in22k"]) is None


def test_fetch_download_verify_and_cache(tmp_path):
    src = tmp_path / "src" / "weights.bin"
    src.parent.mkdir()
    sha = _write(src, b"pretrained-bytes")
    cache = str(tmp_path / "cache")
    url = "file://" + str(src)

    got = F.fetch(url, cache_dir=cache, expected_sha256=sha)
    assert open(got, "rb").read() == b"pretrained-bytes"

    # corrupt the cache entry -> re-downloaded (with a warning)
    _write(got, b"corrupted")
    with pytest.warns(UserWarning):
        got2 = F.fetch(url, cache_dir=cache, expected_sha256=sha)
    assert open(got2, "rb").read() == b"pretrained-bytes"

    # no checksum known -> existing cache trusted as-is
    _write(got, b"locally-seeded")
    got3 = F.fetch(url, cache_dir=cache)
    assert open(got3, "rb").read() == b"locally-seeded"


def test_fetch_bad_checksum_raises(tmp_path):
    src = tmp_path / "w.bin"
    _write(src, b"payload")
    with pytest.raises(RuntimeError, match="SHA256"):
        F.fetch("file://" + str(src), cache_dir=str(tmp_path / "c"),
                expected_sha256="0" * 64)
    assert not os.path.exists(tmp_path / "c" / "w.bin")  # partial removed


def test_fetch_pretrained_unknown():
    with pytest.raises(KeyError, match="vit='nope'"):
        F.fetch_pretrained("nope")


def test_load_state_dict_plain_and_timm_wrapper(tmp_path):
    torch = pytest.importorskip("torch")
    sd = {"a.weight": torch.arange(6, dtype=torch.float32).reshape(2, 3)}
    p1 = str(tmp_path / "plain.pth")
    torch.save(sd, p1)
    out = F.load_state_dict(p1)
    np.testing.assert_array_equal(
        out["a.weight"], np.arange(6, dtype=np.float32).reshape(2, 3))

    p2 = str(tmp_path / "timm.pth")
    torch.save({"model": sd}, p2)
    out = F.load_state_dict(p2)
    assert set(out) == {"a.weight"}


def test_load_state_dict_torchscript(tmp_path):
    torch = pytest.importorskip("torch")
    mod = torch.jit.script(torch.nn.Linear(3, 2))
    p = str(tmp_path / "scripted.pt")
    torch.jit.save(mod, p)
    out = F.load_state_dict(p)
    assert out["weight"].shape == (2, 3)
    assert out["bias"].shape == (2,)
