"""Pretrained-weight bootstrap: SHA256-verified fetch + local cache.

TPU-native equivalent of the reference's cold-start machinery — the CLIP
`_download` helper (clip_model.py:199-221: cache under ~/.cache/clip,
SHA256 taken from the URL path, verify-before-reuse and after-download)
and timm's `download_cached_file` used by the Swin `load_pretrained` path
(swin_helpers.py:123-146).  URL tables are the reference's public weight
locations (clip_model.py:14-23, swin_transformer.py:41-81).

Network access is optional: `fetch(...)` first honours an existing cache
entry (verified when a checksum is known), so on air-gapped hosts you
pre-seed `cache_dir` and everything works offline.  `load_state_dict`
then reads either a torchscript archive (CLIP ships those) or a plain
torch pickle and returns numpy arrays ready for
checkpoint/convert.py:torch_state_dict_to_params.
"""

from __future__ import annotations

import hashlib
import os
import urllib.request
from typing import Dict, Optional

import numpy as np

# Reference clip_model.py:14-23 — sha256 is the second-to-last URL segment.
CLIP_WEIGHT_URLS = {
    "RN50": "https://openaipublic.azureedge.net/clip/models/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt",
    "RN101": "https://openaipublic.azureedge.net/clip/models/8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599/RN101.pt",
    "ViT-B/32": "https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
    "ViT-B/16": "https://openaipublic.azureedge.net/clip/models/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
    "ViT-L/14": "https://openaipublic.azureedge.net/clip/models/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt",
    "ViT-L/14@336px": "https://openaipublic.azureedge.net/clip/models/3035c92b350959924f9f00213499208652fc7ea050643e8b385c2dac08641f02/ViT-L-14-336px.pt",
}

# Reference swin_transformer.py default_cfgs (in22k presets the configs
# name, plus the 22k->1k fine-tunes).  timm release files carry no sha in
# the URL; integrity is checked only when a checksum is supplied.
SWIN_WEIGHT_URLS = {
    "swin_base_patch4_window7_224_in22k": "https://github.com/SwinTransformer/storage/releases/download/v1.0.0/swin_base_patch4_window7_224_22k.pth",
    "swin_base_patch4_window12_384_in22k": "https://github.com/SwinTransformer/storage/releases/download/v1.0.0/swin_base_patch4_window12_384_22k.pth",
    "swin_large_patch4_window12_384_in22k": "https://github.com/SwinTransformer/storage/releases/download/v1.0.0/swin_large_patch4_window12_384_22k.pth",
    "swin_base_patch4_window12_384": "https://github.com/SwinTransformer/storage/releases/download/v1.0.0/swin_base_patch4_window12_384_22kto1k.pth",
    "swin_base_patch4_window7_224": "https://github.com/SwinTransformer/storage/releases/download/v1.0.0/swin_base_patch4_window7_224_22kto1k.pth",
}

DEFAULT_CACHE = os.path.join(
    os.path.expanduser(os.environ.get("MMVQA_CACHE", "~/.cache/mmvqa")),
    "weights")


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for block in iter(lambda: f.read(1 << 20), b""):
            h.update(block)
    return h.hexdigest()


def sha_from_clip_url(url: str) -> Optional[str]:
    """CLIP URLs embed the sha256 as the second-to-last path segment
    (clip_model.py:203)."""
    seg = url.split("/")[-2]
    return seg if len(seg) == 64 and all(
        c in "0123456789abcdef" for c in seg) else None


def fetch(url: str, cache_dir: str = None,
          expected_sha256: Optional[str] = None) -> str:
    """Return a local path for `url`, downloading into the cache if needed.

    Cache-hit policy mirrors the reference: an existing file with a
    matching checksum is reused; a mismatching one is re-downloaded; a
    post-download mismatch raises (clip_model.py:206-221).  With no
    checksum available, an existing cache file is trusted as-is."""
    cache_dir = cache_dir or DEFAULT_CACHE
    os.makedirs(cache_dir, exist_ok=True)
    if expected_sha256 is None:
        expected_sha256 = sha_from_clip_url(url)
    target = os.path.join(cache_dir, os.path.basename(url))
    if os.path.exists(target) and not os.path.isfile(target):
        raise RuntimeError(f"{target} exists and is not a regular file")
    if os.path.isfile(target):
        if expected_sha256 is None or _sha256(target) == expected_sha256:
            return target
        import warnings
        warnings.warn(f"{target} exists but the SHA256 does not match; "
                      f"re-downloading")
    tmp = target + ".part"
    with urllib.request.urlopen(url) as src, open(tmp, "wb") as out:
        while True:
            buf = src.read(1 << 20)
            if not buf:
                break
            out.write(buf)
    if expected_sha256 is not None and _sha256(tmp) != expected_sha256:
        os.remove(tmp)
        raise RuntimeError(
            f"downloaded {url} but the SHA256 checksum does not match")
    os.replace(tmp, target)
    return target


def fetch_pretrained(vit_name: str, cache_dir: str = None) -> str:
    """Local path of the pretrained tower weights for a config `vit` name
    (CLIP or Swin), fetching on first use."""
    if vit_name in CLIP_WEIGHT_URLS:
        return fetch(CLIP_WEIGHT_URLS[vit_name], cache_dir)
    if vit_name in SWIN_WEIGHT_URLS:
        return fetch(SWIN_WEIGHT_URLS[vit_name], cache_dir)
    raise KeyError(
        f"no pretrained weights known for vit={vit_name!r}; available: "
        f"{sorted(CLIP_WEIGHT_URLS) + sorted(SWIN_WEIGHT_URLS)}")


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Torch checkpoint -> numpy state_dict.  Handles CLIP's torchscript
    archives (reference build_model tries torch.jit.load first,
    clip_model.py:259-270) and plain pickles, including timm-style
    {'model': state_dict} wrappers (swin_helpers.py:95-118)."""
    import torch
    try:
        sd = torch.jit.load(path, map_location="cpu").state_dict()
    except RuntimeError:
        sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if isinstance(sd, dict) and "model" in sd and all(
            hasattr(v, "numpy") for v in sd["model"].values()):
        sd = sd["model"]
    return {k: np.asarray(v.detach().cpu().numpy()) if hasattr(v, "detach")
            else np.asarray(v) for k, v in sd.items()}
