"""Torch oracles for parity tests.

The reference's torch modules are used as *test oracles only* (never at
runtime): clip_model.py is loaded directly from /root/reference when
available (it depends only on torch/numpy/tqdm), bypassing the package
__init__ which needs pytorch_lightning.  HF transformers BertModel serves
as the text-encoder oracle.
"""

import importlib.util
import os

REFERENCE_ROOT = os.environ.get("MMVQA_REFERENCE", "/root/reference")


def load_reference_module(rel_path: str, name: str):
    path = os.path.join(REFERENCE_ROOT, rel_path)
    if not os.path.isfile(path):
        return None
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception:
        return None
    return mod


def reference_clip_model():
    return load_reference_module(
        "m3ae/modules/vision_encoders/clip_model.py", "ref_clip_model")
