"""Checkpoint save/load.

Two formats:
  * native: flax msgpack of the param pytree + JSON config sidecar
    (fast, dependency-light, resume-friendly),
  * reference-compatible torch export: a PL-style ``.ckpt`` dict with
    ``state_dict`` in the reference's exact naming (so our fine-tuned
    models run in the reference stack, the mirror of loading theirs —
    SURVEY.md §5 checkpoint contract).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np


def save_native(path: str, params, config: Optional[Dict[str, Any]] = None,
                extra: Optional[Dict[str, Any]] = None):
    from flax import serialization
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))
    if config is not None:
        with open(path + ".config.json", "w") as f:
            json.dump({"config": _jsonable(config), "extra": _jsonable(extra or {})}, f)


def load_native(path: str, params_template):
    from flax import serialization
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(params_template, data)


def _jsonable(obj):
    if isinstance(obj, dict):
        return {str(k): _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return str(obj)


def save_orbax(path: str, params):
    """Async, sharding-aware checkpointing via orbax (multi-host native
    saves; msgpack `save_native` remains the light-weight default)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_orbax(path: str, params_template):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), params_template)


def save_train_state(path: str, params, opt_state, step: int,
                     config: Optional[Dict[str, Any]] = None):
    """Resumable checkpoint: params + optimizer state + step counter
    (the working version of the reference's dead `resume_from` key)."""
    from flax import serialization
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {"params": serialization.to_bytes(params),
               "opt_state": serialization.to_bytes(opt_state),
               "step": step}
    import pickle
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    if config is not None:
        with open(path + ".config.json", "w") as f:
            json.dump(_jsonable(config), f)


def load_train_state(path: str, params_template, opt_state_template):
    from flax import serialization
    import pickle
    with open(path, "rb") as f:
        payload = pickle.load(f)
    params = serialization.from_bytes(params_template, payload["params"])
    opt_state = serialization.from_bytes(opt_state_template,
                                         payload["opt_state"])
    return params, opt_state, payload["step"]


def export_torch_ckpt(path: str, params, model_cfg,
                      config: Optional[Dict[str, Any]] = None):
    """Write a reference-loadable PL-style checkpoint."""
    import torch
    from mm_vqa_healthcare_tpu.checkpoint.convert import (
        params_to_torch_state_dict)
    sd = params_to_torch_state_dict(params, model_cfg)
    state_dict = {k: torch.from_numpy(np.ascontiguousarray(v))
                  for k, v in sd.items()}
    payload = {"state_dict": state_dict}
    if config is not None:
        payload["hyper_parameters"] = {"config": _jsonable(config)}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    torch.save(payload, path)
