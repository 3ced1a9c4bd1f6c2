"""Host/object collectives (reference m3ae/modules/dist_utils.py).

The reference keeps a gloo side-group to all_gather picklable objects
(dist_utils.py:83-223) for retrieval eval; the TPU-native equivalents:

  * array collectives in the compute path are XLA collectives emitted from
    sharding annotations (nothing to write by hand),
  * host-side object/array gathering across processes goes through
    jax.experimental.multihost_utils,
  * `shared_random_seed` (dist_utils.py:226-237) broadcasts a seed so all
    hosts agree.

All functions degrade to no-ops in single-process runs (the common case on
a TPU VM, where one process drives all local chips).
"""

from __future__ import annotations

from typing import Any, List

import jax
import numpy as np


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def all_gather_arrays(x: np.ndarray) -> np.ndarray:
    """Gather per-host arrays (same shape) -> concatenated along axis 0."""
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(np.asarray(x))
    return np.asarray(gathered).reshape((-1,) + x.shape[1:])


def all_gather_object(obj: Any) -> List[Any]:
    """Gather arbitrary picklable objects from every process (the gloo
    all_gather replacement, dist_utils.py:143-169)."""
    if jax.process_count() == 1:
        return [obj]
    import pickle
    from jax.experimental import multihost_utils
    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    # pad to the max length across hosts
    length = np.asarray([payload.size], np.int64)
    lengths = all_gather_arrays(length)
    max_len = int(lengths.max())
    padded = np.zeros(max_len, np.uint8)
    padded[: payload.size] = payload
    blobs = multihost_utils.process_allgather(padded)
    out = []
    for i in range(jax.process_count()):
        out.append(pickle.loads(bytes(np.asarray(blobs[i])[: int(lengths[i])])))
    return out


def shared_random_seed() -> int:
    """All hosts agree on one random seed (dist_utils.py:226-237)."""
    seed = np.random.randint(2 ** 31)
    seeds = all_gather_object(seed)
    return int(seeds[0])


def barrier():
    """Cross-host sync point (torch.distributed.barrier equivalent)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("mmvqa_barrier")
