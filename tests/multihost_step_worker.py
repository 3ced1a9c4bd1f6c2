"""Worker for the 2-process multi-host TRAIN-STEP simulation
(tests/test_multihost.py::test_two_process_train_step).

Runs the REAL classifier train step (Trainer._train_step_fn via
_get_jitted, LeafFusedAdamW, mesh sharding) over a 2-device data mesh
whose devices live in TWO processes (1 CPU device each) — the TPU-native
stand-in for the reference's multi-node DDP gradient all-reduce
(main.py:60-63 num_nodes, dist_utils.py).  Each process feeds its
process-LOCAL half of a deterministic global batch; the parent compares
the loss trajectory and a param fingerprint against a single-process run
of the same program on 2 local devices — psum-of-grads across processes
must equal the single-process reduction.

argv: process_id num_processes coordinator_port fixture_root out_json
  num_processes == 1 -> single-process reference mode (no distributed
  init; XLA_FLAGS provides 2 local devices).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    root = sys.argv[4]
    out_path = sys.argv[5]

    import jax
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nproc, process_id=pid)
    import numpy as np

    from tests.fixtures import tiny_config
    from mm_vqa_healthcare_tpu.train.trainer import Trainer

    cfg = tiny_config(os.path.join(root, "arrows"),
                      os.path.join(root, "vocab.txt"),
                      mesh_shape={"data": 2},
                      per_gpu_batchsize=2, batch_size=4,
                      log_dir=os.path.join(root, f"logs{pid}_{nproc}"),
                      default_root_dir=os.path.join(root, f"ckpt{pid}"))
    t = Trainer(cfg)
    t.init_params()
    t.setup_optimizer(steps_per_epoch=4)

    # deterministic global batch, identical in both modes
    g = 4
    rng = np.random.default_rng(0)
    label_size = cfg["vqa_label_size"]
    host = {
        "image": rng.normal(size=(g, cfg["image_size"], cfg["image_size"],
                                  3)).astype(np.float32),
        "text_ids": rng.integers(5, 40, size=(g, cfg["max_text_len"]),
                                 dtype=np.int64).astype(np.int32),
        "text_masks": np.ones((g, cfg["max_text_len"]), np.int32),
        "vqa_targets": np.eye(label_size,
                              dtype=np.float32)[np.arange(g) % label_size],
        "answer_types": (np.arange(g) % 2).astype(np.int32),
    }
    if nproc > 1:
        lo = pid * (g // nproc)
        hi = lo + g // nproc
        host = {k: v[lo:hi] for k, v in host.items()}

    step = t._get_jitted("train")
    losses = []
    for i in range(3):
        dev = t._device_batch(host)
        rk = jax.random.fold_in(t.rng, i)
        t.params, t.opt_state, aux = step(t.params, t.opt_state, dev, rk)
        losses.append(float(jax.device_get(aux["loss"])))

    # param fingerprint over a replicated leaf subset (post-update)
    leaves = jax.tree_util.tree_leaves(t.params)
    fp = float(sum(float(jax.device_get(jax.numpy.sum(jax.numpy.abs(
        x.astype(jax.numpy.float32))))) for x in leaves[:8]))

    with open(out_path, "w") as f:
        json.dump({"pid": pid, "losses": losses, "fp": fp}, f)
    print(f"step-worker {pid}/{nproc}: OK losses={losses}")


if __name__ == "__main__":
    main()
