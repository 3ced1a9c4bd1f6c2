"""Worker process for the 2-process multi-host simulation
(tests/test_multihost.py).  Exercises parallel/collectives.py and the
process-strided loader (data/datamodule.py) with jax.process_count() > 1 —
the localhost stand-in for a TPU pod's per-host processes
(reference: m3ae/modules/dist_utils.py:143-237).

argv: process_id num_processes coordinator_port fixture_root out_json
"""

import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    root = sys.argv[4]
    out_path = sys.argv[5]

    import jax
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    import numpy as np

    from mm_vqa_healthcare_tpu.parallel import collectives as C

    assert C.process_count() == nproc, C.process_count()
    assert C.process_index() == pid
    assert C.is_main_process() == (pid == 0)

    # object all_gather (the gloo replacement)
    objs = C.all_gather_object({"pid": pid, "tag": "x" * (pid + 1)})
    assert [o["pid"] for o in objs] == list(range(nproc)), objs

    # array all_gather
    arr = C.all_gather_arrays(np.full((2, 3), pid, np.int32))
    assert arr.shape == (2 * nproc, 3), arr.shape

    # shared seed agreement
    seed = C.shared_random_seed()
    seeds = C.all_gather_object(seed)
    assert len(set(seeds)) == 1, seeds

    C.barrier()

    # process-strided loader: each host must see a disjoint shard
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    from tests.fixtures import tiny_config
    from mm_vqa_healthcare_tpu.data.datamodule import MTDataModule

    cfg = tiny_config(os.path.join(root, "arrows"),
                      os.path.join(root, "vocab.txt"),
                      per_gpu_batchsize=1, batch_size=2)
    dm = MTDataModule(cfg, dist=True, device_count=1)
    dm.setup()
    texts = []
    for batch in dm.train_loader(0):
        texts.extend(str(t) for t in batch["text"])

    with open(out_path, "w") as f:
        json.dump({"pid": pid, "seed": int(seed), "texts": texts,
                   "gathered_pids": [o["pid"] for o in objs]}, f)
    print(f"worker {pid}: OK ({len(texts)} samples)")


if __name__ == "__main__":
    main()
