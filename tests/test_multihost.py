"""Two-process multi-host simulation (VERDICT r1 #7).

Spawns 2 localhost CPU processes connected through
jax.distributed.initialize and checks parallel/collectives.py (object
all_gather, array all_gather, shared seed, barrier) plus the
process-strided data loader: the two processes must see disjoint shards
that together cover the dataset.  This is the TPU-native equivalent of the
reference's num_nodes>1 DDP path (main.py:60-63, dist_utils.py:143-237).
"""

import json
import os
import socket
import subprocess
import sys

from tests.fixtures import make_vqa_fixture


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_collectives_and_strided_loader(tmp_path):
    root = str(tmp_path)
    make_vqa_fixture(root)
    # fixture layout expected by the worker
    assert os.path.isdir(os.path.join(root, "arrows"))

    port = _free_port()
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("MMVQA_PYTEST_CHILD", None)

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # the worker runs as a script (sys.path[0] = tests/), so the package
    # root must come from PYTHONPATH — don't rely on the ambient value
    env["PYTHONPATH"] = repo
    procs, outs = [], []
    for pid in range(2):
        out = os.path.join(root, f"out{pid}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), root, out],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=540)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    results = [json.load(open(o)) for o in outs]
    # both agreed on the seed
    assert results[0]["seed"] == results[1]["seed"]
    assert results[0]["gathered_pids"] == [0, 1]
    # disjoint shards covering the dataset (8 train samples, stride 2)
    t0, t1 = (set(r["texts"]) for r in results)
    assert len(results[0]["texts"]) + len(results[1]["texts"]) == 8
    assert not (t0 & t1), (t0, t1)


def test_two_process_train_step(tmp_path):
    """DP-over-DCN end-to-end (VERDICT r3 #6): the REAL jitted classifier
    train step on a 2-device mesh split across 2 processes must produce
    the same loss trajectory and updated params as the same program on 2
    local devices — i.e. the cross-process gradient psum equals the
    single-process reduction (reference multi-node DDP all-reduce,
    dist_utils.py / main.py:60-63)."""
    root = str(tmp_path)
    make_vqa_fixture(root)

    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("MMVQA_PYTEST_CHILD", None)
    worker = os.path.join(os.path.dirname(__file__),
                          "multihost_step_worker.py")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo

    def run(nproc):
        port = _free_port()
        procs, outs, logs = [], [], []
        e = dict(env)
        e["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                          + ("1" if nproc > 1 else "2"))
        for pid in range(nproc):
            out = os.path.join(root, f"step_out{nproc}_{pid}.json")
            outs.append(out)
            procs.append(subprocess.Popen(
                [sys.executable, worker, str(pid), str(nproc), str(port),
                 root, out], env=e, cwd=repo,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
        for p in procs:
            stdout, _ = p.communicate(timeout=540)
            logs.append(stdout.decode(errors="replace"))
        for p, log in zip(procs, logs):
            assert p.returncode == 0, f"step worker failed:\n{log[-3000:]}"
        return [json.load(open(o)) for o in outs]

    multi = run(2)
    single = run(1)

    # the two processes saw the same (replicated) loss
    assert multi[0]["losses"] == multi[1]["losses"]
    # decreasing-ish finite losses
    for l in multi[0]["losses"]:
        assert l == l and abs(l) < 1e6
    # cross-process psum == single-process reduction
    for lm, ls in zip(multi[0]["losses"], single[0]["losses"]):
        assert abs(lm - ls) < 1e-5 * max(1.0, abs(ls)), (
            multi[0]["losses"], single[0]["losses"])
    assert abs(multi[0]["fp"] - single[0]["fp"]) < 1e-4 * max(
        1.0, abs(single[0]["fp"]))
