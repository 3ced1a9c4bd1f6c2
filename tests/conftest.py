"""Test configuration.

The suite runs on a CPU backend with 8 virtual devices, so multi-chip
sharding is exercised on a simulated mesh (the TPU-native equivalent of
testing multi-node without a cluster — SURVEY.md §4).

Bootstrap problem: the axon TPU plugin is registered by a sitecustomize
on PYTHONPATH (/root/.axon_site) at *interpreter startup*, before this
conftest runs, and the ambient env pins JAX_PLATFORMS=axon.  Clearing the
env here is too late — jax already owns a 1-device TPU backend.  So when
we detect the axon env (PALLAS_AXON_POOL_IPS set) we re-exec pytest in a
scrubbed environment (sitecustomize no-ops when PALLAS_AXON_POOL_IPS is
empty).  The re-exec happens in pytest_configure, after stopping pytest's
global fd capture — otherwise the child inherits the redirected fds and
its output vanishes.

Escape hatch: MMVQA_TPU_TESTS=1 skips the re-exec so @pytest.mark.tpu
tests run on the real axon backend (see run_scripts/test_tpu.sh).
"""

import os
import sys

_ON_TPU_LANE = os.environ.get("MMVQA_TPU_TESTS") == "1"
_NEEDS_REEXEC = (not _ON_TPU_LANE
                 and os.environ.get("MMVQA_PYTEST_CHILD") != "1"
                 and bool(os.environ.get("PALLAS_AXON_POOL_IPS")))

if not _NEEDS_REEXEC and not _ON_TPU_LANE:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


def pytest_configure(config):
    if not _NEEDS_REEXEC:
        return
    env = dict(os.environ)
    env["MMVQA_PYTEST_CHILD"] = "1"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=8")
    env["XLA_FLAGS"] = " ".join(flags)
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    sys.stderr.write(
        "[conftest] axon TPU plugin detected; re-exec'ing pytest on a "
        "virtual 8-device CPU mesh\n")
    sys.stderr.flush()
    args = list(config.invocation_params.args)
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + args, env)


# Fast smoke tier (`pytest -m fast`, run_scripts/test_fast.sh): <2 min on
# this 1-vCPU host.  Whole modules here are cheap end to end; heavier
# modules contribute individual tests via explicit @pytest.mark.fast.
# The full suite stays the round-end gate (SURVEY.md §4).
_FAST_MODULES = {
    "test_config.py",          # config composition + run-script grammar
    "test_metrics.py",         # metric semantics incl. bug-compat quirks
    "test_attention_sharding.py",  # pallas-under-GSPMD partitioning
    "test_prepro.py",          # arrow writers + glossary
}


def pytest_collection_modifyitems(config, items):
    import os as _os
    import jax
    on_tpu = jax.default_backend() == "tpu"
    skip = pytest.mark.skip(reason="requires real TPU")
    # Convergence tier: calibrated multi-hundred-step overfit lanes cost
    # ~1h together (wrapper-timeout scale — the mechanism behind two
    # truncated round-end artifacts).  Run them explicitly with
    # `-m convergence` or MMVQA_CONVERGENCE=1; the default tier keeps
    # reduced-step learning coverage (test_learning_smoke.py).
    markexpr = config.getoption("-m") or ""
    want_conv = (("convergence" in markexpr
                  and "not convergence" not in markexpr)
                 or _os.environ.get("MMVQA_CONVERGENCE") == "1")
    skip_conv = pytest.mark.skip(
        reason="calibrated convergence lane; run with -m convergence")
    for item in items:
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(skip)
        if "convergence" in item.keywords and not want_conv:
            item.add_marker(skip_conv)
        if _os.path.basename(str(item.fspath)) in _FAST_MODULES:
            item.add_marker(pytest.mark.fast)
