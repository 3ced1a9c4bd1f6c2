"""Metric logging / observability.

The reference logs through PL self.log into TensorBoard + W&B
(main.py:32-34).  Here: structured JSONL event log (one line per step
dict — greppable, plottable, no deps) + stdout, with optional TensorBoard
and W&B sinks when those packages are importable (W&B auth via
WANDB_API_KEY env var; the reference's committed key is not replicated).
Also houses the step-time / samples-per-sec meters (the SURVEY.md §5
tracing rebuild) and jax.profiler trace capture helpers.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Optional


class MetricLogger:
    def __init__(self, log_dir: str, exp_name: str, seed: int = 0):
        self.run_name = f"{exp_name}_seed{seed}"
        self.log_dir = os.path.join(log_dir, self.run_name)
        os.makedirs(self.log_dir, exist_ok=True)
        self._fh = open(os.path.join(self.log_dir, "metrics.jsonl"), "a")
        # TensorBoard event sink (reference main.py:32-34 logs TB+W&B);
        # disable with MMVQA_NO_TENSORBOARD=1
        self._tb = None
        if not os.environ.get("MMVQA_NO_TENSORBOARD"):
            with contextlib.suppress(Exception):
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(
                    log_dir=os.path.join(self.log_dir, "tb"))
        self._wandb = None
        if os.environ.get("WANDB_API_KEY"):
            with contextlib.suppress(Exception):
                import wandb
                self._wandb = wandb.init(project=exp_name, name=self.run_name)

    def log_step(self, phase: str, step: int, metrics: Dict[str, Any]):
        record = {"phase": phase, "step": step, "time": time.time()}
        record.update({k: _to_py(v) for k, v in metrics.items()})
        self._fh.write(json.dumps(record) + "\n")
        self._fh.flush()
        short = ", ".join(f"{k}={_fmt(v)}" for k, v in metrics.items()
                          if isinstance(v, (int, float)))
        print(f"[{phase} step {step}] {short}")
        if self._tb is not None:
            for k, v in metrics.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(f"{phase}/{k}", v, global_step=step)
        if self._wandb is not None:
            self._wandb.log({f"{phase}/{k}": v for k, v in metrics.items()},
                            step=step)

    def close(self):
        if self._tb is not None:
            self._tb.close()
        self._fh.close()


def _to_py(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return str(v)


def _fmt(v):
    return f"{v:.5g}" if isinstance(v, float) else str(v)


class StepTimer:
    """Rolling samples/sec + step-time meter (perf observability)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times = []
        self._last = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
        self._last = now

    @property
    def steady_times(self):
        return self.times[self.warmup:] if len(self.times) > self.warmup else self.times

    def mean_step_time(self) -> float:
        ts = self.steady_times
        return sum(ts) / len(ts) if ts else float("nan")

    def samples_per_sec(self, batch_size: int) -> float:
        st = self.mean_step_time()
        return batch_size / st if st and st == st else float("nan")


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler trace capture (SURVEY.md §5 tracing rebuild)."""
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
