"""Metrics / logging / observability.

Rebuilds the reference's logging surface (SURVEY.md §5): `AverageMeter`
(`FR_training/utils/utils_logging.py:8-29`), the throughput/ETA callback
(`CallBackLogging`, `utils_callbacks.py:150-189` — samples/sec from
wall-clock), per-epoch loss means (`train_ID-Booth.py:1236-1238`), plus
TPU-native additions: images/sec/chip counters and a `jax.profiler` trace
context.
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import sys
import time
from typing import Dict, Optional


def setup_logging(output_dir: Optional[str] = None, name: str = "fpg") -> logging.Logger:
    """File + stdout handlers (reference `utils_logging.py:30-46`)."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(output_dir, "training.log"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / self.count if self.count else 0.0


class ThroughputLogger:
    """samples/sec + ETA, per-chip normalized (CallBackLogging equivalent)."""

    def __init__(
        self,
        frequency: int = 50,
        total_steps: Optional[int] = None,
        num_chips: int = 1,
        logger: Optional[logging.Logger] = None,
    ):
        self.frequency = frequency
        self.total_steps = total_steps
        self.num_chips = max(num_chips, 1)
        self.logger = logger or logging.getLogger("fpg")
        self.t0 = time.time()
        self.last_step = 0

    def __call__(self, step: int, batch_size: int, metrics: Optional[Dict] = None):
        if step % self.frequency != 0 or step == self.last_step:
            return None
        dt = time.time() - self.t0
        steps_done = step - self.last_step
        sps = steps_done * batch_size / dt if dt > 0 else 0.0
        info = {
            "step": step,
            "samples_per_sec": round(sps, 2),
            "samples_per_sec_per_chip": round(sps / self.num_chips, 2),
        }
        if self.total_steps:
            remaining = (self.total_steps - step) / max(steps_done / dt, 1e-9)
            info["eta_hours"] = round(remaining / 3600, 3)
        if metrics:
            info.update({k: round(float(v), 5) for k, v in metrics.items()})
        self.logger.info(json.dumps(info))
        self.t0 = time.time()
        self.last_step = step
        return info


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace context — the TPU-native replacement for the
    reference's absent profiling layer (SURVEY.md §5 tracing)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def nan_check(tree, name: str = "tree") -> bool:
    """Debug-mode NaN detector (SURVEY.md §5 race-detection stand-in)."""
    import jax
    import jax.numpy as jnp

    bad = []

    def check(path, x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            if not bool(jnp.isfinite(x).all()):
                bad.append(jax.tree_util.keystr(path))

    jax.tree_util.tree_map_with_path(check, tree)
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad[:10]}")
    return True
