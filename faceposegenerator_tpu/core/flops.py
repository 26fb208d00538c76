"""FLOPs / cost estimation from compiled XLA programs.

TPU-native replacement for the reference's unused `countFLOPS.py`
(`Evaluation/PyEER_analysis/utils/countFLOPS.py:6`, SURVEY.md §5): instead
of re-deriving per-layer formulas, ask the compiler —
`jax.jit(f).lower(*args).compile().cost_analysis()` reports flops and bytes
for the exact program that will run.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax


def cost_analysis(fn: Callable, *example_args, **example_kwargs) -> Dict[str, float]:
    """Returns {"flops": ..., "bytes_accessed": ..., ...} for the compiled fn."""
    compiled = jax.jit(fn).lower(*example_args, **example_kwargs).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns a list per computation
        cost = cost[0] if cost else {}
    return dict(cost or {})


def flops(fn: Callable, *example_args, **example_kwargs) -> Optional[float]:
    return cost_analysis(fn, *example_args, **example_kwargs).get("flops")


def summarize(fn: Callable, *example_args, peak_flops_per_sec: Optional[float] = None, runtime_s: Optional[float] = None) -> Dict:
    """Cost summary, optionally with achieved-utilisation given a measured
    runtime and the chip's peak (e.g. 197e12 for v5e bf16)."""
    cost = cost_analysis(fn, *example_args)
    out = {"flops": cost.get("flops"), "bytes_accessed": cost.get("bytes accessed", cost.get("bytes_accessed"))}
    if runtime_s and out["flops"]:
        out["achieved_flops_per_sec"] = out["flops"] / runtime_s
        if peak_flops_per_sec:
            out["mxu_utilization"] = out["achieved_flops_per_sec"] / peak_flops_per_sec
    return out
