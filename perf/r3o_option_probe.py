"""Existence probe for proto-backed XLA TPU options via jit
compiler_options (the only flag path that reaches the remote compiler —
core/compile.py). A bogus name errors fast from the remote compiler
(~seconds on a tiny program), so candidate names can be screened cheaply
before spending a ~15-min full-sampler measurement on any of them.

Run on the real TPU when idle."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

CANDIDATES = [
    # (name, value) — fusion/scheduling knobs plausibly relevant to the
    # sampler's conv/GEMM bucket (the 13%-to-bound residual, STATUS.md)
    ("xla_tpu_enable_latency_hiding_scheduler", "true"),
    ("xla_tpu_enable_multi_level_nested_loop_fusion", "true"),
    ("xla_tpu_rwb_fusion", "false"),
    ("xla_tpu_enable_dot_strength_reduction", "false"),
    ("xla_tpu_dot_dot_fusion", "true"),
    ("xla_tpu_dot_dot_fusion_duplicated", "true"),
    ("xla_tpu_enable_aggressive_broadcast_priority_update", "true"),
    ("xla_tpu_use_repeated_instance_for_preferred_prefetch_time", "true"),
    ("xla_tpu_enable_vmem_to_vmem_dmas", "true"),
    ("xla_tpu_vector_load_fusion_level", "2"),
    ("xla_tpu_enable_experimental_fusion_cost_model", "true"),
    ("xla_tpu_async_copy_bandwidth_scaling_factor", "1.0"),
    ("xla_tpu_memory_bound_loop_optimizer_options", "enabled:true"),
    ("xla_tpu_enable_copy_fusion", "true"),
    ("xla_tpu_licm_size_inflation_ratio", "1.0"),
    ("xla_tpu_prefer_async_allocations", "true"),
]

x = jnp.ones((256, 256), jnp.bfloat16)
f = lambda a: a @ a

for name, value in CANDIDATES:
    try:
        jax.jit(f).lower(x).compile(compiler_options={name: value})
        print(json.dumps({"option": name, "value": value, "exists": True}),
              flush=True)
    except Exception as e:
        msg = f"{type(e).__name__}: {e}"[:160]
        print(json.dumps({"option": name, "value": value, "exists": False,
                          "error": msg}), flush=True)
