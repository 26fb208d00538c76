"""Probe: do jit `compiler_options` forward through the axon remote-compile
relay? Env XLA_FLAGS with TPU-only flags is a dead end (the LOCAL process's
CPU XLA fatals on unknown flags, and the terminal overrides libtpu args —
perf/r3c_flags.jsonl / /tmp/r3c_err.log), but the relay log advertises
"proto-backed xla_* flags are forwarded per-compile". If forwarding works,
`xla_tpu_scoped_vmem_limit_kib` unlocks flash blocks >1024 (block 2048 needs
42 MB scoped VMEM vs the 16 MB default — the r3c flashq2048 compile OOM).

Probes, each its own compile (run on the real TPU):
  1 bogus option name            → remote validation error ⇒ forwarding real
  2 flash block 2048, default    → expect scoped-vmem OOM (control)
  3 flash block 2048, vmem=64M   → compiles+runs ⇒ option takes effect
  4 attention microbench block 1024 (16M) vs 2048 (64M) timing
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from faceposegenerator_tpu.ops.flash_attention import flash_attention

# sampler bs8 level-1 self-attention shape: CFG batch 16, seq 4096, 5 heads
# of d=64 (packed to 3 head-pairs inside the kernel)
B, S, H, D = 16, 4096, 5, 64
q = jax.random.normal(jax.random.key(0), (B, S, H, D), jnp.bfloat16)
k = jax.random.normal(jax.random.key(1), (B, S, H, D), jnp.bfloat16)
v = jax.random.normal(jax.random.key(2), (B, S, H, D), jnp.bfloat16)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def run(tag, fn, opts, *args):
    try:
        t0 = time.perf_counter()
        c = jax.jit(fn).lower(*args).compile(compiler_options=opts)
        compile_s = time.perf_counter() - t0
        out = c(*args)
        float(jnp.sum(out))  # force host transfer (axon timing caveat)
        times = []
        for _ in range(30):
            t0 = time.perf_counter()
            out = c(*args)
            float(jnp.sum(out))
            times.append(time.perf_counter() - t0)
        emit(probe=tag, ok=True, best_ms=round(min(times) * 1e3, 2),
             compile_s=round(compile_s, 1))
    except Exception as e:
        emit(probe=tag, ok=False, error=f"{type(e).__name__}: {e}"[:300])


run("bogus_option", lambda x: x @ x, {"xla_definitely_not_a_real_option": "1"},
    jnp.ones((256, 256), jnp.bfloat16))

blk = lambda bq: (lambda a, b, c_: flash_attention(a, b, c_, block_q=bq, block_k=bq))
run("block2048_vmem_default", blk(2048), None, q, k, v)
run("block2048_vmem64m", blk(2048),
    {"xla_tpu_scoped_vmem_limit_kib": "65536"}, q, k, v)
run("block1024_vmem_default", blk(1024), None, q, k, v)
run("block1024_vmem64m", blk(1024),
    {"xla_tpu_scoped_vmem_limit_kib": "65536"}, q, k, v)
