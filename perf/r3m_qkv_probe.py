"""Microbench: are the UNet's separate q/k/v/out projections leaving HBM
bandwidth on the table vs a horizontally-packed QKV GEMM? XLA has a
dot-merger pass; this measures whether it fires at the SD2.1 shapes on
this toolchain before any UNet surgery. Shapes: level-1 transformer at the
bs8 op point (CFG batch 16, S=4096, C=320) and level-2 (S=1024, C=640).

Run on the real TPU after the r3l validation queue.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench(fn, *args, n=50):
    c = jax.jit(fn).lower(*args).compile()
    out = c(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = c(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


for B, S, C in ((16, 4096, 320), (16, 1024, 640)):
    x = jax.random.normal(jax.random.key(0), (B, S, C), jnp.bfloat16)
    wq = jax.random.normal(jax.random.key(1), (C, C), jnp.bfloat16)
    wk = jax.random.normal(jax.random.key(2), (C, C), jnp.bfloat16)
    wv = jax.random.normal(jax.random.key(3), (C, C), jnp.bfloat16)
    wpacked = jnp.concatenate([wq, wk, wv], axis=1)  # (C, 3C)

    def separate(x, wq, wk, wv):
        f = lambda w: jax.lax.dot_general(
            x, w, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)
        return f(wq), f(wk), f(wv)

    def packed(x, w):
        o = jax.lax.dot_general(
            x, w, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)
        return o[..., :C], o[..., C:2 * C], o[..., 2 * C:]

    def packed_concat_inside(x, wq, wk, wv):
        # what the UNet could do per-call without changing the param pytree
        w = jnp.concatenate([wq, wk, wv], axis=1)
        return packed(x, w)

    r = {
        "shape": f"B{B}_S{S}_C{C}",
        "separate_ms": round(bench(separate, x, wq, wk, wv), 3),
        "packed_ms": round(bench(packed, x, wpacked), 3),
        "packed_concat_inside_ms": round(
            bench(packed_concat_inside, x, wq, wk, wv), 3
        ),
    }
    print(json.dumps(r), flush=True)
