"""w8a8 dense probe at the UNet's real shapes — where does the 2.07× go?

rate_probe_v4 (perf/r3ah_queue.jsonl) established pure int8 dots at 2.07×
bf16 (367 vs 177 TOPS) at 8192×4096². Yet end-to-end, QUANT_DENSE_IMPL=
int8 vs dequant is a wash (2.327 vs 2.312 img/s) — the dynamic-quant
overhead must be eating the MXU win at the UNet's small contraction
widths. This probe measures, with the same RTT-cancelling differenced
chains (rate = work·ΔREPS / Δt), FOUR dense impls at the sampler's three
transformer level shapes (bs8 CFG → 16 samples; tokens × width):

    L1: 65536 × 320     L2: 16384 × 640     L3: 4096 × 1280

  bf16      — bf16 dot, fp32 accumulate (the exact path)
  w8a8_dyn  — per-token amax → int8 quantize → int8 dot → fp32 rescale
              (ops/quant.qdense, the current QUANT_DENSE_IMPL=int8 body)
  int8_preq — int8-resident chain (v4's ceiling: dot cost alone)
  w8_deq    — int8 weights dequantized into a bf16 dot (dense weight
              stream halved, activations exact; QUANT_DENSE_IMPL=dequant)

If w8a8_dyn ≈ bf16 but int8_preq ≈ 2×, the gap is the act-quant HBM
passes + fp32 epilogue → a fused Pallas quantize-dot kernel (x read once,
quantized in VMEM, int8 MXU, scaled write) is the lever.
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp

REPS_LO, REPS_HI = 4, 36
SHAPES = [(65536, 320), (16384, 640), (4096, 1280)]
_EPS = 1e-8


def fetch(y):
    return float(jnp.max(jnp.abs(y[0, :8]).astype(jnp.float32)))


def timeit(fn, make_args, repeats=5):
    fetch(fn(*make_args(0)))  # compile
    times = []
    for i in range(repeats):
        args = make_args(i + 1)
        t0 = time.perf_counter()
        fetch(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


@partial(jax.jit, static_argnames=("reps",))
def bf16_chain(x, w, reps):
    def body(c, _):
        y = jax.lax.dot(c, w, preferred_element_type=jnp.float32)
        return (y * 1e-3).astype(jnp.bfloat16), None

    y, _ = jax.lax.scan(body, x, None, length=reps)
    return y


@partial(jax.jit, static_argnames=("reps",))
def w8a8_dyn_chain(x, wq, ws, reps):
    def body(c, _):
        cf = c.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(cf), axis=-1, keepdims=True), _EPS) / 127.0
        xq = jnp.clip(jnp.round(cf / sx), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot(xq, wq, preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sx * ws
        return (y * 1e-3).astype(jnp.bfloat16), None

    y, _ = jax.lax.scan(body, x, None, length=reps)
    return y


@partial(jax.jit, static_argnames=("reps",))
def int8_preq_chain(xq, wq, reps):
    def body(c, _):
        y = jax.lax.dot(c, wq, preferred_element_type=jnp.int32)
        return jax.lax.shift_right_arithmetic(y, 7).astype(jnp.int8), None

    y, _ = jax.lax.scan(body, xq, None, length=reps)
    return y


@partial(jax.jit, static_argnames=("reps",))
def w8_deq_chain(x, wq, ws, reps):
    def body(c, _):
        w = wq.astype(jnp.bfloat16) * ws.astype(jnp.bfloat16)
        y = jax.lax.dot(c, w, preferred_element_type=jnp.float32)
        return (y * 1e-3).astype(jnp.bfloat16), None

    y, _ = jax.lax.scan(body, x, None, length=reps)
    return y


def main():
    out = {"device": str(jax.devices()[0]), "reps": [REPS_LO, REPS_HI], "shapes": {}}
    kx, kw = jax.random.split(jax.random.key(0))
    for S, K in SHAPES:
        flops = 2.0 * S * K * K

        def mk_bf16(i):
            return (
                jax.random.normal(jax.random.fold_in(kx, i), (S, K), jnp.bfloat16),
                jax.random.normal(kw, (K, K), jnp.bfloat16) * 0.01,
            )

        def mk_q(i):
            return (
                jax.random.normal(jax.random.fold_in(kx, i), (S, K), jnp.bfloat16),
                jax.random.randint(kw, (K, K), -127, 128, jnp.int8),
                jnp.full((K,), 1e-3, jnp.float32),
            )

        def mk_preq(i):
            return (
                jax.random.randint(jax.random.fold_in(kx, i), (S, K), -127, 128, jnp.int8),
                jax.random.randint(kw, (K, K), -127, 128, jnp.int8),
            )

        res = {}
        for name, fn, mk in (
            ("bf16", bf16_chain, mk_bf16),
            ("w8a8_dyn", w8a8_dyn_chain, mk_q),
            ("int8_preq", int8_preq_chain, mk_preq),
            ("w8_deq", w8_deq_chain, mk_q),
        ):
            t_lo = timeit(lambda *a, f=fn: f(*a, reps=REPS_LO), mk)
            t_hi = timeit(lambda *a, f=fn: f(*a, reps=REPS_HI), mk)
            dt = (t_hi - t_lo) / (REPS_HI - REPS_LO)
            res[name] = {
                "t_lo_s": round(t_lo, 4),
                "t_hi_s": round(t_hi, 4),
                "us_per_link": round(dt * 1e6, 1),
                "tops_diff": round(flops / dt / 1e12, 1),
            }
        for name in ("w8a8_dyn", "int8_preq", "w8_deq"):
            res[f"{name}_vs_bf16"] = round(
                res["bf16"]["us_per_link"] / res[name]["us_per_link"], 3
            )
        out["shapes"][f"{S}x{K}"] = res
    print(json.dumps(out))


if __name__ == "__main__":
    main()
