"""int8 MXU rate probe, take 2 — with the epilogue cost isolated.

The r3ae probe chained tanh+requantize between links and measured bf16
GEMM at 54 TFLOP/s (27% MFU) — the epilogue polluted the rate, so its
"int8 speedup 0.94x" says nothing about the MXU. Here each link is a pure
dot over a PRE-STACKED weight slab (scan over reps distinct weights, no
inter-link elementwise work beyond the int32/f32 accumulate), so the
measured region is matmul + weight HBM stream only. Three variants split
the story:

  bf16_pure  : bf16 dot chain, f32 accumulator      -> bf16 MXU rate
  int8_pure  : int8 dot chain, int32 accumulator    -> int8 MXU rate
  int8_epi   : int8 dot + per-link f32 rescale+bf16 -> qdense epilogue cost

If int8_pure ~= 2x bf16_pure, the hardware path is live and any shortfall
in the end-to-end QUANT bench is epilogue/quantize cost (attackable: fuse
the activation quantize into the producer, bf16 scales, Pallas epilogue).
If int8_pure ~= 1x, XLA is not lowering int8 dots to the MXU's int8 path
at these shapes and a Pallas int8 GEMM is the next experiment.

Axon rules: fresh arrays per repeat (the __array__ cache), host fetch for
timing, measured region >> 25 ms RTT.
"""

import json
import time

import jax
import jax.numpy as jnp

S, K, N = 8192, 4096, 4096
REPS = 8  # weights stacked (REPS, K, N); each link reads a fresh slab


def timeit(fn, make_args, repeats=5):
    args = make_args(0)
    float(jnp.sum(fn(*args)))  # compile
    times = []
    for i in range(repeats):
        args = make_args(i + 1)
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        times.append(time.perf_counter() - t0)
    return min(times)


@jax.jit
def bf16_pure(x, ws):
    def body(acc, w):
        return acc + jax.lax.dot(x, w, preferred_element_type=jnp.float32), None

    acc0 = jnp.zeros((S, N), jnp.float32)
    y, _ = jax.lax.scan(body, acc0, ws)
    return y


@jax.jit
def int8_pure(xq, wqs):
    def body(acc, wq):
        return acc + jax.lax.dot(xq, wq, preferred_element_type=jnp.int32), None

    acc0 = jnp.zeros((S, N), jnp.int32)
    y, _ = jax.lax.scan(body, acc0, wqs)
    return y


@jax.jit
def int8_epi(xq, wqs, sx, sw):
    # per-link: int8 dot -> f32 rescale (per-token x per-out-channel) -> bf16
    # accumulate — exactly qdense's epilogue shape
    def body(acc, args):
        wq, s = args
        d = jax.lax.dot(xq, wq, preferred_element_type=jnp.int32)
        return acc + (d.astype(jnp.float32) * sx * s).astype(jnp.bfloat16), None

    acc0 = jnp.zeros((S, N), jnp.bfloat16)
    y, _ = jax.lax.scan(body, acc0, (wqs, sw))
    return y


def main():
    out = {"device": str(jax.devices()[0]), "shape": [S, K, N], "reps": REPS}
    kx, kw = jax.random.split(jax.random.key(0))

    mk_bf16 = lambda i: (
        jax.random.normal(jax.random.fold_in(kx, i), (S, K), jnp.bfloat16),
        jax.random.normal(kw, (REPS, K, N), jnp.bfloat16),
    )
    mk_int8 = lambda i: (
        jax.random.randint(jax.random.fold_in(kx, i), (S, K), -127, 128, jnp.int8),
        jax.random.randint(kw, (REPS, K, N), -127, 128, jnp.int8),
    )
    mk_epi = lambda i: mk_int8(i) + (
        jnp.full((S, 1), 0.01, jnp.float32),
        jnp.full((REPS, 1, N), 0.02, jnp.float32),
    )

    flops = 2.0 * S * K * N * REPS
    for name, fn, mk in (
        ("bf16_pure", bf16_pure, mk_bf16),
        ("int8_pure", int8_pure, mk_int8),
        ("int8_epi", int8_epi, mk_epi),
    ):
        t = timeit(fn, mk)
        out[name] = {"s": round(t, 4), "tops": round(flops / t / 1e12, 1)}

    out["int8_vs_bf16"] = round(out["bf16_pure"]["s"] / out["int8_pure"]["s"], 3)
    out["epilogue_cost"] = round(out["int8_epi"]["s"] / out["int8_pure"]["s"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
