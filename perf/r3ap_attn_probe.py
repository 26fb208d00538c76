"""SageAttention feasibility probe: int8 vs bf16 MXU rate at ATTENTION tile
shapes, operands VMEM-resident (Pallas), fixed costs differenced away.

The sampler's attention core runs at 56% of its pure-matmul floor
(STATUS.md attribution); an int8 attention kernel (SageAttention,
arXiv:2410.02367: int8 QKᵀ with per-block scales, low-precision PV) could
raise the floor itself IF the MXU's 2× int8 rate survives the attention
shapes. The two matmuls differ sharply from the big square dots probe v4
measured (int8 2.07× there):

  QK-shaped: (1024, 64) @ (64, 2048)   — contraction K=64 (head_dim):
             the 128×128 systolic array is half-fed in ANY dtype; does
             int8 double-pumping still apply?
  PV-shaped: (1024, 2048) @ (2048, 64) — contraction 2048 (seq), output
             only 64 wide (half a lane tile).

Each kernel loops R matmuls over VMEM-resident tiles (B perturbed per
iteration to defeat loop-invariant hoisting — the perturb is ~1% of the
matmul's MXU cycles), accumulating an (8, 128) probe slice. Rates use the
difference of two R values, so launch/RTT/compile-warm costs cancel:

    rate = 2·M·K·N·(R_HI − R_LO) / (t_hi − t_lo)

Decision rule (written before running): int8 ≥ 1.6× bf16 at BOTH shapes →
an int8 flash kernel is worth building for the w8a8 path (~+5–7% on the
turbo stack); anything less loses to the quantize/rescale overhead an
actual kernel adds on top.
"""

import json
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, D, N = 1024, 64, 2048  # QK: (M,D)@(D,N); PV: (M,N)@(N,D)
R_LO, R_HI = 512, 4096
if os.environ.get("PROBE_SMOKE"):  # CPU interpret-mode correctness check
    M, D, N, R_LO, R_HI = 64, 128, 256, 2, 4  # D>=128: the (8,128) probe
    # slice must fit both matmuls' outputs
_INTERPRET = bool(os.environ.get("PROBE_SMOKE"))


def make_probe(shape_a, shape_b, dtype, reps):
    pet = jnp.int32 if dtype == jnp.int8 else jnp.float32

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[...]

        def body(i, acc):
            if dtype == jnp.int8:
                # Mosaic has no vector<i8> arithmetic ("Only vector<i16>
                # and vector<i32> are supported") — perturb in i32 and
                # truncate back; the convert is ~0.05% of the MXU cycles.
                b = (b_ref[...].astype(jnp.int32) + i).astype(jnp.int8)
            else:
                b = b_ref[...] * (1.0 + i.astype(jnp.float32) * 1e-6).astype(dtype)
            y = jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())), preferred_element_type=pet
            )
            return acc + y[:8, :128]

        o_ref[...] = jax.lax.fori_loop(
            0, reps, body, jnp.zeros((8, 128), pet)
        )

    @jax.jit
    def probe(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), pet),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=_INTERPRET,
        )(a, b)

    return probe


def timeit(fn, mk, repeats=5):
    float(jnp.max(jnp.abs(fn(*mk(0)).astype(jnp.float32))))  # compile
    times = []
    for i in range(repeats):
        args = mk(i + 1)
        t0 = time.perf_counter()
        float(jnp.max(jnp.abs(fn(*args).astype(jnp.float32))))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    out = {
        "device": str(jax.devices()[0]),
        "qk_shape": [M, D, N], "pv_shape": [M, N, D],
        "reps": [R_LO, R_HI],
    }
    key = jax.random.key(0)
    flops = 2.0 * M * D * N

    def mk(dtype, sa, sb):
        def inner(i):
            ka, kb = jax.random.split(jax.random.fold_in(key, i))
            if dtype == jnp.int8:
                return (
                    jax.random.randint(ka, sa, -127, 128, jnp.int8),
                    jax.random.randint(kb, sb, -127, 128, jnp.int8),
                )
            return (
                jax.random.normal(ka, sa, dtype),
                jax.random.normal(kb, sb, dtype) * 0.01,
            )
        return inner

    for name, sa, sb in (("qk", (M, D), (D, N)), ("pv", (M, N), (N, D))):
        for dname, dtype in (("bf16", jnp.bfloat16), ("int8", jnp.int8)):
            lo = make_probe(sa, sb, dtype, R_LO)
            hi = make_probe(sa, sb, dtype, R_HI)
            t_lo = timeit(lo, mk(dtype, sa, sb))
            t_hi = timeit(hi, mk(dtype, sa, sb))
            rate = flops * (R_HI - R_LO) / max(t_hi - t_lo, 1e-9) / 1e12
            out[f"{name}_{dname}"] = {
                "t_lo_s": round(t_lo, 4), "t_hi_s": round(t_hi, 4),
                "tops_diff": round(rate, 1),
            }
        b, q = out[f"{name}_bf16"], out[f"{name}_int8"]
        out[f"int8_vs_bf16_{name}"] = round(
            (b["t_hi_s"] - b["t_lo_s"]) / max(q["t_hi_s"] - q["t_lo_s"], 1e-9), 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
