"""MXU rate probe, take 4 — RTT-cancelled.

Probes v1–v3 all timed ONE dispatch whose region (~43 ms) still contained
the ~25 ms axon dispatch+fetch RTT, deflating every computed rate by
~2–4× (the "26% MFU pure GEMM" anomaly). Subtracting the nominal RTT from
v1–v3 retro-actively gives a consistent picture (bf16 dot ~140 TF/s, int8
conv ~1.5× bf16 conv, int8 dot ~0.9× bf16 dot) — this probe measures it
properly: each variant runs at TWO chain lengths (REPS_LO, REPS_HI) and
the rate uses the DIFFERENCE, so every fixed cost (RTT, quantize, launch)
cancels exactly:

    rate = 2·S·K²·(REPS_HI − REPS_LO) / (t_hi − t_lo)

Variants: bf16/int8 × dot/conv1x1 lowering of the same square GEMM, plus
a 3x3 int8/bf16 conv pair at a UNet resblock shape (the end-to-end
winner's op class).
"""

import json
import time

import jax
import jax.numpy as jnp
from functools import partial

S, K = 8192, 4096
H, W = 64, 128
REPS_LO, REPS_HI = 4, 36
CB, CH, CW, CC = 16, 32, 32, 640  # 3x3 conv probe shape (UNet level-1)


def timeit(fn, make_args, repeats=5):
    args = make_args(0)
    float(jnp.max(jnp.abs(fn(*args)[0, :8]).astype(jnp.float32)))  # compile
    times = []
    for i in range(repeats):
        args = make_args(i + 1)
        t0 = time.perf_counter()
        float(jnp.max(jnp.abs(fn(*args)[0, :8]).astype(jnp.float32)))
        times.append(time.perf_counter() - t0)
    return min(times)


@partial(jax.jit, static_argnames=("reps",))
def bf16_dot(x, w, reps):
    def body(c, _):
        y = jax.lax.dot(c, w, preferred_element_type=jnp.float32)
        return (y * 1e-3).astype(jnp.bfloat16), None

    y, _ = jax.lax.scan(body, x, None, length=reps)
    return y


@partial(jax.jit, static_argnames=("reps",))
def int8_dot(xq, wq, reps):
    def body(c, _):
        y = jax.lax.dot(c, wq, preferred_element_type=jnp.int32)
        return jax.lax.shift_right_arithmetic(y, 7).astype(jnp.int8), None

    y, _ = jax.lax.scan(body, xq, None, length=reps)
    return y


def _conv(x, w, pet, pad):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), pad, dimension_numbers=dn, preferred_element_type=pet,
    )


@partial(jax.jit, static_argnames=("reps",))
def bf16_conv1x1(x, w, reps):
    def body(c, _):
        y = _conv(c, w, jnp.float32, ((0, 0), (0, 0)))
        return (y * 1e-3).astype(jnp.bfloat16), None

    y, _ = jax.lax.scan(body, x, None, length=reps)
    return y


@partial(jax.jit, static_argnames=("reps",))
def int8_conv1x1(xq, wq, reps):
    def body(c, _):
        y = _conv(c, wq, jnp.int32, ((0, 0), (0, 0)))
        return jax.lax.shift_right_arithmetic(y, 7).astype(jnp.int8), None

    y, _ = jax.lax.scan(body, xq, None, length=reps)
    return y


@partial(jax.jit, static_argnames=("reps",))
def bf16_conv3x3(x, w, reps):
    def body(c, _):
        y = _conv(c, w, jnp.float32, ((1, 1), (1, 1)))
        return (y * 1e-3).astype(jnp.bfloat16), None

    y, _ = jax.lax.scan(body, x, None, length=reps)
    return y


@partial(jax.jit, static_argnames=("reps",))
def int8_conv3x3(xq, wq, reps):
    def body(c, _):
        y = _conv(c, wq, jnp.int32, ((1, 1), (1, 1)))
        return jax.lax.shift_right_arithmetic(y, 7).astype(jnp.int8), None

    y, _ = jax.lax.scan(body, xq, None, length=reps)
    return y


def main():
    out = {
        "device": str(jax.devices()[0]),
        "gemm_shape": [S, K, K], "conv3_shape": [CB, CH, CW, CC],
        "reps": [REPS_LO, REPS_HI],
    }
    kx, kw = jax.random.split(jax.random.key(0))

    def mk(dtype, form, i):
        if form == "conv3":
            shape, wshape = (CB, CH, CW, CC), (3, 3, CC, CC)
        else:
            shape, wshape = (S, K), (K, K)
        if dtype == "bf16":
            x = jax.random.normal(jax.random.fold_in(kx, i), shape, jnp.bfloat16)
            w = jax.random.normal(kw, wshape, jnp.bfloat16) * 0.01
        else:
            x = jax.random.randint(jax.random.fold_in(kx, i), shape, -127, 128, jnp.int8)
            w = jax.random.randint(kw, wshape, -127, 128, jnp.int8)
        if form == "conv1":
            x = x.reshape(1, H, W, K)
            w = w.reshape(1, 1, K, K)
        return x, w

    gemm_flops = 2.0 * S * K * K
    conv3_flops = 2.0 * CB * CH * CW * 9 * CC * CC
    for name, fn, dt, form, flops in (
        ("bf16_dot", bf16_dot, "bf16", "dot", gemm_flops),
        ("int8_dot", int8_dot, "int8", "dot", gemm_flops),
        ("bf16_conv1x1", bf16_conv1x1, "bf16", "conv1", gemm_flops),
        ("int8_conv1x1", int8_conv1x1, "int8", "conv1", gemm_flops),
        ("bf16_conv3x3", bf16_conv3x3, "bf16", "conv3", conv3_flops),
        ("int8_conv3x3", int8_conv3x3, "int8", "conv3", conv3_flops),
    ):
        t_lo = timeit(lambda x, w, f=fn: f(x, w, REPS_LO),
                      lambda i, d=dt, fo=form: mk(d, fo, i))
        t_hi = timeit(lambda x, w, f=fn: f(x, w, REPS_HI),
                      lambda i, d=dt, fo=form: mk(d, fo, i))
        rate = flops * (REPS_HI - REPS_LO) / (t_hi - t_lo) / 1e12
        out[name] = {
            "t_lo_s": round(t_lo, 4), "t_hi_s": round(t_hi, 4),
            "tops_diff": round(rate, 1),
        }

    for pair in ("dot", "conv1x1", "conv3x3"):
        b, q = out[f"bf16_{pair}"], out[f"int8_{pair}"]
        out[f"int8_vs_bf16_{pair}"] = round(
            (b["t_hi_s"] - b["t_lo_s"]) / (q["t_hi_s"] - q["t_lo_s"]), 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
