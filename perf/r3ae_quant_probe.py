"""int8 vs bf16 MXU probe on the real chip.

Establishes (a) whether XLA lowers int8 dot/conv to the MXU's int8 path at
all, and (b) the achieved speedup at UNet-like shapes, BEFORE reading the
end-to-end QUANT bench. Axon rules apply: fresh arrays per repeat (the
__array__ cache), host fetch for timing, >25 ms per measured region.
"""

import json
import time

import jax
import jax.numpy as jnp


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


def main():
    out = {"device": str(jax.devices()[0])}

    # --- GEMM: (S, K) x (K, N), UNet transformer-ish but big enough to read
    S, K, N = 8192, 4096, 4096
    reps = 8  # chain reps inside one jit so the region is >>25 ms

    @jax.jit
    def gemm_bf16(x, w):
        def body(c, _):
            return jnp.tanh(c @ w), None
        y, _ = jax.lax.scan(body, x, None, length=reps)
        return y

    @jax.jit
    def gemm_int8(xq, wq):
        # int8 dot -> int32, requantize to int8 between links so every link
        # is an int8 MXU op (tanh/rescale stands in for the dequant epilogue)
        def body(c, _):
            acc = jax.lax.dot(c, wq, preferred_element_type=jnp.int32)
            y = jnp.tanh(acc.astype(jnp.float32) * 1e-6)
            return jnp.clip(jnp.round(y * 127.0), -127, 127).astype(jnp.int8), None
        y, _ = jax.lax.scan(body, xq, None, length=reps)
        return y

    kx, kw = jax.random.split(jax.random.key(0))
    mk_bf16 = lambda i: (
        jax.random.normal(jax.random.fold_in(kx, i), (S, K), jnp.bfloat16),
        jax.random.normal(kw, (K, N), jnp.bfloat16),
    )
    mk_int8 = lambda i: (
        jax.random.randint(jax.random.fold_in(kx, i), (S, K), -127, 128, jnp.int8),
        jax.random.randint(kw, (K, N), -127, 128, jnp.int8),
    )
    t_bf16 = timeit(gemm_bf16, mk_bf16)
    t_int8 = timeit(gemm_int8, mk_int8)
    flops = 2.0 * S * K * N * reps
    out["gemm"] = {
        "shape": [S, K, N], "reps": reps,
        "bf16_s": round(t_bf16, 4), "int8_s": round(t_int8, 4),
        "bf16_tflops": round(flops / t_bf16 / 1e12, 1),
        "int8_tops": round(flops / t_int8 / 1e12, 1),
        "speedup": round(t_bf16 / t_int8, 3),
    }

    # --- conv: UNet level-1 resblock shape (bs16 CFG batch, 32x32x640)
    B, H, W, C = 16, 32, 32, 640
    wshape = (3, 3, C, C)
    dnums = None

    def conv(x, w, pet):
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
            preferred_element_type=pet,
        )

    @jax.jit
    def conv_bf16(x, w):
        def body(c, _):
            return jnp.tanh(conv(c, w, None)), None
        y, _ = jax.lax.scan(body, x, None, length=reps)
        return y

    @jax.jit
    def conv_int8(x, w):
        def body(c, _):
            acc = conv(c, w, jnp.int32)
            y = jnp.tanh(acc.astype(jnp.float32) * 1e-4)
            return jnp.clip(jnp.round(y * 127.0), -127, 127).astype(jnp.int8), None
        y, _ = jax.lax.scan(body, x, None, length=reps)
        return y

    mkc_bf16 = lambda i: (
        jax.random.normal(jax.random.fold_in(kx, i), (B, H, W, C), jnp.bfloat16),
        jax.random.normal(kw, wshape, jnp.bfloat16),
    )
    mkc_int8 = lambda i: (
        jax.random.randint(jax.random.fold_in(kx, i), (B, H, W, C), -127, 128, jnp.int8),
        jax.random.randint(kw, wshape, -127, 128, jnp.int8),
    )
    t_bf16 = timeit(conv_bf16, mkc_bf16)
    t_int8 = timeit(conv_int8, mkc_int8)
    flops = 2.0 * B * H * W * 9 * C * C * reps
    out["conv"] = {
        "shape": [B, H, W, C], "reps": reps,
        "bf16_s": round(t_bf16, 4), "int8_s": round(t_int8, 4),
        "bf16_tflops": round(flops / t_bf16 / 1e12, 1),
        "int8_tops": round(flops / t_int8 / 1e12, 1),
        "speedup": round(t_bf16 / t_int8, 3),
    }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
