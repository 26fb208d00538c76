"""Fused dynamic-quant int8 dense — Pallas TPU kernel (QUANT_DENSE_IMPL=pallas).

Why a kernel when XLA already runs the int8 dot at 2.07× bf16 (RTT-cancelled
probe, perf/r3ah_queue.jsonl)? Because the DYNAMIC activation quantization
around it is 2–3 extra HBM passes over x (amax reduce, round/cast write,
int8 re-read) plus an fp32 epilogue, and at the UNet's shallow contraction
widths those passes eat most of the MXU win: the end-to-end XLA path
measures 1.13× bf16 at K=320 vs 1.53×/1.78× at K=640/1280
(perf/r3aj_queue.jsonl, differenced chains at the sampler's real shapes).

This kernel reads x from HBM exactly once — the same single pass a plain
bf16 GEMM needs: each (block_m, K) row block is loaded to VMEM, row-amaxed
and quantized in-register on the first N-tile visit (the block index is
constant across the N sweep, so Pallas elides the re-copies), then every
N tile runs int8×int8→int32 on the MXU and writes the fp32-rescaled result
directly in the output dtype. Weights stream as int8 (half the bf16 rate).

Same math as `quant._qdense_impl`'s int8 branch — per-token symmetric
activation scales, per-out-channel weight scales, int32 accumulation —
except the output is rounded to `x.dtype` in-kernel (one extra bf16
rounding vs the fp32 return of the XLA path; callers cast immediately
anyway, see `ops/lora.lora_dense`).

Inference-only, like everything in `ops/quant` (no VJP; `round` has no
useful gradient). The reference has no quantized path
(`train_ID-Booth.py:60` — fp16 autocast only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu imports on CPU too; tests run the kernel in interpret mode
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

_EPS = 1e-8
DEFAULT_BLOCK_M = 256
DEFAULT_BLOCK_N = 512


def _qdense_kernel(x_ref, q_ref, s_ref, o_ref, xq_ref, sx_ref):
    """grid (M/bm, N/bn), N innermost. x block (bm, K) is indexed by the
    M tile only — Pallas elides its HBM re-copy across the N sweep, and the
    quantized copy persists in scratch; the int8 weight tile streams."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _quantize_rows():
        xf = x_ref[...].astype(jnp.float32)  # (bm, K)
        sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True), _EPS) / 127.0
        xq_ref[...] = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        sx_ref[...] = jnp.broadcast_to(sx, sx_ref.shape)

    acc = jax.lax.dot_general(
        xq_ref[...], q_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (bm, bn)
    y = acc.astype(jnp.float32) * sx_ref[:, :1] * s_ref[0].reshape(1, -1)
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "interpret")
)
def qdense_pallas(
    x: jax.Array,
    q: jax.Array,
    s: jax.Array,
    *,
    block_m: int = DEFAULT_BLOCK_M,
    block_n: int = DEFAULT_BLOCK_N,
    interpret: bool = False,
) -> jax.Array:
    """x·Wᵀ over int8 (out, in) q with (out,) f32 scales; returns x.dtype.

    x: (..., K) bf16/fp32 — leading dims flatten to the row grid. K is kept
    whole per block (the UNet's widest contraction, 4·1280 at the deep
    GEGLU down-projection, is a 2.6 MB bf16 row block at bm=256 — VMEM fits
    x + its int8 copy + a (bn, K) weight tile inside the 16 MB budget).
    """
    lead = x.shape[:-1]
    kdim = x.shape[-1]
    n = q.shape[0]
    xm = x.reshape(-1, kdim)
    m = xm.shape[0]

    bm = min(block_m, m)
    pad_m = (-m) % bm
    if pad_m:
        xm = jnp.pad(xm, ((0, pad_m), (0, 0)))
    pad_n = (-n) % 128
    bn = min(block_n, n + pad_n)
    pad_n = (-n) % bn
    qp, sp = q, s
    if pad_n:
        qp = jnp.pad(q, ((0, pad_n), (0, 0)))
        sp = jnp.pad(s, (0, pad_n))
    mp, np_ = m + ((-m) % bm), n + pad_n

    compiler_params = None
    if pltpu is not None and not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        )
    out = pl.pallas_call(
        _qdense_kernel,
        grid=(mp // bm, np_ // bn),
        in_specs=[
            pl.BlockSpec((bm, kdim), lambda i, j: (i, 0)),
            pl.BlockSpec((bn, kdim), lambda i, j: (j, 0)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, kdim), jnp.int8),
            pltpu.VMEM((bm, 128), jnp.float32),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )(xm, qp, sp.reshape(1, -1).astype(jnp.float32))
    if pad_m or pad_n:
        out = out[:m, :n]
    return out.reshape(*lead, n)
