"""Fused GroupNorm(+SiLU) Pallas kernel — single HBM read per image.

The XLA formulation (`ops/norms.group_norm`) reads x twice (stats pass +
normalize pass fused into the consumer). For the UNet's GN shapes the whole
per-image (S, C) slab fits VMEM, so this kernel reads each image ONCE:
stats are accumulated chunk-wise in fp32 from the resident slab, folded
across each group's channels, and the normalize+SiLU writes straight back
out — halving GN HBM traffic. Reference semantics: diffusers
`ResnetBlock2D` norm1/norm2 + SiLU (`train_ID-Booth.py:1040` UNet forward);
numerics match `ops/norms.group_norm` (fp32 statistics, bf16 in/out).

Design notes (TPU):
- grid (N,), block = the full (1, S, C) slab; double-buffered DMA per image.
  Eligibility is capped by slab bytes (see `slab_supported`) so 2·in + 2·out
  + temporaries stay under the ~16 MB VMEM budget; ineligible shapes
  (VAE decode's 512²·128 etc.) keep the XLA path.
- group fold without lane reshapes: per-channel sums (1, C) are folded into
  per-channel *group* means by one tiny MXU matmul against a (C, C)
  group-averaging matrix M[i,j] = (group(i)==group(j))/(C/G · S), built once
  from iota in VMEM scratch on the first grid step. Mosaic lowers
  iota/compare/dot reliably; a (C,)→(G, C/G) lane reshape would not.
- stats accumulate in (8, C) fp32 scratch via row-chunked widening sums, so
  no full-slab fp32 temporary ever materializes.

Backward: custom_vjp recomputing through the XLA formulation — GN backward
saves nothing worth a bespoke kernel (stats are cheap to rebuild and the
train step's GN time is negligible; STATUS.md ablation: 0.31 s of 8.85 s).

Measured (v5e, sampler bs16): 1.869 img/s vs 1.957 with the XLA
formulation — XLA's stats pass + consumer-fused normalize wins at these
shapes, so GN_IMPL defaults to "xla" and this kernel stays as a tested,
flag-gated alternative (STATUS.md negative-results table).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp

try:  # CPU test envs: pallas TPU backend may be absent
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pl = None
    pltpu = None

_GN_IMPL = _os.environ.get("GN_IMPL", "xla")  # xla | pallas
# slab cap: the slab lives ONCE in bf16 VMEM scratch (the streaming design;
# a whole-slab-block version measured 18.2 MB > the 16 MB scoped limit at
# 64²·320 from double-buffered in+out slabs). Budget at the cap: slab 5.2 MB
# + double-buffered (rows, C) in/out blocks ~2.6 MB + M ≤1.6 MB + temps.
_MAX_SLAB_ELEMS = int(_os.environ.get("GN_MAX_SLAB_ELEMS", str(64 * 64 * 640)))
_CHUNK_ROWS = 512


def slab_supported(n: int, s: int, c: int, num_groups: int) -> bool:
    """Whether the single-read slab kernel serves this (N, S, C) GN."""
    if pl is None or pltpu is None:
        return False
    if c % num_groups or s % 8:
        return False
    if c > 640:
        # the (C, C) fp32 group matrix alone would blow scoped VMEM (measured:
        # C=2560 up-block concat → 26 MB > 16 MB limit); wide-C GNs have tiny
        # spatial extents anyway, XLA serves them fine
        return False
    rows = min(s, _CHUNK_ROWS)
    if s % rows:
        return False
    return s * c <= _MAX_SLAB_ELEMS


def _gn_slab_kernel(
    x_ref, gamma_ref, beta_ref, o_ref, slab_ref, m_ref, acc_ref, acc2_ref,
    *, num_groups, eps, act, s, c, rows,
):
    """Grid (N, 2, nblk). Phase 0: copy the incoming row block into the
    single-copy VMEM slab scratch + accumulate fp32 channel sums. Phase 1:
    normalize+activate FROM THE SCRATCH (no second HBM read) and write out.
    The output block is only written in phase 1; its phase-0 index map pins
    block 0, whose garbage contents are overwritten by phase 1's first step
    before any index change flushes it."""
    ph = pl.program_id(1)
    i = pl.program_id(2)
    cg = c // num_groups

    @pl.when((pl.program_id(0) == 0) & (ph == 0) & (i == 0))
    def _build_m():
        # group-averaging matrix: M[i, j] = (i//cg == j//cg) / (cg * S)
        gi = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0) // cg
        gj = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1) // cg
        m_ref[:] = jnp.where(gi == gj, 1.0 / (cg * s), 0.0).astype(jnp.float32)

    @pl.when((ph == 0) & (i == 0))
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        acc2_ref[:] = jnp.zeros_like(acc2_ref)

    @pl.when(ph == 0)
    def _accumulate():
        blk = x_ref[0]  # (rows, c)
        slab_ref[pl.ds(i * rows, rows), :] = blk
        b32 = blk.astype(jnp.float32)
        acc_ref[:] += jnp.sum(b32.reshape(rows // 8, 8, c), axis=0)
        acc2_ref[:] += jnp.sum(jnp.square(b32).reshape(rows // 8, 8, c), axis=0)

    @pl.when(ph == 1)
    def _normalize():
        sums = jnp.sum(acc_ref[:], axis=0, keepdims=True)  # (1, c) fp32
        sqs = jnp.sum(acc2_ref[:], axis=0, keepdims=True)
        dn = (((1,), (0,)), ((), ()))
        mean_c = jax.lax.dot_general(
            sums, m_ref[:], dn, preferred_element_type=jnp.float32
        )
        sq_c = jax.lax.dot_general(
            sqs, m_ref[:], dn, preferred_element_type=jnp.float32
        )
        var_c = sq_c - jnp.square(mean_c)
        inv = jax.lax.rsqrt(var_c + eps)  # (1, c) per-channel group stats
        scale = inv * gamma_ref[:].astype(jnp.float32)
        shift = beta_ref[:].astype(jnp.float32) - mean_c * scale
        out = slab_ref[pl.ds(i * rows, rows), :].astype(jnp.float32)
        out = out * scale + shift
        if act == "silu":
            out = out * jax.nn.sigmoid(out)
        o_ref[0] = out.astype(o_ref.dtype)


def _gn_slab_call(x3, gamma, beta, num_groups, eps, act, interpret):
    n, s, c = x3.shape
    rows = min(s, _CHUNK_ROWS)
    nblk = s // rows
    kernel = functools.partial(
        _gn_slab_kernel, num_groups=num_groups, eps=eps, act=act, s=s, c=c,
        rows=rows,
    )
    compiler_params = None
    if pltpu is not None and not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        )
    return pl.pallas_call(
        kernel,
        grid=(n, 2, nblk),
        in_specs=[
            # phase 0 walks the real blocks; phase 1 pins block 0 so the
            # pipeline does NOT re-DMA x (phase 1 reads only slab_ref) —
            # without the (1-ph) pin every block is fetched twice and the
            # single-read design is defeated
            pl.BlockSpec((1, rows, c), lambda b, ph, i: (b, (1 - ph) * i, 0)),
            pl.BlockSpec((1, c), lambda b, ph, i: (0, 0)),
            pl.BlockSpec((1, c), lambda b, ph, i: (0, 0)),
        ],
        # phase 0 pins output block 0 (never flushed before phase 1's first
        # write); phase 1 walks the real blocks
        out_specs=pl.BlockSpec((1, rows, c), lambda b, ph, i: (b, ph * i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, s, c), x3.dtype),
        scratch_shapes=[
            pltpu.VMEM((s, c), x3.dtype),      # single-copy slab
            pltpu.VMEM((c, c), jnp.float32),   # group matrix
            pltpu.VMEM((8, c), jnp.float32),
            pltpu.VMEM((8, c), jnp.float32),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )(x3, gamma.reshape(1, c), beta.reshape(1, c))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_group_norm(x, gamma, beta, num_groups=32, eps=1e-6, act=None, interpret=False):
    """Single-read Pallas GroupNorm(+SiLU) over N...C. Caller must have
    checked `slab_supported`; numerics match `ops/norms.group_norm`."""
    n, c = x.shape[0], x.shape[-1]
    x3 = x.reshape(n, -1, c)
    out = _gn_slab_call(x3, gamma, beta, num_groups, eps, act, interpret)
    return out.reshape(x.shape)


def _fused_gn_fwd(x, gamma, beta, num_groups, eps, act, interpret):
    return (
        fused_group_norm(x, gamma, beta, num_groups, eps, act, interpret),
        (x, gamma, beta),
    )


def _fused_gn_bwd(num_groups, eps, act, interpret, res, g):
    from .norms import group_norm as _xla_gn

    x, gamma, beta = res
    _, vjp = jax.vjp(
        lambda x_, g_, b_: _xla_gn(x_, g_, b_, num_groups=num_groups, eps=eps, act=act),
        x, gamma, beta,
    )
    return vjp(g)


fused_group_norm.defvjp(_fused_gn_fwd, _fused_gn_bwd)


def gn_impl() -> str:
    return _GN_IMPL
