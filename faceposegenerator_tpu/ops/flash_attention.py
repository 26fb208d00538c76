"""Pallas TPU flash attention (forward) with online softmax.

Serves the UNet's 4096-token latent self-attention and 77-token text
cross-attention (SURVEY.md §2.6: the xFormers/cuDNN attention the reference
enables at `train_ID-Booth.py:653-664` becomes a first-class TPU kernel).

Design:
  - Layout (B, S, H, D) is flattened to (B*H, S, D); grid is
    (B*H, Sq/bq, Skv/bk) with the KV dimension innermost and sequential
    ("arbitrary"), accumulating the online-softmax state (m, l, acc) in VMEM
    scratch; the output tile is written once at the final KV block.
  - Softmax statistics in fp32; QKᵀ and PV ride the MXU with fp32
    accumulation (`preferred_element_type`).
  - Padded KV positions (e.g. 77 text tokens padded to 128 lanes) are masked
    with a large negative finite value; exp underflow to exactly 0 makes the
    padded columns contribute nothing.
  - Backward: custom_vjp recomputes attention with the jnp reference path
    (rematerialisation — trade FLOPs for memory, no O(S²) residuals saved).
    A fused Pallas backward is a later optimisation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too; kernels run via interpret mode there
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

NEG_INF = -1e30
# tuned for the SD2.1 self-attention shapes (S=4096, D=64) on v5e: larger
# KV blocks amortize the per-block online-softmax bookkeeping
# (FLASH_BLOCK_Q/K env overrides exist for on-TPU block tuning, where
# profiling is unavailable and each measurement is a full bench run)
import os as _os

# measured on v5e (512² SD2.1 sampling, end-to-end img/s): bs16 2026-08-16:
# 512/1024 → 1.85, 512/2048 → 1.82, 1024/1024 → 1.90. bs8 2026-08-17 with
# kernel-local vmem (perf/r3i_blocks.jsonl): 1024/1024 → 2.005,
# 2048/2048 → 2.021, 4096/1024 → 2.028, 1024/4096 → 2.030,
# 4096/2048 → 2.046, 2048/4096 → 2.048 (best: whole-KV block at S=4096
# removes every online-softmax rescale pass; 4096/4096 exceeds VMEM).
# Train step is neutral at 2048/4096 (8.82 vs 8.85, 4.52 vs 4.54 —
# perf/r3h_train.jsonl), so the default is global.
DEFAULT_BLOCK_Q = int(_os.environ.get("FLASH_BLOCK_Q", "2048"))
DEFAULT_BLOCK_K = int(_os.environ.get("FLASH_BLOCK_K", "4096"))
_BF16_EXP = _os.environ.get("FLASH_BF16_EXP", "0") == "1"
_EXP2 = _os.environ.get("FLASH_EXP2", "0") == "1"
LOG2E = 1.4426950408889634
# FLASH_IMPL=official routes packed self-attention through
# jax.experimental.pallas.ops.tpu.flash_attention (heavier-tuned Mosaic
# scheduling) — packing to d=128 is still ours; cross-attention (kv_len)
# keeps the in-house kernel
_IMPL = _os.environ.get("FLASH_IMPL", "own")
# FLASH_MXU_SUM: compute the softmax row-sum l on the MXU instead of a VPU
# reduction, by folding a ones-column block into the packed PV matmul's
# otherwise-discarded lanes (p_a·[va|1] puts sum(p_a) in lanes >= d). The
# kernel is VPU-reduction-bound (STATUS.md roofline), so deleting the two
# (bq, bk) row-sum passes per block is the main remaining forward lever.
_MXU_SUM = _os.environ.get("FLASH_MXU_SUM", "1") == "1"
# FLASH_SPLIT_KV > 1: process each KV block as N sub-blocks with a COMBINED
# max so sub-block h's exp (VPU) is independent of sub-block h-1's PV matmul
# (MXU) — exposes MXU/VPU overlap to Mosaic's scheduler. Forward-only.
_SPLIT_KV = int(_os.environ.get("FLASH_SPLIT_KV", "1"))
# FLASH_BWD: auto = fused Pallas backward wherever one exists — the packed
# path for d=64 AND the plain path for d % 128 == 0 (the VAE's 512-dim
# head) — falling back to the reference-recompute VJP only for other dims;
# reference = force the recompute VJP everywhere (e.g. to isolate a
# suspected kernel bug or reproduce the round-1 numbers). The round-2
# finding that the recompute-backward loses to XLA saved-residuals (3.27 vs
# 3.93 train-imgs/s) motivated the fused backward: it saves only (o, lse)
# row statistics instead of the O(S²) softmax weights, and has no VPU
# reductions at all (D = rowsum(dO∘O) is precomputed outside the kernel).
_BWD = _os.environ.get("FLASH_BWD", "auto")
# backward block sizes: the bwd kernels hold more live (bq, bk) fp32
# temporaries (s, p, dp, ds per head) than the forward, so default smaller
DEFAULT_BWD_BLOCK_Q = int(_os.environ.get("FLASH_BWD_BLOCK_Q", "512"))
DEFAULT_BWD_BLOCK_K = int(_os.environ.get("FLASH_BWD_BLOCK_K", "512"))


def flash_supported(q, k, v) -> bool:
    """Flash path auto-selects on TPU for fp32/bf16 inputs when the head dim
    is lane-aligned (d % 128 == 0, plain kernel) or packs two-per-lane-block
    (d == 64, packed kernel). Measured on v5e (512² SD2.1 bs16 sampling,
    2026-08): packed flash 1.90 img/s vs XLA 1.81 at head_dim 64 — the
    round-1 auto-route to XLA is obsolete. `impl="reference"` still forces
    the einsum path."""
    if pltpu is None:
        return False
    if q.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    d = q.shape[-1]
    if d % 128 != 0 and d * 2 != 128:
        return False
    return jax.default_backend() == "tpu"


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *rest, scale, kv_len, block_k,
                save_lse=False):
    if save_lse:
        lse_ref, acc_ref, m_ref, l_ref = rest
    else:
        (acc_ref, m_ref, l_ref), lse_ref = rest, None
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (bq, D)
    k = k_ref[0]  # (bk, D)
    v = v_ref[0]  # (bk, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale  # (bq, bk) fp32

    if kv_len is not None:
        col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_ref[:, :1]  # (bq, 1)
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)  # (bq, bk)
    l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)
        if save_lse:
            lse_ref[0] = jnp.broadcast_to(
                m_ref[:, :1] + jnp.log(l_ref[:, :1]), lse_ref.shape[1:]
            )


def _kernel_compiler_params(block_q, block_k, interpret):
    """Grid semantics plus a kernel-local VMEM budget. Blocks >1024 exceed
    the 16 MB default scoped-VMEM limit (the fp32 score tile alone is
    block_q·block_k·4 bytes; block 2048 needs 42 MB — measured compile OOM,
    perf/r3f_vmem_probe.jsonl). `vmem_limit_bytes` raises the limit for
    THIS kernel's compilation only, leaving the surrounding XLA program's
    scoped-vmem fusion budget at its default (unlike the global
    TPU_SCOPED_VMEM_KIB option, which changes fusion decisions everywhere).
    FLASH_VMEM_MB overrides the estimate."""
    if pltpu is None or interpret:
        return None
    kw = {}
    force_mb = int(_os.environ.get("FLASH_VMEM_MB", "0"))
    if force_mb:
        kw["vmem_limit_bytes"] = force_mb * 1024 * 1024
    else:
        est = 3 * block_q * block_k * 4 + 8 * 1024 * 1024
        if est > 16 * 1024 * 1024:
            kw["vmem_limit_bytes"] = min(est, 112 * 1024 * 1024)
    return pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"), **kw
    )


def _cap_blocks_for_dim(block_q, block_k, d):
    """Scale blocks down for wide heads so the per-block VMEM footprint
    (q/k/v tiles + fp32 logits + (bq, d) fp32 scratch) stays inside the
    16 MB scoped-vmem budget. Measured: d=512 (VAE attention) at 1024/1024
    OOMs the compiler ("exceeded scoped vmem limit"); 256/256 fits."""
    if d > 128:
        shrink = d // 128
        block_q = max(128, block_q // shrink)
        block_k = max(128, block_k // shrink)
    return block_q, block_k


def _flash_fwd_3d(q, k, v, scale, kv_len, block_q, block_k, interpret,
                  save_lse=False):
    """q: (BH, Sq, D); k, v: (BH, Skv, D). Returns (BH, Sq, D), plus a
    (BH, Sq, 128) fp32 per-row log-sum-exp (value broadcast across lanes)
    when save_lse."""
    bh, sq, d = q.shape
    skv = k.shape[1]

    block_q, block_k = _cap_blocks_for_dim(block_q, block_k, d)
    block_q = min(block_q, sq)
    block_k = min(block_k, skv)
    pad_q = (-sq) % block_q
    pad_k = (-skv) % block_k
    if pad_k and kv_len is None:
        kv_len = skv
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0)))
    sq_p, skv_p = sq + pad_q, skv + pad_k

    grid = (bh, sq_p // block_q, skv_p // block_k)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, kv_len=kv_len, block_k=block_k,
        save_lse=save_lse,
    )
    compiler_params = _kernel_compiler_params(block_q, block_k, interpret)
    o_spec = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0))
    out_shape = jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype)
    if save_lse:
        out_specs = (
            o_spec,
            pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0)),
        )
        out_shape = (out_shape, jax.ShapeDtypeStruct((bh, sq_p, 128), jnp.float32))
    else:
        out_specs = o_spec
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )(q, k, v)
    if save_lse:
        out, lse = out
        if pad_q:
            out, lse = out[:, :sq], lse[:, :sq]
        return out, lse
    if pad_q:
        out = out[:, :sq]
    return out


def _fwd_kernel_packed(
    q_ref, k_ref, v_ref, o_ref, *rest, scale, kv_len, block_k, d,
    mxu_sum, save_lse=False,
):
    """Two heads packed side-by-side in the 128-lane dim ([qa|qb], d=64 each).

    QKᵀ contracts the full 128 lanes against a block-diagonal K extension
    ([ka|0; 0|kb] rows), yielding side-by-side logits (bq, 2·bk) with the two
    heads in disjoint column halves; the online softmax runs per half with
    the (m, l) state stored columnwise (lanes < d hold head a's statistics).
    All tile loads are full-lane — the half-lane padding waste of running
    d=64 heads through the plain kernel disappears.

    With save_lse, an extra output carries the per-row log-sum-exp (lanes < d
    hold head a's, upper lanes head b's) — the only residual the Pallas
    backward needs beyond (q, k, v, o)."""
    if save_lse:
        lse_ref, acc_ref, m_ref, l_ref = rest
    else:
        (acc_ref, m_ref, l_ref), lse_ref = rest, None
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (bq, 2d) = [qa | qb]
    k = k_ref[0]  # (bk, 2d) = [ka | kb]
    v = v_ref[0]

    # Mask Q's lane halves instead of building block-diagonal K/V extensions:
    # q_lo·[ka|kb]ᵀ = qa·kaᵀ exactly (the qb lanes are zero), so K and V ride
    # the MXU unmodified and the only elementwise work besides the softmax is
    # two (bq, 2d) masks and the output lane-select.
    zero = jnp.zeros((), q.dtype)
    lane_lo_q = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1) < d  # (bq, 2d)
    q_lo = jnp.where(lane_lo_q, q, zero)
    q_hi = jnp.where(lane_lo_q, zero, q)
    dn = (((1,), (1,)), ((), ()))
    s_a = jax.lax.dot_general(q_lo, k, dn, preferred_element_type=jnp.float32)
    s_b = jax.lax.dot_general(q_hi, k, dn, preferred_element_type=jnp.float32)
    if scale != 1.0:  # callers fold the scale into q; kept for direct use
        s_a = s_a * scale
        s_b = s_b * scale

    if kv_len is not None:
        pos = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s_a.shape, 1)
        live = pos < kv_len
        s_a = jnp.where(live, s_a, NEG_INF)
        s_b = jnp.where(live, s_b, NEG_INF)

    m_prev_a = m_ref[:, :1]
    m_prev_b = m_ref[:, d : d + 1]
    m_new_a = jnp.maximum(m_prev_a, jnp.max(s_a, axis=1, keepdims=True))
    m_new_b = jnp.maximum(m_prev_b, jnp.max(s_b, axis=1, keepdims=True))
    if _BF16_EXP:
        # bench-only knob: evaluate exp at bf16 (2 elems/VPU lane) — the
        # kernel is softmax-VPU-bound; statistics (m, l) stay fp32
        p_a = jnp.exp((s_a - m_new_a).astype(jnp.bfloat16))
        p_b = jnp.exp((s_b - m_new_b).astype(jnp.bfloat16))
    elif _EXP2:
        # bench knob: exp(x) = 2^(x·log2 e) — exp2 is the VPU-native
        # transcendental; one (bq,1) rescale of m replaces per-element work.
        # Exact up to one extra fp32 multiply per element.
        p_a = jnp.exp2((s_a - m_new_a) * LOG2E)
        p_b = jnp.exp2((s_b - m_new_b) * LOG2E)
    else:
        p_a = jnp.exp(s_a - m_new_a)
        p_b = jnp.exp(s_b - m_new_b)

    lane_lo = jax.lax.broadcasted_iota(jnp.int32, acc_ref.shape, 1) < d  # (bq, 2d)
    alpha = jnp.where(
        lane_lo, jnp.exp(m_prev_a - m_new_a), jnp.exp(m_prev_b - m_new_b)
    )

    dn_av = (((1,), (0,)), ((), ()))
    pa = p_a.astype(v.dtype)
    pb = p_b.astype(v.dtype)
    if mxu_sum:
        # Row-sum on the MXU: the packed PV matmul wastes half its lanes
        # (pa·vb / pb·va are discarded by the select below). Replacing the
        # dead half of V with ones makes those lanes compute sum(p) instead:
        # d_a = p_a·[va|1] → lanes >= d all hold sum(p_a) (head b mirrored).
        # Deletes both (bq, bk) VPU row-sum reductions per block; padded KV
        # rows contribute nothing since their p is exactly 0.
        one = jnp.ones((), v.dtype)
        lane_lo_v = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1) < d
        d_a = jax.lax.dot_general(
            pa, jnp.where(lane_lo_v, v, one), dn_av,
            preferred_element_type=jnp.float32,
        )
        d_b = jax.lax.dot_general(
            pb, jnp.where(lane_lo_v, one, v), dn_av,
            preferred_element_type=jnp.float32,
        )
        l_a = d_a[:, d : d + 1]
        l_b = d_b[:, :1]
    else:
        l_a = jnp.sum(p_a, axis=1, keepdims=True, dtype=jnp.float32)
        l_b = jnp.sum(p_b, axis=1, keepdims=True, dtype=jnp.float32)
        d_a = jax.lax.dot_general(
            pa, v, dn_av, preferred_element_type=jnp.float32
        )  # lanes < d hold pa·va; upper lanes (pa·vb) are discarded below
        d_b = jax.lax.dot_general(
            pb, v, dn_av, preferred_element_type=jnp.float32
        )
    acc_ref[:] = acc_ref[:] * alpha + jnp.where(lane_lo, d_a, d_b)
    m_ref[:] = jnp.where(lane_lo, m_new_a, m_new_b)
    l_ref[:] = l_ref[:] * alpha + jnp.where(lane_lo, l_a, l_b)

    @pl.when(j == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)
        if save_lse:
            lse_ref[0] = m_ref[:] + jnp.log(l_ref[:])


def _fwd_kernel_packed_split(
    q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *, scale, kv_len,
    block_k, d, split_kv,
):
    """Packed kernel processing the KV block as `split_kv` sub-blocks with a
    COMBINED max, so each sub-block's exp (VPU) is data-independent of the
    previous sub-block's PV matmul (MXU) and Mosaic's static scheduler can
    overlap the two units — the serialization hypothesis behind the kernel
    sitting at ~2× its padded-MXU floor while op-deletion (FLASH_MXU_SUM)
    moved it <1%. Also amortizes: ONE alpha rescale of (acc, l) per block
    instead of per sub-block. Numerics: identical to running the online
    softmax with block_k and a shared max (exp arguments differ from the
    sequential-max path by at most the sub-block max gap; still exact
    softmax). Row-sums ride the PV matmuls' dead lanes (mxu_sum always on
    here)."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    zero = jnp.zeros((), q.dtype)
    lane_lo_q = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1) < d
    q_lo = jnp.where(lane_lo_q, q, zero)
    q_hi = jnp.where(lane_lo_q, zero, q)
    dn = (((1,), (1,)), ((), ()))
    dn_av = (((1,), (0,)), ((), ()))

    sub = block_k // split_kv
    s_as, s_bs = [], []
    for h in range(split_kv):
        ksub = k_ref[0, h * sub : (h + 1) * sub, :]
        s_a = jax.lax.dot_general(q_lo, ksub, dn, preferred_element_type=jnp.float32)
        s_b = jax.lax.dot_general(q_hi, ksub, dn, preferred_element_type=jnp.float32)
        if scale != 1.0:
            s_a, s_b = s_a * scale, s_b * scale
        if kv_len is not None:
            pos = j * block_k + h * sub + jax.lax.broadcasted_iota(
                jnp.int32, s_a.shape, 1
            )
            live = pos < kv_len
            s_a = jnp.where(live, s_a, NEG_INF)
            s_b = jnp.where(live, s_b, NEG_INF)
        s_as.append(s_a)
        s_bs.append(s_b)

    m_prev_a = m_ref[:, :1]
    m_prev_b = m_ref[:, d : d + 1]
    m_new_a, m_new_b = m_prev_a, m_prev_b
    for h in range(split_kv):
        m_new_a = jnp.maximum(m_new_a, jnp.max(s_as[h], axis=1, keepdims=True))
        m_new_b = jnp.maximum(m_new_b, jnp.max(s_bs[h], axis=1, keepdims=True))

    one = jnp.ones((), v_ref.dtype)
    lane_lo_v = jax.lax.broadcasted_iota(jnp.int32, (sub, 2 * d), 1) < d
    d_a = None
    d_b = None
    for h in range(split_kv):
        # exp of sub-block h (VPU) is independent of sub-block h-1's PV
        # matmuls (MXU) — the overlap this kernel exists to expose
        p_a = jnp.exp(s_as[h] - m_new_a).astype(v_ref.dtype)
        p_b = jnp.exp(s_bs[h] - m_new_b).astype(v_ref.dtype)
        vsub = v_ref[0, h * sub : (h + 1) * sub, :]
        g_a = jax.lax.dot_general(
            p_a, jnp.where(lane_lo_v, vsub, one), dn_av,
            preferred_element_type=jnp.float32,
        )
        g_b = jax.lax.dot_general(
            p_b, jnp.where(lane_lo_v, one, vsub), dn_av,
            preferred_element_type=jnp.float32,
        )
        d_a = g_a if d_a is None else d_a + g_a
        d_b = g_b if d_b is None else d_b + g_b

    lane_lo = jax.lax.broadcasted_iota(jnp.int32, acc_ref.shape, 1) < d
    alpha = jnp.where(
        lane_lo, jnp.exp(m_prev_a - m_new_a), jnp.exp(m_prev_b - m_new_b)
    )
    acc_ref[:] = acc_ref[:] * alpha + jnp.where(lane_lo, d_a, d_b)
    m_ref[:] = jnp.where(lane_lo, m_new_a, m_new_b)
    l_ref[:] = l_ref[:] * alpha + jnp.where(
        lane_lo, d_a[:, d : d + 1], d_b[:, :1]
    )

    @pl.when(j == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def _flash_fwd_3d_packed(
    q, k, v, scale, kv_len, block_q, block_k, interpret, d, mxu_sum=None,
    save_lse=False,
):
    """q: (BH2, Sq, 2d); k, v: (BH2, Skv, 2d) with two d-dim heads packed in
    the last axis. Returns (BH2, Sq, 2d), plus the fp32 lse array of the same
    shape when save_lse (lanes < d: head a, lanes >= d: head b)."""
    bh2, sq, d2 = q.shape
    skv = k.shape[1]

    block_q = min(block_q, sq)
    block_k = min(block_k, skv)
    pad_q = (-sq) % block_q
    pad_k = (-skv) % block_k
    if pad_k and kv_len is None:
        kv_len = skv
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0)))
    sq_p, skv_p = sq + pad_q, skv + pad_k

    grid = (bh2, sq_p // block_q, skv_p // block_k)
    split = _SPLIT_KV if not save_lse else 1  # split variant is fwd-only
    if split > 1 and block_k % split == 0 and block_k // split >= 128:
        kernel = functools.partial(
            _fwd_kernel_packed_split, scale=scale, kv_len=kv_len,
            block_k=block_k, d=d, split_kv=split,
        )
    else:
        kernel = functools.partial(
            _fwd_kernel_packed, scale=scale, kv_len=kv_len, block_k=block_k, d=d,
            mxu_sum=_MXU_SUM if mxu_sum is None else mxu_sum, save_lse=save_lse,
        )
    compiler_params = _kernel_compiler_params(block_q, block_k, interpret)
    q_spec = pl.BlockSpec((1, block_q, d2), lambda b, i, j: (b, i, 0))
    out_shape = jax.ShapeDtypeStruct((bh2, sq_p, d2), q.dtype)
    if save_lse:
        out_specs = (q_spec, q_spec)
        out_shape = (out_shape, jax.ShapeDtypeStruct((bh2, sq_p, d2), jnp.float32))
    else:
        out_specs = q_spec
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            q_spec,
            pl.BlockSpec((1, block_k, d2), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d2), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, d2), jnp.float32),
            pltpu.VMEM((block_q, d2), jnp.float32),
            pltpu.VMEM((block_q, d2), jnp.float32),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )(q, k, v)
    if save_lse:
        out, lse = out
        if pad_q:
            out, lse = out[:, :sq], lse[:, :sq]
        return out, lse
    if pad_q:
        out = out[:, :sq]
    return out


def _bwd_kernel_plain_dkv(
    q_ref, do_ref, lse_ref, dd_ref, k_ref, v_ref, dk_ref, dv_ref,
    dk_acc, dv_acc, *, kv_len, block_k,
):
    """Plain-layout (d % 128 == 0) flash backward, dk/dv pass. Same
    structure as the packed variant without the lane tricks; q arrives with
    the fwd scale pre-folded. Serves the VAE's single 512-dim head, whose
    reference-recompute backward would otherwise materialize 4096² logits."""
    i = pl.program_id(2)
    ni = pl.num_programs(2)

    @pl.when(i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, :1]  # (bq, 1) fp32
    dd = dd_ref[0][:, :1]

    dn_t = (((1,), (1,)), ((), ()))
    dn_r = (((0,), (0,)), ((), ()))
    s = jax.lax.dot_general(q, k, dn_t, preferred_element_type=jnp.float32)
    if kv_len is not None:
        pos = pl.program_id(1) * block_k + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1
        )
        s = jnp.where(pos < kv_len, s, NEG_INF)
    p = jnp.exp(s - lse).astype(v.dtype)
    dv_acc[:] += jax.lax.dot_general(p, do, dn_r, preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, dn_t, preferred_element_type=jnp.float32)
    ds = (p.astype(jnp.float32) * (dp - dd)).astype(q.dtype)
    dk_acc[:] += jax.lax.dot_general(ds, q, dn_r, preferred_element_type=jnp.float32)

    @pl.when(i == ni - 1)
    def _fin():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_kernel_plain_dq(
    q_ref, do_ref, lse_ref, dd_ref, k_ref, v_ref, dq_ref, dq_acc,
    *, scale, kv_len, block_k,
):
    """Plain-layout flash backward, dq pass (kv innermost-sequential)."""
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, :1]
    dd = dd_ref[0][:, :1]

    dn_t = (((1,), (1,)), ((), ()))
    dn_n = (((1,), (0,)), ((), ()))
    s = jax.lax.dot_general(q, k, dn_t, preferred_element_type=jnp.float32)
    if kv_len is not None:
        pos = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(pos < kv_len, s, NEG_INF)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(do, v, dn_t, preferred_element_type=jnp.float32)
    ds = (p * (dp - dd)).astype(q.dtype)
    dq_acc[:] += jax.lax.dot_general(ds, k, dn_n, preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _fin():
        dq_ref[0] = (dq_acc[:] * scale).astype(dq_ref.dtype)


def _flash_bwd_3d_plain(
    q, k, v, o, lse, do, scale, kv_len, block_q, block_k, interpret
):
    """Plain-layout backward over (BH, S, D) with D % 128 == 0; lse is the
    (BH, S, 128) stat array from `_flash_fwd_3d(save_lse=True)`. q arrives
    UNscaled; the fwd scale is folded here and unfolded in the dq finalize."""
    bh, sq, d = q.shape
    skv = k.shape[1]
    block_q, block_k = _cap_blocks_for_dim(block_q, block_k, d)
    block_q = min(block_q, sq)
    block_k = min(block_k, skv)
    pad_q = (-sq) % block_q
    pad_k = (-skv) % block_k
    if pad_k and kv_len is None:
        kv_len = skv

    q = (q * jnp.asarray(scale, q.dtype)) if scale != 1.0 else q
    prod = do.astype(jnp.float32) * o.astype(jnp.float32)
    dd = jnp.broadcast_to(
        jnp.sum(prod, axis=-1, keepdims=True), (bh, sq, 128)
    )

    if pad_q:
        qpad = ((0, 0), (0, pad_q), (0, 0))
        q, do = jnp.pad(q, qpad), jnp.pad(do, qpad)
        lse, dd = jnp.pad(lse, qpad), jnp.pad(dd, qpad)
    if pad_k:
        kpad = ((0, 0), (0, pad_k), (0, 0))
        k, v = jnp.pad(k, kpad), jnp.pad(v, kpad)
    sq_p, skv_p = sq + pad_q, skv + pad_k

    compiler_params = _kernel_compiler_params(block_q, block_k, interpret)

    dkv_kernel = functools.partial(
        _bwd_kernel_plain_dkv, kv_len=kv_len, block_k=block_k
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(bh, skv_p // block_k, sq_p // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, jk, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, jk, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, jk, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, jk, i: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, jk, i: (b, jk, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, jk, i: (b, jk, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda b, jk, i: (b, jk, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, jk, i: (b, jk, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, skv_p, d), k.dtype),
            jax.ShapeDtypeStruct((bh, skv_p, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )(q, do, lse, dd, k, v)

    dq_kernel = functools.partial(
        _bwd_kernel_plain_dq, scale=scale, kv_len=kv_len, block_k=block_k
    )
    dq = pl.pallas_call(
        dq_kernel,
        grid=(bh, sq_p // block_q, skv_p // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, jk: (b, i, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, i, jk: (b, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, i, jk: (b, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, i, jk: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, jk: (b, jk, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, jk: (b, jk, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, jk: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=compiler_params,
        interpret=interpret,
    )(q, do, lse, dd, k, v)

    if pad_q:
        dq = dq[:, :sq]
    if pad_k:
        dk, dv = dk[:, :skv], dv[:, :skv]
    return dq, dk, dv


def _bwd_kernel_packed_dkv(
    q_ref, do_ref, lse_ref, dd_ref, k_ref, v_ref, dk_ref, dv_ref,
    dk_acc, dv_acc, *, kv_len, block_k, d,
):
    """Packed-layout flash backward, dk/dv pass (FlashAttention-2 eq. 13-21).

    Grid (BH2, nk, nq) with the q dim innermost-sequential; dk/dv accumulate
    in fp32 VMEM scratch and are written once at the final q block. Inputs
    carry the fwd scale folded into q, so dk = dsᵀ·q_scaled needs no extra
    scale. p is recomputed NORMALIZED from the saved lse (p̃ = exp(s − lse)),
    so there are no reductions anywhere — unlike the forward, this kernel is
    pure MXU + elementwise."""
    i = pl.program_id(2)
    ni = pl.num_programs(2)

    @pl.when(i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]    # (bq, 2d), scale pre-folded
    k = k_ref[0]    # (bk, 2d)
    v = v_ref[0]
    do = do_ref[0]  # (bq, 2d)
    lse = lse_ref[0]  # (bq, 2d) fp32; col 0 → head a, col d → head b
    dd = dd_ref[0]    # (bq, 2d) fp32 rowsum(dO∘O) per lane half

    zero = jnp.zeros((), q.dtype)
    lane_lo_q = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1) < d
    q_lo = jnp.where(lane_lo_q, q, zero)
    q_hi = jnp.where(lane_lo_q, zero, q)
    do_lo = jnp.where(lane_lo_q, do, zero)
    do_hi = jnp.where(lane_lo_q, zero, do)

    dn_t = (((1,), (1,)), ((), ()))   # contract lanes: (bq,2d)·(bk,2d) → (bq,bk)
    dn_r = (((0,), (0,)), ((), ()))   # contract rows:  (bq,bk)·(bq,2d) → (bk,2d)
    s_a = jax.lax.dot_general(q_lo, k, dn_t, preferred_element_type=jnp.float32)
    s_b = jax.lax.dot_general(q_hi, k, dn_t, preferred_element_type=jnp.float32)
    if kv_len is not None:
        pos = pl.program_id(1) * block_k + jax.lax.broadcasted_iota(
            jnp.int32, s_a.shape, 1
        )
        live = pos < kv_len
        s_a = jnp.where(live, s_a, NEG_INF)
        s_b = jnp.where(live, s_b, NEG_INF)
    p_a = jnp.exp(s_a - lse[:, :1]).astype(v.dtype)   # normalized p̃
    p_b = jnp.exp(s_b - lse[:, d : d + 1]).astype(v.dtype)

    dv_acc[:] += jax.lax.dot_general(
        p_a, do_lo, dn_r, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(p_b, do_hi, dn_r, preferred_element_type=jnp.float32)

    dp_a = jax.lax.dot_general(do_lo, v, dn_t, preferred_element_type=jnp.float32)
    dp_b = jax.lax.dot_general(do_hi, v, dn_t, preferred_element_type=jnp.float32)
    ds_a = (p_a.astype(jnp.float32) * (dp_a - dd[:, :1])).astype(q.dtype)
    ds_b = (p_b.astype(jnp.float32) * (dp_b - dd[:, d : d + 1])).astype(q.dtype)
    dk_acc[:] += jax.lax.dot_general(
        ds_a, q_lo, dn_r, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(ds_b, q_hi, dn_r, preferred_element_type=jnp.float32)

    @pl.when(i == ni - 1)
    def _fin():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_kernel_packed_dq(
    q_ref, do_ref, lse_ref, dd_ref, k_ref, v_ref, dq_ref, dq_acc,
    *, scale, kv_len, block_k, d,
):
    """Packed-layout flash backward, dq pass. Grid (BH2, nq, nk) with the kv
    dim innermost-sequential. q carries the fwd scale, so the finalize
    multiplies by `scale` once to convert d(loss)/d(q·scale) → d(loss)/dq."""
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]
    dd = dd_ref[0]

    zero = jnp.zeros((), q.dtype)
    lane_lo_q = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1) < d
    q_lo = jnp.where(lane_lo_q, q, zero)
    q_hi = jnp.where(lane_lo_q, zero, q)
    do_lo = jnp.where(lane_lo_q, do, zero)
    do_hi = jnp.where(lane_lo_q, zero, do)

    dn_t = (((1,), (1,)), ((), ()))
    dn_n = (((1,), (0,)), ((), ()))   # (bq,bk)·(bk,2d) → (bq,2d)
    s_a = jax.lax.dot_general(q_lo, k, dn_t, preferred_element_type=jnp.float32)
    s_b = jax.lax.dot_general(q_hi, k, dn_t, preferred_element_type=jnp.float32)
    if kv_len is not None:
        pos = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s_a.shape, 1)
        live = pos < kv_len
        s_a = jnp.where(live, s_a, NEG_INF)
        s_b = jnp.where(live, s_b, NEG_INF)
    p_a = jnp.exp(s_a - lse[:, :1])
    p_b = jnp.exp(s_b - lse[:, d : d + 1])

    dp_a = jax.lax.dot_general(do_lo, v, dn_t, preferred_element_type=jnp.float32)
    dp_b = jax.lax.dot_general(do_hi, v, dn_t, preferred_element_type=jnp.float32)
    ds_a = (p_a * (dp_a - dd[:, :1])).astype(q.dtype)
    ds_b = (p_b * (dp_b - dd[:, d : d + 1])).astype(q.dtype)

    g_a = jax.lax.dot_general(ds_a, k, dn_n, preferred_element_type=jnp.float32)
    g_b = jax.lax.dot_general(ds_b, k, dn_n, preferred_element_type=jnp.float32)
    lane_lo = jax.lax.broadcasted_iota(jnp.int32, dq_acc.shape, 1) < d
    dq_acc[:] += jnp.where(lane_lo, g_a, g_b)

    @pl.when(j == nj - 1)
    def _fin():
        dq_ref[0] = (dq_acc[:] * scale).astype(dq_ref.dtype)


def _flash_bwd_3d_packed(
    q, k, v, o, lse, do, scale, kv_len, block_q, block_k, interpret, d
):
    """Packed-layout backward: all of (q, k, v, o, lse, do) are
    (BH2, S, 2d) with q pre-scaled by the fwd scale. Returns (dq, dk, dv)
    w.r.t. the UNscaled packed inputs."""
    bh2, sq, d2 = q.shape
    skv = k.shape[1]
    block_q = min(block_q, sq)
    block_k = min(block_k, skv)
    pad_q = (-sq) % block_q
    pad_k = (-skv) % block_k
    if pad_k and kv_len is None:
        kv_len = skv

    # D = rowsum(dO ∘ O) per lane half, broadcast back to (.., 2d) so the
    # kernels read one aligned fp32 tile and slice columns 0 / d.
    prod = (do.astype(jnp.float32)) * (o.astype(jnp.float32))
    lane_lo = jnp.arange(d2) < d
    dd = jnp.where(
        lane_lo,
        jnp.sum(prod[..., :d], axis=-1, keepdims=True),
        jnp.sum(prod[..., d:], axis=-1, keepdims=True),
    )

    if pad_q:
        qpad = ((0, 0), (0, pad_q), (0, 0))
        q, do = jnp.pad(q, qpad), jnp.pad(do, qpad)
        lse, dd = jnp.pad(lse, qpad), jnp.pad(dd, qpad)
    if pad_k:
        kpad = ((0, 0), (0, pad_k), (0, 0))
        k, v = jnp.pad(k, kpad), jnp.pad(v, kpad)
    sq_p, skv_p = sq + pad_q, skv + pad_k

    q_spec = pl.BlockSpec((1, block_q, d2), lambda b, x, y: (b, x, 0))
    compiler_params = _kernel_compiler_params(block_q, block_k, interpret)

    # dk/dv pass: kv blocks outer-parallel, q blocks inner-sequential
    dkv_kernel = functools.partial(
        _bwd_kernel_packed_dkv, kv_len=kv_len, block_k=block_k, d=d
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(bh2, skv_p // block_k, sq_p // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d2), lambda b, jk, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, d2), lambda b, jk, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, d2), lambda b, jk, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, d2), lambda b, jk, i: (b, i, 0)),
            pl.BlockSpec((1, block_k, d2), lambda b, jk, i: (b, jk, 0)),
            pl.BlockSpec((1, block_k, d2), lambda b, jk, i: (b, jk, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d2), lambda b, jk, i: (b, jk, 0)),
            pl.BlockSpec((1, block_k, d2), lambda b, jk, i: (b, jk, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh2, skv_p, d2), k.dtype),
            jax.ShapeDtypeStruct((bh2, skv_p, d2), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d2), jnp.float32),
            pltpu.VMEM((block_k, d2), jnp.float32),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )(q, do, lse, dd, k, v)

    # dq pass: q blocks outer-parallel, kv blocks inner-sequential
    dq_kernel = functools.partial(
        _bwd_kernel_packed_dq, scale=scale, kv_len=kv_len, block_k=block_k, d=d
    )
    dq = pl.pallas_call(
        dq_kernel,
        grid=(bh2, sq_p // block_q, skv_p // block_k),
        in_specs=[
            q_spec,
            q_spec,
            q_spec,
            q_spec,
            pl.BlockSpec((1, block_k, d2), lambda b, i, jk: (b, jk, 0)),
            pl.BlockSpec((1, block_k, d2), lambda b, i, jk: (b, jk, 0)),
        ],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((bh2, sq_p, d2), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d2), jnp.float32)],
        compiler_params=compiler_params,
        interpret=interpret,
    )(q, do, lse, dd, k, v)

    if pad_q:
        dq = dq[:, :sq]
    if pad_k:
        dk, dv = dk[:, :skv], dv[:, :skv]
    return dq, dk, dv


def _pack_heads(x, d):
    """(B, S, H, d) → (B·⌈H/2⌉, S, 2d): adjacent head pairs side-by-side in
    the 128-lane dim (an odd head count pads one zero head)."""
    b, s, h, _ = x.shape
    h2 = h + h % 2
    if h % 2:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))
    return (
        x.reshape(b, s, h2 // 2, 2 * d).transpose(0, 2, 1, 3)
        .reshape(b * h2 // 2, s, 2 * d)
    )


def _unpack_heads(x, b, h, d):
    """Inverse of `_pack_heads`; drops the odd-head zero pad."""
    s = x.shape[1]
    h2 = h + h % 2
    x = (
        x.reshape(b, h2 // 2, s, 2 * d).transpose(0, 2, 1, 3)
        .reshape(b, s, h2, d)
    )
    return x[:, :, :h] if h % 2 else x


def _pallas_bwd_mode(d: int):
    """Which fused Pallas backward serves head dim `d`: 'packed' (d=64,
    two-per-lane-block), 'plain' (d % 128 == 0), or None (reference
    recompute VJP)."""
    if _BWD == "reference":
        return None
    if d * 2 == 128 and _IMPL != "official":
        return "packed"
    if d % 128 == 0:
        return "plain"
    return None


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7)
)
def _flash_attention(q, k, v, scale, kv_len, block_q, block_k, interpret):
    out, _ = _flash_attention_impl(
        q, k, v, scale, kv_len, block_q, block_k, interpret, save_lse=False
    )
    return out


def _flash_attention_impl(
    q, k, v, scale, kv_len, block_q, block_k, interpret, save_lse
):
    """Shared forward. Returns (out, residuals); residuals is the packed
    (qp·scale, kp, vp, o3, lse) tuple when save_lse, else None."""
    b, sq, h, d = q.shape
    skv = k.shape[1]
    if d * 2 == 128:
        q = (q * jnp.asarray(scale, q.dtype)) if scale != 1.0 else q  # fold scale
        if _IMPL == "official" and kv_len is None and skv >= 256 and not interpret:
            # the upstream kernel requires kv_seq_len >= its block sizes;
            # short-KV (77-token cross) stays on the in-house packed kernel
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention as _official,
            )

            h2 = h + h % 2
            if h % 2:
                q = jnp.pad(q, ((0, 0), (0, 0), (0, 1), (0, 0)))
                k = jnp.pad(k, ((0, 0), (0, 0), (0, 1), (0, 0)))
                v = jnp.pad(v, ((0, 0), (0, 0), (0, 1), (0, 0)))
            qo = q.reshape(b, sq, h2 // 2, 2 * d).transpose(0, 2, 1, 3)
            ko = k.reshape(b, skv, h2 // 2, 2 * d).transpose(0, 2, 1, 3)
            vo = v.reshape(b, skv, h2 // 2, 2 * d).transpose(0, 2, 1, 3)
            o = _official(qo, ko, vo, causal=False, sm_scale=1.0)
            o = o.transpose(0, 2, 1, 3).reshape(b, sq, h2, d)
            return (o[:, :, :h] if h % 2 else o), None
        qp = _pack_heads(q, d)
        kp = _pack_heads(k, d)
        vp = _pack_heads(v, d)
        res = _flash_fwd_3d_packed(
            qp, kp, vp, 1.0, kv_len, block_q, block_k, interpret, d,
            save_lse=save_lse,
        )
        if save_lse:
            o3, lse = res
            return _unpack_heads(o3, b, h, d), (qp, kp, vp, o3, lse)
        return _unpack_heads(res, b, h, d), None
    q3 = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    k3 = k.transpose(0, 2, 1, 3).reshape(b * h, skv, d)
    v3 = v.transpose(0, 2, 1, 3).reshape(b * h, skv, d)
    o3 = _flash_fwd_3d(q3, k3, v3, scale, kv_len, block_q, block_k, interpret)
    return o3.reshape(b, h, sq, d).transpose(0, 2, 1, 3), None


def _flash_fwd_rule(q, k, v, scale, kv_len, block_q, block_k, interpret):
    mode = _pallas_bwd_mode(q.shape[-1])
    if mode == "packed":
        out, res = _flash_attention_impl(
            q, k, v, scale, kv_len, block_q, block_k, interpret, save_lse=True
        )
        return out, res
    if mode == "plain":
        b, sq, h, d = q.shape
        skv = k.shape[1]
        q3 = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
        k3 = k.transpose(0, 2, 1, 3).reshape(b * h, skv, d)
        v3 = v.transpose(0, 2, 1, 3).reshape(b * h, skv, d)
        o3, lse = _flash_fwd_3d(
            q3, k3, v3, scale, kv_len, block_q, block_k, interpret,
            save_lse=True,
        )
        return o3.reshape(b, h, sq, d).transpose(0, 2, 1, 3), (q3, k3, v3, o3, lse)
    out = _flash_attention(q, k, v, scale, kv_len, block_q, block_k, interpret)
    return out, (q, k, v)


def _flash_bwd_rule(scale, kv_len, block_q, block_k, interpret, res, g):
    mode = _pallas_bwd_mode(g.shape[-1])
    if mode == "packed":
        qp, kp, vp, o3, lse = res
        b, sq, h, d = g.shape
        g3 = _pack_heads(g.astype(qp.dtype), d)
        dq3, dk3, dv3 = _flash_bwd_3d_packed(
            qp, kp, vp, o3, lse, g3, scale, kv_len,
            DEFAULT_BWD_BLOCK_Q, DEFAULT_BWD_BLOCK_K, interpret, d,
        )
        return (
            _unpack_heads(dq3, b, h, d),
            _unpack_heads(dk3, b, h, d),
            _unpack_heads(dv3, b, h, d),
        )
    if mode == "plain":
        q3, k3, v3, o3, lse = res
        b, sq, h, d = g.shape
        skv = k3.shape[1]
        g3 = g.transpose(0, 2, 1, 3).reshape(b * h, sq, d).astype(q3.dtype)
        dq3, dk3, dv3 = _flash_bwd_3d_plain(
            q3, k3, v3, o3, lse, g3, scale, kv_len,
            DEFAULT_BWD_BLOCK_Q, DEFAULT_BWD_BLOCK_K, interpret,
        )
        return (
            dq3.reshape(b, h, sq, d).transpose(0, 2, 1, 3),
            dk3.reshape(b, h, skv, d).transpose(0, 2, 1, 3),
            dv3.reshape(b, h, skv, d).transpose(0, 2, 1, 3),
        )
    from .attention import _reference_attention

    q, k, v = res
    _, vjp = jax.vjp(
        lambda q, k, v: _reference_attention(q, k, v, scale, kv_len), q, k, v
    )
    return vjp(g)


_flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    kv_len: Optional[int] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Flash attention over (B, S, H, D) tensors; non-causal."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _flash_attention(q, k, v, scale, kv_len, block_q, block_k, interpret)


# ---------------------------------------------------------------------------
# int8 forward (SageAttention-style, arXiv:2410.02367) — inference only
# ---------------------------------------------------------------------------


def _fwd_kernel_packed_int8(
    q_ref, k_ref, v_ref, sc_ref, o_ref, acc_ref, m_ref, l_ref,
    *, kv_len, block_k, d,
):
    """Packed two-heads int8 forward: q/k/v tiles are int8 (per-tensor
    symmetric scales), QKᵀ and PV run int8×int8→int32 on the MXU (2× the
    bf16 rate on v5e for the PV's long contraction), the online softmax
    stays fp32. The probability tile is requantized to int8 with the FIXED
    scale 1/127 (p ∈ [0, 1] by construction, so no reduce is needed — the
    SageAttention observation that makes int8 PV cheap).

    sc_ref (SMEM, (1, 2) fp32): [0] = sq·sk·softmax_scale (dequant of the
    int32 logits), [1] = sv/127 (dequant of the int32 PV accumulator).
    Numerics: q/k carry ≤ ~1% per-tensor int8 error and p quantizes on a
    1/127 grid — an approximation mode like DeepCache/w8a8, reported behind
    its own flag and measurable per checkpoint via accel-report."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # int8 (bq, 2d) = [qa | qb]
    k = k_ref[0]  # int8 (bk, 2d)
    v = v_ref[0]  # int8 (bk, 2d)
    c_qk = sc_ref[0, 0]
    c_v = sc_ref[0, 1]

    zero = jnp.zeros((), q.dtype)
    lane_lo_q = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1) < d
    q_lo = jnp.where(lane_lo_q, q, zero)
    q_hi = jnp.where(lane_lo_q, zero, q)
    dn = (((1,), (1,)), ((), ()))
    s_a = jax.lax.dot_general(
        q_lo, k, dn, preferred_element_type=jnp.int32
    ).astype(jnp.float32) * c_qk
    s_b = jax.lax.dot_general(
        q_hi, k, dn, preferred_element_type=jnp.int32
    ).astype(jnp.float32) * c_qk

    if kv_len is not None:
        pos = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s_a.shape, 1)
        live = pos < kv_len
        s_a = jnp.where(live, s_a, NEG_INF)
        s_b = jnp.where(live, s_b, NEG_INF)

    m_prev_a = m_ref[:, :1]
    m_prev_b = m_ref[:, d : d + 1]
    m_new_a = jnp.maximum(m_prev_a, jnp.max(s_a, axis=1, keepdims=True))
    m_new_b = jnp.maximum(m_prev_b, jnp.max(s_b, axis=1, keepdims=True))
    p_a = jnp.exp(s_a - m_new_a)
    p_b = jnp.exp(s_b - m_new_b)

    lane_lo = jax.lax.broadcasted_iota(jnp.int32, acc_ref.shape, 1) < d
    alpha = jnp.where(
        lane_lo, jnp.exp(m_prev_a - m_new_a), jnp.exp(m_prev_b - m_new_b)
    )

    # p ∈ [0,1] → int8 on the fixed 1/127 grid (truncation after +0.5 is
    # round-half-up; max 127.5 truncates to 127 — no clip needed)
    pa8 = (p_a * 127.0 + 0.5).astype(jnp.int8)
    pb8 = (p_b * 127.0 + 0.5).astype(jnp.int8)
    l_a = jnp.sum(p_a, axis=1, keepdims=True, dtype=jnp.float32)
    l_b = jnp.sum(p_b, axis=1, keepdims=True, dtype=jnp.float32)
    dn_av = (((1,), (0,)), ((), ()))
    d_a = jax.lax.dot_general(
        pa8, v, dn_av, preferred_element_type=jnp.int32
    ).astype(jnp.float32) * c_v
    d_b = jax.lax.dot_general(
        pb8, v, dn_av, preferred_element_type=jnp.int32
    ).astype(jnp.float32) * c_v

    acc_ref[:] = acc_ref[:] * alpha + jnp.where(lane_lo, d_a, d_b)
    m_ref[:] = jnp.where(lane_lo, m_new_a, m_new_b)
    l_ref[:] = l_ref[:] * alpha + jnp.where(lane_lo, l_a, l_b)

    @pl.when(j == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def _flash_fwd_3d_packed_int8(
    qp, kp, vp, scale, kv_len, block_q, block_k, interpret, d, out_dtype
):
    """int8 packed forward over pre-packed (BH2, S, 2d) bf16/fp32 tensors:
    per-tensor symmetric int8 quantization of q/k/v on the XLA side (three
    elementwise passes — amortized over the O(S²) attention), then the
    int8 kernel. Returns (BH2, Sq, 2d) in `out_dtype`."""
    bh2, sq, d2 = qp.shape
    skv = kp.shape[1]

    qf = qp.astype(jnp.float32)
    kf = kp.astype(jnp.float32)
    vf = vp.astype(jnp.float32)
    sq_s = jnp.maximum(jnp.max(jnp.abs(qf)), 1e-8) / 127.0
    sk_s = jnp.maximum(jnp.max(jnp.abs(kf)), 1e-8) / 127.0
    sv_s = jnp.maximum(jnp.max(jnp.abs(vf)), 1e-8) / 127.0
    q8 = jnp.clip(jnp.round(qf / sq_s), -127, 127).astype(jnp.int8)
    k8 = jnp.clip(jnp.round(kf / sk_s), -127, 127).astype(jnp.int8)
    v8 = jnp.clip(jnp.round(vf / sv_s), -127, 127).astype(jnp.int8)
    scalars = jnp.stack(
        [sq_s * sk_s * jnp.float32(scale), sv_s / 127.0]
    ).reshape(1, 2)

    block_q = min(block_q, sq)
    block_k = min(block_k, skv)
    pad_q = (-sq) % block_q
    pad_k = (-skv) % block_k
    if pad_k and kv_len is None:
        kv_len = skv
    if pad_q:
        q8 = jnp.pad(q8, ((0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k8 = jnp.pad(k8, ((0, 0), (0, pad_k), (0, 0)))
        v8 = jnp.pad(v8, ((0, 0), (0, pad_k), (0, 0)))
    sq_p, skv_p = sq + pad_q, skv + pad_k

    grid = (bh2, sq_p // block_q, skv_p // block_k)
    kernel = functools.partial(
        _fwd_kernel_packed_int8, kv_len=kv_len, block_k=block_k, d=d
    )
    q_spec = pl.BlockSpec((1, block_q, d2), lambda b, i, j: (b, i, 0))
    if pltpu is not None and not interpret:
        sc_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    else:
        sc_spec = pl.BlockSpec((1, 2), lambda b, i, j: (0, 0))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            q_spec,
            pl.BlockSpec((1, block_k, d2), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d2), lambda b, i, j: (b, j, 0)),
            sc_spec,
        ],
        out_specs=pl.BlockSpec((1, block_q, d2), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh2, sq_p, d2), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d2), jnp.float32),
            pltpu.VMEM((block_q, d2), jnp.float32),
            pltpu.VMEM((block_q, d2), jnp.float32),
        ],
        compiler_params=_kernel_compiler_params(block_q, block_k, interpret),
        interpret=interpret,
    )(q8, k8, v8, scalars)
    if pad_q:
        out = out[:, :sq]
    return out


def flash_attention_int8(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    kv_len: Optional[int] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """int8 flash attention over (B, S, H, D), non-causal, INFERENCE ONLY
    (the quantizers have no useful gradient — like the w8a8 tree, this is
    an opt-in serving mode, selected via attn impl "flash_int8").

    Only the packed d=64 path (the SD2.1 UNet's every attention) runs
    int8; other head dims fall back to the exact bf16 flash kernel (the
    VAE's d=512 mid-block attention is ~0.3% of decode FLOPs)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, sqq, h, d = q.shape
    if d * 2 != 128:
        return flash_attention(
            q, k, v, scale=scale, kv_len=kv_len,
            block_q=block_q, block_k=block_k, interpret=interpret,
        )
    qp = _pack_heads(q, d)
    kp = _pack_heads(k, d)
    vp = _pack_heads(v, d)
    o3 = _flash_fwd_3d_packed_int8(
        qp, kp, vp, scale, kv_len, block_q, block_k, interpret, d, q.dtype
    )
    return _unpack_heads(o3, b, h, d)
