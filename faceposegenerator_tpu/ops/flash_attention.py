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

# measured on v5e (512² SD2.1 bs16 sampling, 2026-08-16): 512/1024 → 1.85,
# 512/2048 → 1.82, 1024/1024 → 1.90 img/s end-to-end
DEFAULT_BLOCK_Q = int(_os.environ.get("FLASH_BLOCK_Q", "1024"))
DEFAULT_BLOCK_K = int(_os.environ.get("FLASH_BLOCK_K", "1024"))
_BF16_EXP = _os.environ.get("FLASH_BF16_EXP", "0") == "1"
_EXP2 = _os.environ.get("FLASH_EXP2", "0") == "1"
LOG2E = 1.4426950408889634
# FLASH_IMPL=official routes packed self-attention through
# jax.experimental.pallas.ops.tpu.flash_attention (heavier-tuned Mosaic
# scheduling) — packing to d=128 is still ours; cross-attention (kv_len)
# keeps the in-house kernel
_IMPL = _os.environ.get("FLASH_IMPL", "own")


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


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *, scale, kv_len, block_k):
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


def _flash_fwd_3d(q, k, v, scale, kv_len, block_q, block_k, interpret):
    """q: (BH, Sq, D); k, v: (BH, Skv, D). Returns (BH, Sq, D)."""
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
        _fwd_kernel, scale=scale, kv_len=kv_len, block_k=block_k
    )
    compiler_params = None
    if pltpu is not None and not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )(q, k, v)
    if pad_q:
        out = out[:, :sq]
    return out


def _fwd_kernel_packed(
    q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *, scale, kv_len, block_k, d
):
    """Two heads packed side-by-side in the 128-lane dim ([qa|qb], d=64 each).

    QKᵀ contracts the full 128 lanes against a block-diagonal K extension
    ([ka|0; 0|kb] rows), yielding side-by-side logits (bq, 2·bk) with the two
    heads in disjoint column halves; the online softmax runs per half with
    the (m, l) state stored columnwise (lanes < d hold head a's statistics).
    All tile loads are full-lane — the half-lane padding waste of running
    d=64 heads through the plain kernel disappears."""
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
        l_a = jnp.sum(p_a, axis=1, keepdims=True, dtype=jnp.float32)
        l_b = jnp.sum(p_b, axis=1, keepdims=True, dtype=jnp.float32)
    elif _EXP2:
        # bench knob: exp(x) = 2^(x·log2 e) — exp2 is the VPU-native
        # transcendental; one (bq,1) rescale of m replaces per-element work.
        # Exact up to one extra fp32 multiply per element.
        p_a = jnp.exp2((s_a - m_new_a) * LOG2E)
        p_b = jnp.exp2((s_b - m_new_b) * LOG2E)
        l_a = jnp.sum(p_a, axis=1, keepdims=True)
        l_b = jnp.sum(p_b, axis=1, keepdims=True)
    else:
        p_a = jnp.exp(s_a - m_new_a)
        p_b = jnp.exp(s_b - m_new_b)
        l_a = jnp.sum(p_a, axis=1, keepdims=True)
        l_b = jnp.sum(p_b, axis=1, keepdims=True)

    lane_lo = jax.lax.broadcasted_iota(jnp.int32, acc_ref.shape, 1) < d  # (bq, 2d)
    alpha = jnp.where(
        lane_lo, jnp.exp(m_prev_a - m_new_a), jnp.exp(m_prev_b - m_new_b)
    )

    dn_av = (((1,), (0,)), ((), ()))
    d_a = jax.lax.dot_general(
        p_a.astype(v.dtype), v, dn_av, preferred_element_type=jnp.float32
    )  # lanes < d hold pa·va; upper lanes (pa·vb) are discarded by the select
    d_b = jax.lax.dot_general(
        p_b.astype(v.dtype), v, dn_av, preferred_element_type=jnp.float32
    )
    acc_ref[:] = acc_ref[:] * alpha + jnp.where(lane_lo, d_a, d_b)
    m_ref[:] = jnp.where(lane_lo, m_new_a, m_new_b)
    l_ref[:] = l_ref[:] * alpha + jnp.where(lane_lo, l_a, l_b)

    @pl.when(j == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def _flash_fwd_3d_packed(q, k, v, scale, kv_len, block_q, block_k, interpret, d):
    """q: (BH2, Sq, 2d); k, v: (BH2, Skv, 2d) with two d-dim heads packed in
    the last axis. Returns (BH2, Sq, 2d)."""
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
    kernel = functools.partial(
        _fwd_kernel_packed, scale=scale, kv_len=kv_len, block_k=block_k, d=d
    )
    compiler_params = None
    if pltpu is not None and not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d2), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d2), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d2), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d2), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh2, sq_p, d2), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d2), jnp.float32),
            pltpu.VMEM((block_q, d2), jnp.float32),
            pltpu.VMEM((block_q, d2), jnp.float32),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )(q, k, v)
    if pad_q:
        out = out[:, :sq]
    return out


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7)
)
def _flash_attention(q, k, v, scale, kv_len, block_q, block_k, interpret):
    b, sq, h, d = q.shape
    skv = k.shape[1]
    if d * 2 == 128:
        # pack adjacent head pairs into the 128-lane dim; the (h, d) →
        # (h/2, 2d) reshape is zero-copy in BSHD layout
        h2 = h + h % 2
        if h % 2:
            q = jnp.pad(q, ((0, 0), (0, 0), (0, 1), (0, 0)))
            k = jnp.pad(k, ((0, 0), (0, 0), (0, 1), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, 0), (0, 1), (0, 0)))
        q = (q * jnp.asarray(scale, q.dtype)) if scale != 1.0 else q  # fold scale
        if _IMPL == "official" and kv_len is None and skv >= 256 and not interpret:
            # the upstream kernel requires kv_seq_len >= its block sizes;
            # short-KV (77-token cross) stays on the in-house packed kernel
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention as _official,
            )

            qo = q.reshape(b, sq, h2 // 2, 2 * d).transpose(0, 2, 1, 3)
            ko = k.reshape(b, skv, h2 // 2, 2 * d).transpose(0, 2, 1, 3)
            vo = v.reshape(b, skv, h2 // 2, 2 * d).transpose(0, 2, 1, 3)
            o = _official(qo, ko, vo, causal=False, sm_scale=1.0)
            o = o.transpose(0, 2, 1, 3).reshape(b, sq, h2, d)
            return o[:, :, :h] if h % 2 else o
        qp = q.reshape(b, sq, h2 // 2, 2 * d).transpose(0, 2, 1, 3).reshape(b * h2 // 2, sq, 2 * d)
        kp = k.reshape(b, skv, h2 // 2, 2 * d).transpose(0, 2, 1, 3).reshape(b * h2 // 2, skv, 2 * d)
        vp = v.reshape(b, skv, h2 // 2, 2 * d).transpose(0, 2, 1, 3).reshape(b * h2 // 2, skv, 2 * d)
        o = _flash_fwd_3d_packed(qp, kp, vp, 1.0, kv_len, block_q, block_k, interpret, d)
        o = o.reshape(b, h2 // 2, sq, 2 * d).transpose(0, 2, 1, 3).reshape(b, sq, h2, d)
        return o[:, :, :h] if h % 2 else o
    q3 = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    k3 = k.transpose(0, 2, 1, 3).reshape(b * h, skv, d)
    v3 = v.transpose(0, 2, 1, 3).reshape(b * h, skv, d)
    o3 = _flash_fwd_3d(q3, k3, v3, scale, kv_len, block_q, block_k, interpret)
    return o3.reshape(b, h, sq, d).transpose(0, 2, 1, 3)


def _flash_fwd_rule(q, k, v, scale, kv_len, block_q, block_k, interpret):
    out = _flash_attention(q, k, v, scale, kv_len, block_q, block_k, interpret)
    return out, (q, k, v)


def _flash_bwd_rule(scale, kv_len, block_q, block_k, interpret, res, g):
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
