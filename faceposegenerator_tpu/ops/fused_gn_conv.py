"""Fused GroupNorm+SiLU → conv3x3 Pallas kernel (conv-prologue fusion).

The last untried structural lever on the sampler's non-attention bucket
(VERDICT r2 #5; STATUS.md roofline): the standalone single-read GN kernel
lost to XLA's consumer fusion, so this kernel goes one step further and
folds normalize+SiLU into the FOLLOWING conv's input stream — the
resblock's `conv(silu(gn(x)))` (`models/unet2d._resblock_apply`, reference
diffusers ResnetBlock2D at `train_ID-Booth.py:1040`) becomes:

    stats pass (XLA, one read of x) → THIS KERNEL (one read of x):
        stream x row-chunks → normalize+SiLU on load → zero-padded VMEM
        slab → 9 shifted (rows·W, C)@(C, K) MXU matmuls → y

so the normalized activation tensor never exists in HBM at all.

Design notes (TPU):
- grid (N, 2, nblk): phase 0 copies row-chunks into a (H+2, W+2, C)
  zero-padded slab applying `x·scale + shift → silu` inline (scale/shift are
  the per-(image, channel) group statistics, precomputed by the cheap XLA
  stats pass — 2 reads of x total across stats+kernel, same as XLA's GN
  alone). Phase 1 computes output row-chunks as 9 tap matmuls from the
  resident slab (fp32 accumulator scratch), adds bias, writes out.
- the 3x3/pad-1 conv is expressed as 9 static shifted views of the padded
  slab — no halo DMAs, no im2col materialization; every tap is a full-lane
  (rows·W, C) × (C, K) MXU contraction.
- eligibility: C, K ≤ 640 (tap-weight VMEM), H·W chunkable by whole image
  rows; the big-C mid/up levels keep the XLA path (tiny spatial extents).

Backward: custom_vjp recomputing through the XLA formulation (the kernel is
an inference-path optimization; training keeps XLA's saved-residual conv
backward).
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

_IMPL = _os.environ.get("GN_CONV_IMPL", "xla")  # xla | pallas
_MAX_C = 640
_ROWS_PER_CHUNK = int(_os.environ.get("GN_CONV_ROWS", "8"))  # image rows / chunk


def gn_conv_impl() -> str:
    return _IMPL


def supported(n: int, h: int, w: int, cin: int, cout: int, num_groups: int) -> bool:
    if pl is None or pltpu is None:
        return False
    if cin > _MAX_C or cout > _MAX_C or cin % num_groups:
        return False
    hr = min(h, _ROWS_PER_CHUNK)
    if h % hr:
        return False
    # slab + weights + acc must fit scoped VMEM comfortably
    slab = (h + 2) * (w + 2) * cin * 2
    wts = 9 * cin * cout * 2
    acc = hr * w * cout * 4
    return slab + wts + acc < 12 * 1024 * 1024


def group_scale_shift(x, gamma, beta, num_groups: int, eps: float):
    """Per-(image, channel) affine from group statistics: the XLA stats pass
    (ONE read of x). normalize(x) == x·scale + shift."""
    n, c = x.shape[0], x.shape[-1]
    g = num_groups
    x32 = x.astype(jnp.float32).reshape(n, -1, c)
    ch_mean = jnp.mean(x32, axis=1)
    ch_sq = jnp.mean(jnp.square(x32), axis=1)
    gmean = jnp.mean(ch_mean.reshape(n, g, c // g), axis=2)
    gsq = jnp.mean(ch_sq.reshape(n, g, c // g), axis=2)
    gvar = gsq - jnp.square(gmean)
    inv = jax.lax.rsqrt(gvar + eps)  # (n, g)
    inv_c = jnp.repeat(inv, c // g, axis=1)  # (n, c)
    mean_c = jnp.repeat(gmean, c // g, axis=1)
    scale = inv_c * gamma.astype(jnp.float32)[None, :]
    shift = beta.astype(jnp.float32)[None, :] - mean_c * scale
    return scale, shift


def _kernel(
    x_ref, scale_ref, shift_ref, w_ref, b_ref, o_ref, slab_ref, acc_ref,
    *, h, w, cin, cout, hr,
):
    ph = pl.program_id(1)
    i = pl.program_id(2)

    @pl.when((ph == 0) & (i == 0))
    def _zero_slab():
        slab_ref[:] = jnp.zeros_like(slab_ref)  # pad border = conv zero-pad

    @pl.when(ph == 0)
    def _load_normalize():
        blk = x_ref[0].astype(jnp.float32)  # (hr·w, cin)
        out = blk * scale_ref[:] + shift_ref[:]
        out = out * jax.nn.sigmoid(out)  # SiLU
        slab_ref[pl.ds(i * hr + 1, hr), pl.ds(1, w), :] = out.reshape(
            hr, w, cin
        ).astype(slab_ref.dtype)

    @pl.when(ph == 1)
    def _conv():
        acc = jnp.zeros((hr * w, cout), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                tap = slab_ref[pl.ds(i * hr + dy, hr), pl.ds(dx, w), :]
                tap2 = tap.reshape(hr * w, cin)
                acc += jax.lax.dot_general(
                    tap2, w_ref[dy * 3 + dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        acc_ref[:] = acc + b_ref[:].astype(jnp.float32)
        o_ref[0] = acc_ref[:].astype(o_ref.dtype)


def _call(x3, scale, shift, w9, bias, h, w, cin, cout, interpret):
    n = x3.shape[0]
    hr = min(h, _ROWS_PER_CHUNK)
    nblk = h // hr
    rows = hr * w
    kernel = functools.partial(_kernel, h=h, w=w, cin=cin, cout=cout, hr=hr)
    compiler_params = None
    if pltpu is not None and not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        )
    return pl.pallas_call(
        kernel,
        grid=(n, 2, nblk),
        in_specs=[
            # phase 0 walks the row-chunks; phase 1 pins chunk 0 (reads only
            # the slab) so x is fetched exactly once per image
            pl.BlockSpec((1, rows, cin), lambda b, ph, i: (b, (1 - ph) * i, 0)),
            pl.BlockSpec((1, cin), lambda b, ph, i: (b, 0)),
            pl.BlockSpec((1, cin), lambda b, ph, i: (b, 0)),
            pl.BlockSpec((9, cin, cout), lambda b, ph, i: (0, 0, 0)),
            pl.BlockSpec((1, cout), lambda b, ph, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, cout), lambda b, ph, i: (b, ph * i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h * w, cout), x3.dtype),
        scratch_shapes=[
            pltpu.VMEM((h + 2, w + 2, cin), x3.dtype),
            pltpu.VMEM((rows, cout), jnp.float32),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )(x3, scale, shift, w9, bias.reshape(1, cout))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def gn_silu_conv3x3(
    x, gamma, beta, conv_w, conv_b, num_groups=32, eps=1e-5, interpret=False
):
    """conv3x3(silu(group_norm(x))) with the normalized tensor never hitting
    HBM. x: (N, H, W, Cin) NHWC; conv_w: (3, 3, Cin, Cout) HWIO. Caller must
    have checked `supported`."""
    n, h, w, cin = x.shape
    cout = conv_w.shape[-1]
    scale, shift = group_scale_shift(x, gamma, beta, num_groups, eps)
    w9 = conv_w.reshape(9, cin, cout).astype(x.dtype)
    out = _call(
        x.reshape(n, h * w, cin), scale, shift, w9,
        conv_b.astype(jnp.float32), h, w, cin, cout, interpret,
    )
    return out.reshape(n, h, w, cout)


def _reference(x, gamma, beta, conv_w, conv_b, num_groups, eps):
    from ..models.unet2d import conv2d
    from .norms import group_norm

    h = group_norm(x, gamma, beta, num_groups=num_groups, eps=eps, act="silu")
    return conv2d(h, {"w": conv_w, "b": conv_b})


def _fwd(x, gamma, beta, conv_w, conv_b, num_groups, eps, interpret):
    return (
        gn_silu_conv3x3(x, gamma, beta, conv_w, conv_b, num_groups, eps, interpret),
        (x, gamma, beta, conv_w, conv_b),
    )


def _bwd(num_groups, eps, interpret, res, g):
    x, gamma, beta, conv_w, conv_b = res
    _, vjp = jax.vjp(
        lambda x_, g_, b_, w_, cb_: _reference(x_, g_, b_, w_, cb_, num_groups, eps),
        x, gamma, beta, conv_w, conv_b,
    )
    return vjp(g)


gn_silu_conv3x3.defvjp(_fwd, _bwd)
