"""Opt-in int8 (w8a8) inference quantization.

TPU v5e's MXU runs int8×int8→int32 at 2× the bf16 rate (394.7 vs 197
TOPS), and int8 weights halve the HBM weight stream — the two hardware
levers the exact bf16 path cannot reach. This module quantizes a
functional param tree IN PLACE OF its `"w"` leaves: a weight array is
replaced by `{"q": int8, "s": float32 per-out-channel scale}`, so every
call site keeps passing the same pytree and the two matmul primitives
(`unet2d.conv2d`, `ops.lora.lora_dense`) dispatch on the leaf type.
Everything else (biases, norms, LoRA deltas, softmax) stays bf16/fp32.

Scheme (standard dynamic-activation recipe, cf. SmoothQuant/AQT):
  - weights: symmetric per-out-channel int8 (HWIO convs: channel = last
    axis; (out, in) torch-orientation denses: channel = axis 0),
  - activations: dynamic symmetric int8 — per-TOKEN scales for dense
    (a row max commutes with the contraction) and per-SAMPLE scales for
    conv (each output pixel of sample b reads only sample b's inputs,
    so a (B,1,1,1) scale is exact under the spatial window),
  - accumulate int32 on the MXU, rescale in fp32, add bias, cast back.

OPT-IN and inference-only: the exact bf16 program is untouched unless a
quantized tree is passed (`round` has no useful gradient). The reference
has no quantized path (fp16/TF32 autocast only, `train_ID-Booth.py:60`);
this is a TPU-native serving lever, reported separately from the exact
bench metric like DeepCache/ToMe.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_EPS = 1e-8

# QUANT_DENSE_IMPL=int8|dequant|mixed|pallas — how qdense runs the base matmul.
#   int8:    quantize activations per-token, int8×int8→int32 on the MXU.
#   dequant: weight-only int8 (w8): dequantize q·s to the activation dtype
#            inside the dot — weight HBM still halved, activations exact
#            (no per-token quantize pass), matmul on the bf16 MXU path.
#   mixed:   per-shape routing from the differenced-chain probe
#            (perf/r3aj_queue.jsonl): int8 for contraction width
#            K ≥ QUANT_MIXED_K (default 512 — probe: 1.53×/1.78× at
#            K=640/1280), dequant below it (probe read 1.87× vs int8's
#            1.13× at K=320, possibly an epilogue-fusion artifact —
#            benched end-to-end before trusting).
#   pallas:  fused quantize+int8-dot+rescale kernel (ops/quant_pallas.py)
#            — x read from HBM once instead of the XLA path's 2–3 extra
#            act-quant passes; output rounded to x.dtype in-kernel.
# Measured (RTT-cancelled probe v4, perf/r3ah_queue.jsonl — earlier probes
# carried the ~25 ms axon RTT inside the timed region and deflated every
# rate): PURE int8 dots run 2.07× bf16 (367 vs 177 TOPS) and int8 3×3
# convs 1.77×, but int8 1×1-conv LOWERINGS run 0.77× (qconv2d therefore
# routes 1×1 kernels through the dot form). End-to-end, int8 vs dequant
# dense measured a wash (2.327 vs 2.312 img/s, perf/r3ag_queue.jsonl):
# the dynamic per-token quantize is 2 extra HBM passes over x plus an
# fp32 epilogue, which at the UNet's small contraction widths eats the
# MXU win — the memory-bound act-quant, not the int8 dot rate, is the
# dense gap (see perf/r3aj_dense_probe.py).
_DENSE_IMPL = os.environ.get("QUANT_DENSE_IMPL", "int8")
_MIXED_K = int(os.environ.get("QUANT_MIXED_K", "512"))
# QUANT_CONV1X1=conv|dot — 1×1-kernel routing. The isolated-op probe said
# dot (int8 dot 2.07× vs int8 1×1-conv 0.77×, perf/r3ah_queue.jsonl), but
# IN PROGRAM the dot form measured a same-day −2.4% on the w8a8 sampler
# (2.276 vs 2.332, perf/r3al_queue.jsonl): its exact per-pixel activation
# scales are a full per-pixel reduce where the conv form's per-sample
# scale amortizes, and XLA fuses the conv into its neighbors. Op-level
# rates do not survive context — default stays conv, measured.
_CONV1X1 = os.environ.get("QUANT_CONV1X1", "conv")


def is_quantized(w) -> bool:
    """True if `w` is a quantized-weight dict produced by quantize_weight."""
    return isinstance(w, dict) and "q" in w


def weight_shape(w):
    """Shape of a weight leaf, quantized or not (int8 q keeps w's shape)."""
    return w["q"].shape if is_quantized(w) else w.shape


def quantize_weight(w: jax.Array, channel_axis: int) -> dict:
    """Symmetric per-out-channel int8: q = round(w / s), s = absmax/127."""
    wf = jnp.asarray(w, jnp.float32)
    axes = tuple(a for a in range(wf.ndim) if a != channel_axis % wf.ndim)
    s = jnp.maximum(jnp.max(jnp.abs(wf), axis=axes, keepdims=True), _EPS) / 127.0
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s.reshape(-1).astype(jnp.float32)}


def _quantize_act(xf: jax.Array, axes) -> tuple[jax.Array, jax.Array]:
    """Dynamic symmetric int8 over `axes`; returns (x_q, scale keepdims)."""
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=axes, keepdims=True), _EPS) / 127.0
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def _qdense_impl(x: jax.Array, q: jax.Array, s: jax.Array) -> jax.Array:
    """Shared dense body over int8 (out, in) q and (out,) s; returns fp32."""
    impl = _DENSE_IMPL
    if impl == "mixed":
        impl = "int8" if q.shape[1] >= _MIXED_K else "dequant"
    if impl == "pallas":
        from . import quant_pallas

        return quant_pallas.qdense_pallas(
            x, q, s, interpret=jax.default_backend() != "tpu"
        )
    if impl == "dequant":
        # w8: int8 weights streamed from HBM, dequantized into the dot's
        # operand read (XLA fuses convert×scale into the GEMM) — bf16 MXU
        # path, exact activations.
        w = q.astype(x.dtype) * s.astype(x.dtype)[:, None]
        return jnp.einsum("...i,oi->...o", x, w, preferred_element_type=jnp.float32)
    xq, sx = _quantize_act(x.astype(jnp.float32), axes=-1)
    acc = jnp.einsum("...i,oi->...o", xq, q, preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sx * s


def qdense(x: jax.Array, w: dict) -> jax.Array:
    """x·Wᵀ over a quantized weight; returns fp32 (caller adds bias).

    w: {"q": int8 (out, in), "s": f32 (out,)}. int8 mode uses per-token
    activation scales: the row max over the contracted axis commutes with
    the dot, so the rescale is exact for the quantized operands. dequant
    mode (default, see _DENSE_IMPL) keeps activations exact.
    """
    return _qdense_impl(x, w["q"], w["s"])


def qdense_fused(x: jax.Array, ws: list) -> jax.Array:
    """One GEMM over concatenated (out, in) weights (fused qkv path)."""
    q = jnp.concatenate([w["q"] for w in ws], axis=0)
    s = jnp.concatenate([w["s"] for w in ws], axis=0)
    return _qdense_impl(x, q, s)


def qconv2d(x: jax.Array, p: dict, stride=1, padding=1) -> jax.Array:
    """NHWC conv with int8 HWIO weights + per-sample int8 activations;
    int32 MXU accumulation, fp32 rescale + bias, cast back to x.dtype.

    QUANT_CONV1X1=dot routes 1×1 kernels through the dot lowering with
    exact per-pixel activation scales (a 1×1 conv is a per-pixel dense) —
    faster as an isolated op (probe v4) but measured −2.4% in the real
    sampler program (see the _CONV1X1 comment above), so conv is the
    default."""
    w = p["w"]
    kh, kw = w["q"].shape[:2]
    pad_zero = padding == 0 or padding == ((0, 0), (0, 0))
    if kh == 1 and kw == 1 and pad_zero and _CONV1X1 == "dot":
        if stride != 1:
            x = x[:, ::stride, ::stride, :]
        xq, sx = _quantize_act(x.astype(jnp.float32), axes=-1)
        acc = jnp.einsum(
            "bhwi,io->bhwo", xq, w["q"][0, 0], preferred_element_type=jnp.int32
        )
        y = acc.astype(jnp.float32) * sx * w["s"]
        return y.astype(x.dtype) + p["b"].astype(x.dtype)
    xq, sx = _quantize_act(x.astype(jnp.float32), axes=(1, 2, 3))
    dn = jax.lax.conv_dimension_numbers(x.shape, w["q"].shape, ("NHWC", "HWIO", "NHWC"))
    pad = ((padding, padding), (padding, padding)) if isinstance(padding, int) else padding
    acc = jax.lax.conv_general_dilated(
        xq, w["q"], window_strides=(stride, stride), padding=pad,
        dimension_numbers=dn, preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sx * w["s"]
    return y.astype(x.dtype) + p["b"].astype(x.dtype)


# ---------------------------------------------------------------------------
# tree transforms
# ---------------------------------------------------------------------------

# shallow/tiny/sensitive layers kept bf16 (standard first/last-layer rule;
# the time path feeds EVERY resblock's shift so its error is global)
UNET_SKIP = ("conv_in", "conv_out", "time_embedding", "time_emb_proj")
# stem + head out of int8 (the reference already keeps fc out of autocast,
# FR_training/backbones/iresnet.py:156-158); SE gates are 1×1 on pooled
# (B,1,1,C) — negligible compute, sigmoid-sensitive. ("conv1",) is an
# EXACT-path entry: it skips only the top-level stem, not the residual
# blocks' conv1 (same key name).
IRESNET_SKIP = (("conv1",), "fc", "se_fc1", "se_fc2")


def _skipped(path, skip) -> bool:
    """A string entry matches any path component; a tuple entry matches the
    exact path of the dict holding the weight."""
    for s in skip:
        if isinstance(s, tuple):
            if path == s:
                return True
        elif s in path:
            return True
    return False


def quantize_tree(tree, skip=(), _path=()):
    """Replace every eligible `"w"` leaf (2-D dense in torch (out, in)
    orientation, 4-D HWIO conv) with its int8 form, except under a path
    named in `skip` (see `_skipped`). Biases/norms/BN stats pass through."""
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            if (
                k == "w"
                and hasattr(v, "ndim")
                and v.ndim in (2, 4)
                and not _skipped(_path, skip)
            ):
                out[k] = quantize_weight(v, channel_axis=(-1 if v.ndim == 4 else 0))
            else:
                out[k] = quantize_tree(v, skip, _path + (k,))
        return out
    if isinstance(tree, (list, tuple)):
        return type(tree)(quantize_tree(v, skip, _path) for v in tree)
    return tree


def quantize_unet(params: dict) -> dict:
    """w8a8 UNet: all resnet/attention/GEGLU/up-down-sample weights int8."""
    return quantize_tree(params, skip=UNET_SKIP)


def quantize_iresnet(params: dict) -> dict:
    """w8a8 IResNet body for the embed path (stem/SE/fc stay bf16/fp32)."""
    return quantize_tree(params, skip=IRESNET_SKIP)
