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

import contextlib
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
    """True if `w` is a quantized-weight dict produced by quantize_weight.

    The int8-dtype check matters: module dicts can legitimately carry a
    "q" SUBMODULE key (attention query projections), which must not be
    mistaken for a quantized leaf."""
    return (
        isinstance(w, dict)
        and "q" in w
        and "s" in w
        and getattr(w["q"], "dtype", None) == jnp.int8
    )


def weight_shape(w):
    """Shape of a weight leaf, quantized or not (int8 q keeps w's shape)."""
    return w["q"].shape if is_quantized(w) else w.shape


def quantize_weight(w: jax.Array, channel_axis: int, act_scale=None) -> dict:
    """Symmetric per-out-channel int8: q = round(w / s), s = absmax/127.

    `act_scale`: optional STATIC per-tensor activation scale — stored as a
    scalar `"a"` leaf; its presence switches this site's activation quantize
    from dynamic (amax reduce + rescale) to a pure elementwise
    round(x/a)·clip, removing the reduce pass over x (see `qdense`). Scales
    come from `observe_act_scales`/`freeze_act_scales` calibration (or a
    probe constant)."""
    wf = jnp.asarray(w, jnp.float32)
    axes = tuple(a for a in range(wf.ndim) if a != channel_axis % wf.ndim)
    s = jnp.maximum(jnp.max(jnp.abs(wf), axis=axes, keepdims=True), _EPS) / 127.0
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    out = {"q": q, "s": s.reshape(-1).astype(jnp.float32)}
    if act_scale is not None:
        out["a"] = jnp.asarray(act_scale, jnp.float32)
    return out


# Execution-order-free calibration side channel: maps id(q_array) -> running
# activation absmax, filled by the ops while `observe_act_scales` is active
# (EAGER execution only — under jit the float() below raises on tracers,
# loudly rejecting mis-use).
_CALIB = None


def _quantize_act(xf: jax.Array, axes) -> tuple[jax.Array, jax.Array]:
    """Dynamic symmetric int8 over `axes`; returns (x_q, scale keepdims)."""
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=axes, keepdims=True), _EPS) / 127.0
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def _quantize_act_static(xf: jax.Array, a: jax.Array) -> jax.Array:
    """Static symmetric int8 with a per-tensor scale: NO reduce over x —
    the whole quantize is elementwise, so XLA fuses it into x's producer
    (which then writes int8, halving that HBM write) instead of re-reading
    x for an amax pass."""
    return jnp.clip(jnp.round(xf / a), -127, 127).astype(jnp.int8)


def _observe(q: jax.Array, xf: jax.Array) -> None:
    """Record this site's activation absmax under `observe_act_scales`."""
    if _CALIB is not None:
        amax = float(jnp.max(jnp.abs(xf)))
        key = id(q)
        _CALIB[key] = max(_CALIB.get(key, 0.0), amax)


def _qdense_impl(x: jax.Array, q: jax.Array, s: jax.Array, a=None) -> jax.Array:
    """Shared dense body over int8 (out, in) q and (out,) s; returns fp32.

    `a`: optional static per-tensor activation scale — when present the
    int8 path quantizes x elementwise against it (no per-token amax
    reduce); presence in the weight leaf is the opt-in."""
    if a is not None:
        xf = x.astype(jnp.float32)
        _observe(q, xf)
        xq = _quantize_act_static(xf, a)
        acc = jnp.einsum("...i,oi->...o", xq, q, preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (a * s)
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
    xf = x.astype(jnp.float32)
    _observe(q, xf)
    xq, sx = _quantize_act(xf, axes=-1)
    acc = jnp.einsum("...i,oi->...o", xq, q, preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sx * s


def qdense(x: jax.Array, w: dict) -> jax.Array:
    """x·Wᵀ over a quantized weight; returns fp32 (caller adds bias).

    w: {"q": int8 (out, in), "s": f32 (out,)[, "a": f32 static act scale]}.
    int8 mode uses per-token activation scales: the row max over the
    contracted axis commutes with the dot, so the rescale is exact for the
    quantized operands. With "a" present the activation quantize is static
    (calibrated) — coarser numerically, reduce-free. dequant mode (see
    _DENSE_IMPL) keeps activations exact.
    """
    return _qdense_impl(x, w["q"], w["s"], w.get("a"))


def qdense_fused(x: jax.Array, ws: list) -> jax.Array:
    """One GEMM over concatenated (out, in) weights (fused qkv path).

    Static act scales: the members share one input x, so their calibrated
    scales agree up to observation noise — the max is used for the shared
    quantize (safe: a larger scale never clips harder)."""
    if _CALIB is not None:  # observe per MEMBER leaf (the concat q below is
        xf = x.astype(jnp.float32)  # a temporary — its id() keys nothing)
        for w in ws:
            _observe(w["q"], xf)
    q = jnp.concatenate([w["q"] for w in ws], axis=0)
    s = jnp.concatenate([w["s"] for w in ws], axis=0)
    a = None
    if all("a" in w for w in ws):
        a = ws[0]["a"]
        for w in ws[1:]:
            a = jnp.maximum(a, w["a"])
    return _qdense_impl(x, q, s, a)


def qconv2d(x: jax.Array, p: dict, stride=1, padding=1) -> jax.Array:
    """NHWC conv with int8 HWIO weights + per-sample int8 activations;
    int32 MXU accumulation, fp32 rescale + bias, cast back to x.dtype.

    QUANT_CONV1X1=dot routes 1×1 kernels through the dot lowering with
    exact per-pixel activation scales (a 1×1 conv is a per-pixel dense) —
    faster as an isolated op (probe v4) but measured −2.4% in the real
    sampler program (see the _CONV1X1 comment above), so conv is the
    default."""
    w = p["w"]
    a = w.get("a")
    kh, kw = w["q"].shape[:2]
    pad_zero = padding == 0 or padding == ((0, 0), (0, 0))
    if kh == 1 and kw == 1 and pad_zero and _CONV1X1 == "dot":
        if stride != 1:
            x = x[:, ::stride, ::stride, :]
        xf = x.astype(jnp.float32)
        _observe(w["q"], xf)
        if a is not None:
            xq, sx = _quantize_act_static(xf, a), a
        else:
            xq, sx = _quantize_act(xf, axes=-1)
        acc = jnp.einsum(
            "bhwi,io->bhwo", xq, w["q"][0, 0], preferred_element_type=jnp.int32
        )
        y = acc.astype(jnp.float32) * sx * w["s"]
        return y.astype(x.dtype) + p["b"].astype(x.dtype)
    xf = x.astype(jnp.float32)
    _observe(w["q"], xf)
    if a is not None:
        xq, sx = _quantize_act_static(xf, a), a
    else:
        xq, sx = _quantize_act(xf, axes=(1, 2, 3))
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
# VAE: only the DECODER resblock/upsample convs go int8 — the sampler never
# encodes (training keeps the exact encode for gradients), the 4-channel
# quant/post_quant 1×1s and first/last convs are tiny and range-critical,
# and the mid-block attention (single-head, ~0.3% of decode FLOPs) is not
# worth its quant error. conv_in/conv_out match the decoder's own first/
# last convs (the encoder is skipped wholesale anyway).
VAE_SKIP = ("encoder", "quant_conv", "post_quant_conv", "attn", "conv_in", "conv_out")


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


def quantize_tree(tree, skip=(), act_scale=None, _path=()):
    """Replace every eligible `"w"` leaf (2-D dense in torch (out, in)
    orientation, 4-D HWIO conv) with its int8 form, except under a path
    named in `skip` (see `_skipped`). Biases/norms/BN stats pass through.

    `act_scale`: optional STATIC per-tensor activation scale stamped onto
    every quantized leaf (probe/default-init value — calibrate per-site
    with `observe_act_scales` + `freeze_act_scales` for real scales)."""
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            if (
                k == "w"
                and hasattr(v, "ndim")
                and v.ndim in (2, 4)
                and not _skipped(_path, skip)
            ):
                out[k] = quantize_weight(
                    v, channel_axis=(-1 if v.ndim == 4 else 0), act_scale=act_scale
                )
            else:
                out[k] = quantize_tree(v, skip, act_scale, _path + (k,))
        return out
    if isinstance(tree, (list, tuple)):
        return type(tree)(quantize_tree(v, skip, act_scale, _path) for v in tree)
    return tree


def quantize_unet(params: dict, act_scale=None) -> dict:
    """w8a8 UNet: all resnet/attention/GEGLU/up-down-sample weights int8."""
    return quantize_tree(params, skip=UNET_SKIP, act_scale=act_scale)


def quantize_iresnet(params: dict, act_scale=None) -> dict:
    """w8a8 IResNet body for the embed path (stem/SE/fc stay bf16/fp32)."""
    return quantize_tree(params, skip=IRESNET_SKIP, act_scale=act_scale)


def quantize_vae(params: dict, act_scale=None) -> dict:
    """w8a8 VAE DECODER body (see VAE_SKIP). The decoder is ~5 TFLOP/img at
    512² — a small share of the exact sampler but a growing one under the
    turbo modes (DeepCache/cfg-interval/w8a8 shrink only UNet work), which
    is when quantizing it starts to pay."""
    return quantize_tree(params, skip=VAE_SKIP, act_scale=act_scale)


# ---------------------------------------------------------------------------
# static-activation-scale calibration
# ---------------------------------------------------------------------------
#
# Standard post-training static quantization (TensorRT/ONNX-RT recipe): run
# N calibration batches through the DYNAMIC-quant model EAGERLY, record each
# site's activation absmax, freeze amax/127 into the site's leaf. The ops
# key observations by id(q-array) — execution-order- and structure-free (a
# DeepCache partial forward or cfg-interval segment observes whatever sites
# it actually runs). Observation requires eager execution: under jit the
# `float(tracer)` in `_observe` raises a loud ConcretizationTypeError.
# Dense sites only observe on the int8 impl (the default) — calibrate with
# QUANT_DENSE_IMPL=int8.


@contextlib.contextmanager
def observe_act_scales():
    """Context manager: record per-site activation absmax during eager
    forward passes of a dynamically-quantized tree.

        qtree = quantize_unet(params)
        with observe_act_scales() as calib:
            for batch in calibration_batches:
                apply_unjitted(qtree, batch)          # EAGER
        qtree_static = freeze_act_scales(qtree, calib)
    """
    global _CALIB
    if _CALIB is not None:
        raise RuntimeError("observe_act_scales is not reentrant")
    _CALIB = {}
    try:
        yield _CALIB
    finally:
        _CALIB = None


def freeze_act_scales(tree, calib: dict, margin: float = 1.0):
    """Return a copy of a quantized tree with `"a"` static act scales set
    from `observe_act_scales` records (amax·margin/127). Sites the
    calibration run never touched keep dynamic quantization (no "a") — and
    are reported so a too-small calibration run is visible."""
    missed = []

    def walk(t, path=()):
        if isinstance(t, dict):
            if is_quantized(t):
                amax = calib.get(id(t["q"]))
                if amax is None or amax <= 0.0:
                    missed.append("/".join(path))
                    return dict(t)
                out = dict(t)
                out["a"] = jnp.asarray(max(amax * margin, _EPS) / 127.0, jnp.float32)
                return out
            return {k: walk(v, path + (k,)) for k, v in t.items()}
        if isinstance(t, (list, tuple)):
            return type(t)(walk(v, path + (str(i),)) for i, v in enumerate(t))
        return t

    frozen = walk(tree)
    if missed:
        import logging

        logging.getLogger(__name__).warning(
            "freeze_act_scales: %d quantized sites were never observed and "
            "stay dynamic: %s", len(missed), missed[:8],
        )
    return frozen


def save_act_scales(tree, path: str) -> int:
    """Serialize a calibrated tree's static act scales to JSON keyed by
    tree path — the production flow calibrates ONCE (eager pass) and ships
    the scales; serving processes re-attach them with `load_act_scales`
    instead of re-running calibration. Returns the number of sites saved."""
    import json

    scales = {}

    def walk(t, p=()):
        if isinstance(t, dict):
            if is_quantized(t):
                if "a" in t:
                    scales["/".join(p)] = float(t["a"])
                return
            for k, v in t.items():
                walk(v, p + (k,))
        elif isinstance(t, (list, tuple)):
            for i, v in enumerate(t):
                walk(v, p + (str(i),))

    walk(tree)
    with open(path, "w") as f:
        json.dump(scales, f, indent=1, sort_keys=True)
    return len(scales)


def load_act_scales(tree, path: str):
    """Attach saved static act scales to a (dynamically) quantized tree;
    inverse of `save_act_scales`. Raises if a saved path has no quantized
    site in `tree` (layout drift must be loud, not a silent quality bug);
    quantized sites absent from the file stay dynamic."""
    import json

    with open(path) as f:
        scales = dict(json.load(f))
    unused = set(scales)

    def walk(t, p=()):
        if isinstance(t, dict):
            if is_quantized(t):
                key = "/".join(p)
                if key in scales:
                    unused.discard(key)
                    return dict(t, a=jnp.asarray(scales[key], jnp.float32))
                return dict(t)
            return {k: walk(v, p + (k,)) for k, v in t.items()}
        if isinstance(t, (list, tuple)):
            return type(t)(walk(v, p + (str(i),)) for i, v in enumerate(t))
        return t

    out = walk(tree)
    if unused:
        raise ValueError(
            f"{len(unused)} saved act scales matched no quantized site "
            f"(tree layout drift?): {sorted(unused)[:5]}"
        )
    return out
