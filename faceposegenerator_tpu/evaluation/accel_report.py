"""Quality report for the opt-in acceleration modes.

The framework ships opt-in approximations of the exact sampler —
DeepCache, ToMe, guidance interval, w8a8 quantization, parallel-in-time
Picard — none of which exist in the reference stack (generation there is
exact-only, `inference_ID-Booth.py:138-156`). Before enabling one in
production a user needs the quality cost ON THEIR CHECKPOINT, not a
paper's headline: this module renders the same (prompt, seed) set through
the exact program and each candidate mode and reports, per mode:

  - per-image PSNR vs the exact output (and min/mean),
  - identity preservation: ArcFace cosine(exact, mode) per image — THE
    metric an ID-preserving stack cares about (optional; needs ArcFace
    params, real or converted via `bridge/torch_weights.py`),
  - the fraction of bit-identical images (exactness-anchor sanity: e.g.
    `cfg_interval=(0, S)` must report 1.0),
  - wall time per batch (single measurement — indicative, not a bench;
    `bench.py` owns rigorous timing).

Mode specs are composable strings (the CLI surface):

    deepcache=3          DeepCache interval 3 (depth 1); "3:2" sets depth
    tome=0.5             ToMe ratio 0.5; "0.5:attn+xattn+mlp" sets ops
    cfg_interval=5:20    guidance only at step indices [5, 20)
    quantize=w8a8        int8 UNet (ops/quant.py); w8a8:static[:N] adds
                         calibrated static act scales (N-step calibration);
                         w8a8,vae (pipeline mode "w8a8+vae") also quantizes
                         the VAE decoder body
    parallel=8:0.1       Picard window 8, tolerance 0.1
    attn=flash_int8      int8 attention core (SageAttention-style packed
                         d=64 kernel, ops/flash_attention.py)
    scheduler=dpm:20     DPM-Solver++ at 20 steps (the reference's own
                         validation sampler, train_ID-Booth.py:155);
                         bare "dpm" keeps the report's step count
    deepcache=3+cfg_interval=5:20+quantize=w8a8     composition
"""

from __future__ import annotations

import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def parse_mode(spec: str):
    """"deepcache=3+quantize=w8a8" -> (call_kwargs, quantize_mode)."""
    kwargs: dict = {}
    quantize = None
    for part in spec.split("+"):
        key, _, val = part.partition("=")
        key = key.strip()
        if not val:
            raise ValueError(f"mode part {part!r} needs key=value")
        if key == "deepcache":
            iv, _, depth = val.partition(":")
            kwargs["deepcache_interval"] = int(iv)
            if depth:
                kwargs["deepcache_depth"] = int(depth)
        elif key == "tome":
            ratio, _, ops = val.partition(":")
            kwargs["tome_ratio"] = float(ratio)
            if ops:
                # '+' is the mode-composition separator, so ToMe's op list
                # uses commas here: tome=0.5:attn,xattn,mlp
                kwargs["tome_ops"] = ops.replace(",", "+")
        elif key == "cfg_interval":
            lo, _, hi = val.partition(":")
            kwargs["cfg_interval"] = (int(lo), int(hi))
        elif key == "quantize":
            # '+' is the composition separator, so the "w8a8+vae" pipeline
            # mode is spelled with a comma here: quantize=w8a8,vae
            quantize = val.replace(",", "+")
        elif key == "parallel":
            w, _, tol = val.partition(":")
            kwargs["parallel_window"] = int(w)
            if tol:
                kwargs["parallel_tolerance"] = float(tol)
        elif key == "attn":
            # pipeline-level (SamplerModels.attn_impl), popped by
            # compare_modes before the pipe call
            if val not in ("auto", "flash", "flash_int8", "reference"):
                raise ValueError(f"unknown attn impl {val!r} in {spec!r}")
            kwargs["attn_impl"] = val
        elif key == "scheduler":
            kind, _, steps = val.partition(":")
            if kind not in ("ddpm", "dpm"):
                raise ValueError(f"unknown scheduler {kind!r} in {spec!r}")
            kwargs["scheduler_kind"] = kind  # pipeline-level, popped
            if steps:
                kwargs["num_inference_steps"] = int(steps)
        else:
            raise ValueError(f"unknown mode key {key!r} in {spec!r}")
    return kwargs, quantize


def _sibling_pipe(pipe, quantize: Optional[str], calib_kw: Optional[dict] = None,
                  attn_impl: Optional[str] = None, scheduler_kind: Optional[str] = None):
    """A pipeline sharing `pipe`'s params/LoRA; optionally quantized.
    `quantize()` rebinds the sibling's params dict, so the original
    pipeline's exact tree is untouched.

    `quantize` may carry a `:static[:N]` suffix (e.g. "w8a8:static" /
    "w8a8:static:8"): after quantizing, run `calibrate_quant` for N steps
    (default 4) on the report's own prompts (`calib_kw`) so the report
    measures the STATIC-act-scale program's quality."""
    import dataclasses

    from ..pipelines.txt2img import StableDiffusionPipeline

    models = pipe.models
    if attn_impl is not None:
        models = dataclasses.replace(models, attn_impl=attn_impl)
    p = StableDiffusionPipeline(
        dict(pipe.params), models=models, tokenizer=pipe.tokenizer,
        policy=pipe.policy, scheduler_config=pipe.scheduler_config,
    )
    p.scheduler_kind = scheduler_kind or pipe.scheduler_kind
    p.lora, p.lora_scale = pipe.lora, pipe.lora_scale
    if quantize:
        base, _, static = quantize.partition(":")
        p.quantize(base)
        if static:
            tag, _, n = static.partition(":")
            if tag != "static":
                raise ValueError(f"unknown quantize suffix {static!r}")
            p.calibrate_quant(steps=int(n) if n else 4, **(calib_kw or {}))
    return p


def make_embed_fn_u8(arcface_params, arcface_state, cfg, policy=None):
    """Jitted uint8 (B,H,W,3) any-resolution -> L2-normalized embeddings.
    Same on-device resize→normalize chain as `fiqa.make_quality_fn_u8`."""
    from ..core.precision import DEFAULT_POLICY
    from ..models import iresnet
    from ..ops.image import resize_bilinear

    policy = policy or DEFAULT_POLICY

    @jax.jit
    def embed(x_u8):
        x = x_u8.astype(jnp.float32)
        if x.shape[1] != 112 or x.shape[2] != 112:
            x = resize_bilinear(x, (112, 112))
        x = (x / 255.0 - 0.5) / 0.5
        emb, _ = iresnet.apply(
            arcface_params, arcface_state, x, cfg, policy=policy, train=False
        )
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    return embed


def _psnr(exact_u8: np.ndarray, got_u8: np.ndarray):
    """Per-image PSNR in dB; None where bit-identical (infinite)."""
    diff = exact_u8.astype(np.float64) - got_u8.astype(np.float64)
    mse = (diff * diff).mean(axis=(1, 2, 3))
    out = []
    for m in mse:
        out.append(None if m == 0.0 else round(10.0 * np.log10(255.0 ** 2 / m), 2))
    return out, mse


def compare_modes(
    pipe,
    modes: Sequence[str],
    *,
    prompts: Optional[List[str]] = None,
    input_ids=None,
    seed: int = 0,
    num_inference_steps: int = 30,
    guidance_scale: float = 5.0,
    height: int = 512,
    width: int = 512,
    embed_fn=None,
    seed_floor: bool = False,
) -> dict:
    """Render (prompts, seed) exact and under each mode spec; see module
    docstring for the report schema. `embed_fn` (from `make_embed_fn_u8`)
    enables the identity-cosine rows.

    `seed_floor=True` adds `report["seed_floor"]`: the PSNR between the
    exact output and a SECOND exact render at seed+1 — i.e. the PSNR of
    UNRELATED samples from the same model. Mode PSNRs only carry meaning
    relative to this floor (a mode at floor+0 dB is as wrong as a
    different image; quality gates should demand a margin ABOVE it), and
    it self-calibrates on whatever weights the report runs on — random
    probe weights and real checkpoints alike (VERDICT r4 #4)."""
    gen_kw = dict(
        num_inference_steps=num_inference_steps, guidance_scale=guidance_scale,
        height=height, width=width, seed=seed, output_type="u8",
    )
    if input_ids is not None:
        gen_kw["input_ids"] = jnp.asarray(input_ids)
    else:
        if prompts is None:
            raise ValueError("pass prompts or input_ids")
        gen_kw["prompt"] = list(prompts)

    t0 = time.perf_counter()
    exact = np.asarray(pipe(**gen_kw))
    exact_s = time.perf_counter() - t0
    emb_exact = np.asarray(embed_fn(exact)) if embed_fn is not None else None

    report = {
        "config": {
            "steps": num_inference_steps, "guidance_scale": guidance_scale,
            "height": height, "width": width, "seed": seed,
            "n_images": int(exact.shape[0]),
            "scheduler": pipe.scheduler_kind,
        },
        "exact": {"batch_s": round(exact_s, 3)},
        "modes": {},
    }
    if seed_floor:
        other = np.asarray(pipe(**{**gen_kw, "seed": seed + 1}))
        fl_psnr, _ = _psnr(exact, other)
        fl_finite = [v for v in fl_psnr if v is not None]
        report["seed_floor"] = {
            "psnr_min": min(fl_finite) if fl_finite else None,
            "psnr_mean": round(float(np.mean(fl_finite)), 2) if fl_finite else None,
            "seeds": [seed, seed + 1],
        }
    calib_kw = dict(height=height, width=width, guidance_scale=guidance_scale)
    if input_ids is not None:
        calib_kw["input_ids"] = jnp.asarray(input_ids)
    else:
        calib_kw["prompt"] = list(prompts)
    for spec in modes:
        call_kwargs, quantize = parse_mode(spec)
        p = _sibling_pipe(
            pipe, quantize, calib_kw,
            attn_impl=call_kwargs.pop("attn_impl", None),
            scheduler_kind=call_kwargs.pop("scheduler_kind", None),
        )
        t0 = time.perf_counter()
        # scheduler=dpm:N overrides the report's step count for this mode
        got = np.asarray(p(**{**gen_kw, **call_kwargs}))
        mode_s = time.perf_counter() - t0
        psnr, mse = _psnr(exact, got)
        finite = [v for v in psnr if v is not None]
        entry = {
            "batch_s": round(mode_s, 3),
            "psnr_db": psnr,
            "psnr_min": min(finite) if finite else None,
            "psnr_mean": round(float(np.mean(finite)), 2) if finite else None,
            "identical_frac": round(float((mse == 0.0).mean()), 3),
        }
        if emb_exact is not None:
            emb = np.asarray(embed_fn(got))
            cos = (emb_exact * emb).sum(axis=-1)
            entry["identity_cos"] = [round(float(c), 4) for c in cos]
            entry["identity_cos_min"] = round(float(cos.min()), 4)
            entry["identity_cos_mean"] = round(float(cos.mean()), 4)
        report["modes"][spec] = entry
    return report
