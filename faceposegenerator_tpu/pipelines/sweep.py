"""Multi-identity synthesis sweep (prompt grid × identities × model variants).

Behavioral rebuild of `inference_ID-Booth.py`: builds the prompt grid from
gender dict + pose coin-flip + age phases + background list (`:17-45,
113-134`), seeds the noise with the identity index so the three model
variants (DreamBooth / PortraitBooth / ID-Booth) see identical latents
(`:111`), and writes per-ID PNG trees plus 3-model comparison grids
(`:144-156`).

TPU win: the reference generates 1 image at a time with a full pipeline
reload per (identity, model); here all prompts of an identity run as ONE
batched sampler call and LoRA swaps reuse the compiled program.
"""

from __future__ import annotations

import json
import os
import random
from itertools import product
from typing import Dict, List, Optional, Sequence

import numpy as np

BACKGROUNDS = [
    "", "forest", "city street", "beach", "office", "bus", "laboratory",
    "factory", "construction site", "hospital", "night club",
]
AGE_PHASES = ["", "young", "middle-aged", "old"]
DEFAULT_NEGATIVE = (
    "cartoon, cgi, render, illustration, painting, drawing, black and white, "
    "bad body proportions, landscape"
)
MODEL_VARIANTS = ("DreamBooth", "PortraitBooth", "ID-Booth")

# jitted (stacked_tree, idx) -> per-slot tree gather for the packed sweep:
# ONE device program per batch instead of one tiny gather dispatch per leaf
_GATHER_ROWS = None


def _gather_rows(tree, idx):
    global _GATHER_ROWS
    if _GATHER_ROWS is None:
        import jax

        _GATHER_ROWS = jax.jit(
            lambda t, i: jax.tree.map(lambda l: l[i], t)
        )
    return _GATHER_ROWS(tree, idx)


def build_prompt_combinations(
    add_age: bool = False,
    add_background: bool = True,
    num_prompts: int = 21,
) -> List[tuple]:
    """The (age, background) grid of `inference_ID-Booth.py:33-45`."""
    bgs = [f"{b} background" if b else "" for b in BACKGROUNDS]
    if add_age and add_background:
        return list(product(AGE_PHASES, bgs))
    if add_background:
        if num_prompts == 100:
            return [("", b) for b in bgs[1:] * 10]
        return [("", b) for b in [""] + bgs[1:] * 2]
    if add_age:
        return [(a, "") for a in AGE_PHASES * 6]
    return [("", "")] * num_prompts


def build_prompts(
    identity: str,
    gender_dict: Dict[str, str],
    combinations: Sequence[tuple],
    num_prompts: int = 21,
    add_gender: bool = True,
    add_pose: bool = True,
    seed: int = 0,
) -> List[str]:
    """Per-identity prompts: "face portrait photo of [age] <gender> sks
    person[, <bg>]" with a 50% "portrait"→"side-portrait" coin flip
    (`inference_ID-Booth.py:113-134`)."""
    rng = random.Random(seed)
    picks = rng.sample(list(combinations), min(num_prompts, len(combinations))) if len(
        combinations
    ) > num_prompts else list(combinations)[:num_prompts]
    gender = gender_dict.get(identity, "person") if add_gender else ""
    prompts = []
    for age, bg in picks:
        head = "face portrait photo of"
        subject = " ".join(x for x in [age, gender, "sks person"] if x)
        prompt = f"{head} {subject}"
        if add_pose and rng.random() < 0.5:
            prompt = prompt.replace("portrait", "side-portrait")
        if bg:
            prompt += f", {bg}"
        prompts.append(prompt)
    return prompts


def save_image_grid(images: np.ndarray, path: str, per_row: Optional[int] = None):
    """Tile (N, H, W, 3) images ([0,1] float or uint8) into one PNG grid.

    Rides the native stored-deflate PNG writer when available — a 7-image
    512² grid through PIL's zlib encode costs ~1.4 s on the TPU VM's single
    host CPU (measured as the run_sweep infra gap, perf/r3_sweep_matrix
    gen_only_8 vs raw_sampler_bs8); the native writer is ~milliseconds."""
    images = np.asarray(images)
    if images.dtype != np.uint8:
        images = (np.clip(images, 0.0, 1.0) * 255).astype(np.uint8)
    n, h, w, _ = images.shape
    per_row = per_row or n
    rows = -(-n // per_row)
    grid = np.zeros((rows * h, per_row * w, 3), np.uint8)
    for i, img in enumerate(images):
        r, c = divmod(i, per_row)
        grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = img
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        from .. import native as _native_pkg

        mod = _native_pkg.load()
        if mod is not None and hasattr(mod, "write_png_batch"):
            mod.write_png_batch(
                np.ascontiguousarray(grid[None]), grid.shape[0], grid.shape[1],
                [path], 1,
            )
            return
    except Exception:  # pragma: no cover
        pass
    from PIL import Image

    Image.fromarray(grid).save(path)


def run_sweep(
    pipe,
    lora_root: str,
    output_root: str,
    gender_dict_path: Optional[str] = None,
    identities: Optional[List[str]] = None,
    models_to_test: Sequence[str] = MODEL_VARIANTS,
    checkpoint: str = "checkpoint-31-6400",
    num_prompts: int = 21,
    num_inference_steps: int = 30,
    guidance_scale: float = 5.0,
    use_negative_prompt: bool = True,
    batch_size: int = 8,
    seed: int = 0,
    on_images=None,
    write_pngs: bool = True,
    writer_threads: int = 8,
    pack_variants: bool = False,
    variant_loras: Optional[Dict[str, dict]] = None,
    height: int = 512,
    width: int = 512,
    deepcache_interval: int = 1,
    deepcache_depth: int = 1,
    tome_ratio: float = 0.0,
    cfg_interval=None,
):
    """Full sweep. `pipe` is a `StableDiffusionPipeline`; LoRA checkpoints
    live at `<lora_root>/<model>/<identity>/<checkpoint>`.

    `pack_variants=True` packs all model variants' prompts of an identity
    into shared fixed-shape batches with PER-SAMPLE adapters (slot b rides
    variant b's LoRA — `ops.lora.lora_delta`'s batched form): at the
    reference op point (3 variants × 21 prompts, `inference_ID-Booth.py:
    86-97,113`) the per-variant path runs 3×⌈21/8⌉ = 9 batches (72 slots, 9
    padded); packed runs ⌈63/8⌉ = 8 (1 padded) — 11% fewer UNet
    invocations, and no per-variant ragged-tail program. Noise comes from
    `sampler.per_prompt_noise` keyed by (identity, prompt index), so the
    three variants still see identical latents per prompt (the reference's
    `:111` comparability invariant) no matter which batch a slot lands in.
    In packed mode `on_images` is called once per MIXED batch as
    `on_images(None, identity, names, dev_imgs)` where `names[i]` is
    "<model>/<identity>_<prompt:03d>.png" (None for pad slots).
    `variant_loras` optionally supplies adapter trees per model name
    directly (bypassing checkpoint dirs; missing variants get zero
    adapters).

    TPU pipelining (VERDICT r2 #1): generation batch i+1 is DISPATCHED to
    the device before batch i's results are fetched, so all host work for
    batch i (PNG encode on a thread pool, `on_images` eval hooks) overlaps
    device generation of i+1. `on_images(model_name, identity, names,
    images_u8)` receives the DEVICE uint8 array — hooks that only enqueue
    more device work (e.g. jitted FIQA/pose on the arrays) keep the whole
    harness free of host round-trips; images are quantized to uint8 on
    device before any transfer."""
    gender_dict = {}
    if gender_dict_path and os.path.exists(gender_dict_path):
        with open(gender_dict_path) as f:
            gender_dict = json.load(f)

    if identities is None:
        first = os.path.join(lora_root, models_to_test[0])
        identities = sorted(os.listdir(first)) if os.path.isdir(first) else []

    combos = build_prompt_combinations()
    negative = DEFAULT_NEGATIVE if use_negative_prompt else ""

    from concurrent.futures import ThreadPoolExecutor

    writers = ThreadPoolExecutor(max_workers=max(writer_threads, 1))
    write_futs = []

    # PNG writes: zlib-compressed PIL encode measured ~1.7-2.5 s per 8×512²
    # batch ON THE SINGLE HOST CPU of the TPU VM (perf/r3_sweep_matrix.jsonl
    # gen_png_8 vs gen_only_8) — pure dead time the device can't hide. The
    # native stored-deflate writer (`native/loader.cpp write_png_batch`)
    # emits spec-valid lossless PNGs at ~memcpy speed (0.13 s per batch)
    # with the GIL released; PIL is the fallback.
    try:
        from .. import native as _native_pkg

        _native = _native_pkg.load()
    except Exception:  # pragma: no cover - native build is best-effort
        _native = None

    def _write_batch(imgs_u8, paths):
        if _native is not None and hasattr(_native, "write_png_batch"):
            h, w = imgs_u8.shape[1:3]
            _native.write_png_batch(
                np.ascontiguousarray(imgs_u8), int(h), int(w), paths, 4
            )
            return
        from PIL import Image

        for img, path in zip(imgs_u8, paths):
            Image.fromarray(np.asarray(img)).save(path)

    # one-deep pipeline: handle batch i's host side only after batch i+1 is
    # already queued on the device
    pending = None  # (model_name, identity, out_dir, names, device_images_u8)
    pending_packed = None  # (identity, slots, device_images_u8)
    grid_firsts: Dict[str, Dict[str, list]] = {}

    def _drain():
        nonlocal pending, pending_packed
        if pending_packed is not None:
            identity, slots, dev_imgs = pending_packed
            pending_packed = None
            if on_images is not None:
                names = [
                    None if m is None else f"{m}/{identity}_{p:03d}.png"
                    for m, p in slots
                ]
                on_images(None, identity, names, dev_imgs)
            firsts = grid_firsts.setdefault(identity, {})
            for m, _ in slots:
                if m is not None:
                    firsts.setdefault(m, [])
            need_firsts = any(
                len(firsts[m]) < 7 for m, _ in slots if m is not None
            )
            if write_pngs or need_firsts:
                imgs = np.asarray(dev_imgs)  # blocks on batch i only, not i+1
                sel, paths = [], []
                for i, (m, p) in enumerate(slots):
                    if m is None:
                        continue  # pad slot
                    sel.append(i)
                    paths.append(
                        os.path.join(output_root, m, identity, f"{identity}_{p:03d}.png")
                    )
                    have = firsts[m]
                    if len(have) < 7:
                        have.append(imgs[i])
                if write_pngs and paths:
                    write_futs.append(
                        writers.submit(_write_batch, imgs[sel], paths)
                    )
            return
        if pending is None:
            return
        model_name, identity, out_dir, names, dev_imgs = pending
        pending = None
        if on_images is not None:
            on_images(model_name, identity, names, dev_imgs)
        firsts = grid_firsts.setdefault(identity, {})
        have = firsts.setdefault(model_name, [])
        if write_pngs or len(have) < 7:
            imgs = np.asarray(dev_imgs)  # blocks on batch i only, not i+1
            if write_pngs:
                write_futs.append(
                    writers.submit(
                        _write_batch, imgs,
                        [os.path.join(out_dir, name) for name in names],
                    )
                )
            if len(have) < 7:
                have.extend(list(imgs[: 7 - len(have)]))

    def _run_identity_packed(identity: str, id_number: int, prompts: List[str]):
        """All variants × prompts of one identity as ⌈V·P/B⌉ fixed-shape
        batches with per-sample adapters and per-prompt noise."""
        nonlocal pending_packed
        import jax
        import jax.numpy as jnp

        from ..core.rng import sampler_key
        from ..diffusion.lora_io import load_lora_safetensors, zero_lora
        from ..diffusion.sampler import per_prompt_noise

        trees = []
        for model_name in models_to_test:
            tree = None
            if variant_loras and model_name in variant_loras:
                tree = variant_loras[model_name]
            else:
                ckpt = os.path.join(lora_root, model_name, identity, checkpoint)
                if os.path.isdir(ckpt):
                    tree = load_lora_safetensors(
                        ckpt, pipe.params["unet"], pipe.params["text_encoder"],
                        dtype=pipe.policy.param_dtype,
                    )
            if tree is None:  # no checkpoint → zero adapter (= base model)
                tree = zero_lora(
                    pipe.params["unet"], pipe.params["text_encoder"],
                    dtype=pipe.policy.param_dtype,
                )
            trees.append(tree)
            os.makedirs(os.path.join(output_root, model_name, identity), exist_ok=True)
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *trees)  # (V, ...)

        tok = np.asarray(pipe.tokenize(prompts))  # (P, 77)
        neg = np.asarray(pipe.tokenize([negative]))[0]  # (77,)
        items = [
            (vi, pi)
            for vi in range(len(models_to_test))
            for pi in range(len(prompts))
        ]
        n_pad = (-len(items)) % batch_size
        padded = items + [items[-1]] * n_pad  # pad slots re-run the last item
        id_key = sampler_key(id_number)
        for start in range(0, len(padded), batch_size):
            chunk = padded[start : start + batch_size]
            vi = jnp.asarray([v for v, _ in chunk], jnp.int32)
            pi = jnp.asarray([p for _, p in chunk], jnp.int32)
            lora_b = _gather_rows(stacked, vi)
            noise = per_prompt_noise(
                id_key, pi, num_inference_steps, height // 8, width // 8
            )
            dev_imgs = pipe(
                input_ids=jnp.asarray(tok[[p for _, p in chunk]]),
                negative_input_ids=jnp.asarray(
                    np.broadcast_to(neg, (len(chunk), neg.shape[0]))
                ),
                num_inference_steps=num_inference_steps,
                guidance_scale=guidance_scale,
                height=height, width=width,
                lora=lora_b,
                lora_scale=jnp.ones((len(chunk),), jnp.float32),
                noise_override=noise,
                output_type="jax_u8",
                deepcache_interval=deepcache_interval,
                deepcache_depth=deepcache_depth,
                tome_ratio=tome_ratio,
                cfg_interval=cfg_interval,
            )
            # mark trailing pad slots (only the LAST batch can have them)
            first_pad = len(chunk) - (
                n_pad if start + batch_size >= len(padded) else 0
            )
            slots = [
                (models_to_test[v], p) if i < first_pad else (None, p)
                for i, (v, p) in enumerate(chunk)
            ]
            _drain()  # host work for the PREVIOUS batch
            pending_packed = (identity, slots, dev_imgs)

    try:
        for identity in identities:
            id_number = int("".join(c for c in identity if c.isdigit()) or 0)
            prompts = build_prompts(identity, gender_dict, combos, num_prompts, seed=seed)
            if pack_variants:
                _run_identity_packed(identity, id_number, prompts)
                continue
            for model_name in models_to_test:
                ckpt = os.path.join(lora_root, model_name, identity, checkpoint)
                if os.path.isdir(ckpt):
                    pipe.load_lora_weights(ckpt)
                out_dir = os.path.join(output_root, model_name, identity)
                os.makedirs(out_dir, exist_ok=True)
                for start in range(0, len(prompts), batch_size):
                    chunk = prompts[start : start + batch_size]
                    dev_imgs = pipe(
                        prompt=chunk,
                        negative_prompt=[negative] * len(chunk),
                        num_inference_steps=num_inference_steps,
                        guidance_scale=guidance_scale,
                        height=height, width=width,
                        seed=id_number,  # identity-index seed (:111)
                        output_type="jax_u8",  # stays on device until _drain
                        deepcache_interval=deepcache_interval,
                        deepcache_depth=deepcache_depth,
                        tome_ratio=tome_ratio,
                        cfg_interval=cfg_interval,
                    )
                    names = [
                        f"{identity}_{start + i:03d}.png" for i in range(len(chunk))
                    ]
                    _drain()  # host work for the PREVIOUS batch
                    pending = (model_name, identity, out_dir, names, dev_imgs)
        _drain()
        for identity, firsts in grid_firsts.items():
            per_model = [np.stack(firsts[m]) for m in models_to_test if m in firsts]
            if per_model:
                save_image_grid(
                    np.concatenate(per_model),
                    os.path.join(output_root, "comparison_grids", f"{identity}.png"),
                    per_row=min(7, len(per_model[0])),
                )
    finally:
        for f in write_futs:
            f.result()  # surface writer errors; don't return before files land
        writers.shutdown()
