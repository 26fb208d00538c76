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
    """Tile (N, H, W, 3) [0,1] images into one PNG grid."""
    from PIL import Image

    n, h, w, _ = images.shape
    per_row = per_row or n
    rows = -(-n // per_row)
    grid = np.zeros((rows * h, per_row * w, 3), np.float32)
    for i, img in enumerate(images):
        r, c = divmod(i, per_row)
        grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = img
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray((grid * 255).astype(np.uint8)).save(path)


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
):
    """Full sweep. `pipe` is a `StableDiffusionPipeline`; LoRA checkpoints
    live at `<lora_root>/<model>/<identity>/<checkpoint>`."""
    gender_dict = {}
    if gender_dict_path and os.path.exists(gender_dict_path):
        with open(gender_dict_path) as f:
            gender_dict = json.load(f)

    if identities is None:
        first = os.path.join(lora_root, models_to_test[0])
        identities = sorted(os.listdir(first)) if os.path.isdir(first) else []

    combos = build_prompt_combinations()
    negative = DEFAULT_NEGATIVE if use_negative_prompt else ""

    for identity in identities:
        id_number = int("".join(c for c in identity if c.isdigit()) or 0)
        prompts = build_prompts(identity, gender_dict, combos, num_prompts, seed=seed)
        per_model_first = []
        for model_name in models_to_test:
            ckpt = os.path.join(lora_root, model_name, identity, checkpoint)
            if os.path.isdir(ckpt):
                pipe.load_lora_weights(ckpt)
            out_dir = os.path.join(output_root, model_name, identity)
            os.makedirs(out_dir, exist_ok=True)
            images = []
            for start in range(0, len(prompts), batch_size):
                chunk = prompts[start : start + batch_size]
                imgs = pipe(
                    prompt=chunk,
                    negative_prompt=[negative] * len(chunk),
                    num_inference_steps=num_inference_steps,
                    guidance_scale=guidance_scale,
                    seed=id_number,  # identity-index seed (:111)
                )
                images.append(imgs)
            images = np.concatenate(images)
            from PIL import Image

            for i, img in enumerate(images):
                Image.fromarray((img * 255).astype(np.uint8)).save(
                    os.path.join(out_dir, f"{identity}_{i:03d}.png")
                )
            per_model_first.append(images[: min(7, len(images))])
        if per_model_first:
            save_image_grid(
                np.concatenate(per_model_first),
                os.path.join(output_root, "comparison_grids", f"{identity}.png"),
                per_row=min(7, len(per_model_first[0])),
            )
