"""Synthesis sweep driver test with a stub pipeline (fast, no diffusion)."""

import json
import os

import numpy as np

from faceposegenerator_tpu.pipelines import sweep


class StubPipe:
    """Mimics StableDiffusionPipeline.__call__/load_lora_weights."""

    def __init__(self):
        self.loaded = []
        self.calls = []

    def load_lora_weights(self, path, scale=1.0):
        self.loaded.append(path)

    def __call__(self, prompt, negative_prompt=None, num_inference_steps=30,
                 guidance_scale=5.0, seed=0, **kw):
        self.calls.append((tuple(prompt), seed))
        rng = np.random.default_rng(seed)
        return rng.uniform(0, 1, (len(prompt), 16, 16, 3)).astype(np.float32)


def test_run_sweep_outputs(tmp_path):
    lora_root = tmp_path / "loras"
    for model in ("DreamBooth", "ID-Booth"):
        (lora_root / model / "id_3" / "checkpoint-31-6400").mkdir(parents=True)
    gender = tmp_path / "gender.json"
    gender.write_text(json.dumps({"id_3": "female"}))

    pipe = StubPipe()
    out = tmp_path / "gen"
    sweep.run_sweep(
        pipe, str(lora_root), str(out),
        gender_dict_path=str(gender),
        models_to_test=("DreamBooth", "ID-Booth"),
        num_prompts=5, batch_size=3, seed=0,
    )
    # LoRA checkpoints were loaded per model
    assert len(pipe.loaded) == 2
    # identity-index seed: id_3 → 3, consistent across model variants
    seeds = {s for _, s in pipe.calls}
    assert seeds == {3}
    # per-ID PNG trees
    files = sorted(os.listdir(out / "DreamBooth" / "id_3"))
    assert len(files) == 5 and files[0] == "id_3_000.png"
    # comparison grid exists
    assert os.path.exists(out / "comparison_grids" / "id_3.png")
