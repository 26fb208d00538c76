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
                 guidance_scale=5.0, seed=0, output_type="np", **kw):
        self.calls.append((tuple(prompt), seed))
        rng = np.random.default_rng(seed)
        imgs = rng.uniform(0, 1, (len(prompt), 16, 16, 3)).astype(np.float32)
        if output_type in ("u8", "jax_u8"):
            return (imgs * 255).astype(np.uint8)
        return imgs


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


def test_run_sweep_on_images_hook_streams_all_batches(tmp_path):
    """The on_images hook must see every generated image, in uint8, and the
    PNGs on disk must be byte-identical to the streamed arrays (the sweep
    eval harness consumes the in-memory arrays — no PNG round-trip)."""
    from PIL import Image

    lora_root = tmp_path / "loras"
    (lora_root / "ID-Booth" / "7" / "checkpoint-31-6400").mkdir(parents=True)
    pipe = StubPipe()
    out = tmp_path / "gen"
    seen = []

    def hook(model_name, identity, names, imgs):
        assert model_name == "ID-Booth" and identity == "7"
        imgs = np.asarray(imgs)
        assert imgs.dtype == np.uint8
        seen.extend(zip(names, list(imgs)))

    sweep.run_sweep(
        pipe, str(lora_root), str(out), models_to_test=("ID-Booth",),
        num_prompts=5, batch_size=2, seed=0, on_images=hook,
    )
    assert [n for n, _ in seen] == [f"7_{i:03d}.png" for i in range(5)]
    for name, arr in seen:
        on_disk = np.asarray(Image.open(out / "ID-Booth" / "7" / name))
        np.testing.assert_array_equal(on_disk, arr)


def test_run_sweep_write_pngs_false_still_grids_and_streams(tmp_path):
    lora_root = tmp_path / "loras"
    (lora_root / "ID-Booth" / "2" / "checkpoint-31-6400").mkdir(parents=True)
    pipe = StubPipe()
    out = tmp_path / "gen"
    count = {"n": 0}

    def hook(model_name, identity, names, imgs):
        count["n"] += len(names)

    sweep.run_sweep(
        pipe, str(lora_root), str(out), models_to_test=("ID-Booth",),
        num_prompts=4, batch_size=4, seed=0, on_images=hook, write_pngs=False,
    )
    assert count["n"] == 4
    assert not os.path.exists(out / "ID-Booth" / "2" / "2_000.png")
    assert os.path.exists(out / "comparison_grids" / "2.png")


def test_run_sweep_deterministic_across_runs(tmp_path):
    """Pipelined dispatch must not change results: two identical runs give
    byte-identical PNG trees."""
    outs = []
    for run in range(2):
        lora_root = tmp_path / f"loras{run}"
        (lora_root / "ID-Booth" / "4" / "checkpoint-31-6400").mkdir(parents=True)
        out = tmp_path / f"gen{run}"
        sweep.run_sweep(
            StubPipe(), str(lora_root), str(out), models_to_test=("ID-Booth",),
            num_prompts=5, batch_size=2, seed=0,
        )
        outs.append(out)
    for f in sorted(os.listdir(outs[0] / "ID-Booth" / "4")):
        a = (outs[0] / "ID-Booth" / "4" / f).read_bytes()
        b = (outs[1] / "ID-Booth" / "4" / f).read_bytes()
        assert a == b
