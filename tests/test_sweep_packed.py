"""Variant-packed sweep: all model variants' prompts in shared fixed-shape
batches with per-sample adapters.

The reference sweeps 3 model variants × 21 prompts per identity with a full
pipeline reload per variant (`inference_ID-Booth.py:97-138`); the per-variant
batched path runs ⌈21/8⌉ batches per variant (9 padded slots of 72 at bs8).
`run_sweep(pack_variants=True)` packs (variant, prompt) pairs across variants
into ⌈63/8⌉ full batches with slot-wise adapters (`ops.lora.lora_delta`
batched form) and per-PROMPT noise (`sampler.per_prompt_noise`), preserving
the reference's cross-variant latent identity (`:111`). These tests pin:

- the packed file tree/grids == the unpacked tree (same names, all written);
- cross-variant noise identity: equal adapters ⇒ bit-equal images per prompt,
  regardless of which packed batch each (variant, prompt) slot landed in;
- packed slot content == a direct `sample()` call with the same adapter and
  per-prompt noise (end-to-end math of the packed path);
- pad slots never reach PNGs and are None-marked for hooks.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceposegenerator_tpu.core.rng import sampler_key
from faceposegenerator_tpu.data.tokenizer import CLIPTokenizer, bytes_to_unicode
from faceposegenerator_tpu.diffusion import make_ddpm
from faceposegenerator_tpu.diffusion.lora_io import zero_lora
from faceposegenerator_tpu.diffusion.sampler import (
    SamplerModels,
    per_prompt_noise,
    sample,
)
from faceposegenerator_tpu.models import clip_text, unet2d, vae
from faceposegenerator_tpu.pipelines import sweep
from faceposegenerator_tpu.pipelines.txt2img import StableDiffusionPipeline

TINY = SamplerModels(
    text_cfg=clip_text.CLIPTextConfig(
        vocab_size=512, hidden_size=48, num_layers=2, num_heads=4, intermediate_size=96
    ),
    unet_cfg=unet2d.UNetConfig(
        block_out_channels=(32, 64, 64, 64), cross_attention_dim=48, head_dim=8
    ),
    vae_cfg=vae.VAEConfig(block_out_channels=(32, 32, 32, 32)),
)


def _byte_tokenizer():
    units = list(bytes_to_unicode().values())
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for u in units:
        vocab.setdefault(u, len(vocab))
        vocab.setdefault(u + "</w>", len(vocab))
    return CLIPTokenizer(vocab, [], model_max_length=77)


def _random_like(tree, key, scale=0.1):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef,
        [scale * jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)],
    )


@pytest.fixture(scope="module")
def pipe():
    return StableDiffusionPipeline.from_random(models=TINY, tokenizer=_byte_tokenizer())


def _run(pipe, tmp_path, tag, **kw):
    out = tmp_path / tag
    lora_root = tmp_path / f"loras_{tag}"
    for m in kw.get("models_to_test", ("DreamBooth", "ID-Booth")):
        (lora_root / m / "3").mkdir(parents=True, exist_ok=True)
    captured = []

    def hook(model_name, identity, names, dev_imgs):
        captured.append((model_name, identity, list(names), np.asarray(dev_imgs)))

    sweep.run_sweep(
        pipe, str(lora_root), str(out),
        identities=["3"],
        models_to_test=kw.pop("models_to_test", ("DreamBooth", "ID-Booth")),
        num_prompts=kw.pop("num_prompts", 3),
        num_inference_steps=3, guidance_scale=5.0,
        batch_size=kw.pop("batch_size", 4), seed=0,
        height=64, width=64, on_images=hook, **kw,
    )
    return out, captured


def test_packed_tree_matches_unpacked_and_pads_marked(pipe, tmp_path):
    models = ("DreamBooth", "ID-Booth")
    out_u, _ = _run(pipe, tmp_path, "unpacked", models_to_test=models)
    out_p, captured = _run(
        pipe, tmp_path, "packed", models_to_test=models, pack_variants=True
    )
    for m in models:
        files_u = sorted(os.listdir(out_u / m / "3"))
        files_p = sorted(os.listdir(out_p / m / "3"))
        assert files_u == files_p == [f"3_{i:03d}.png" for i in range(3)]
    assert os.path.exists(out_p / "comparison_grids" / "3.png")
    # packed hook: 2 variants × 3 prompts = 6 slots + 2 pads in 2 batches of 4
    assert [m for m, _, _, _ in captured] == [None, None]
    names = [n for _, _, ns, _ in captured for n in ns]
    assert names.count(None) == 2 and names[-1] is None  # pads trail
    real = [n for n in names if n is not None]
    assert sorted(real) == sorted(
        f"{m}/3_{i:03d}.png" for m in models for i in range(3)
    )


def test_packed_cross_variant_noise_identity(pipe, tmp_path):
    """Equal adapters across variants ⇒ bit-equal images per prompt, even
    though the two variants' slots land in DIFFERENT packed batches — the
    reference's identity-seeded comparability invariant (`:111`) holds
    independent of batch composition."""
    z = zero_lora(pipe.params["unet"], pipe.params["text_encoder"], rank=4)
    ad = _random_like(z, jax.random.key(7))
    models = ("DreamBooth", "ID-Booth")
    _, captured = _run(
        pipe, tmp_path, "noiseid", models_to_test=models, pack_variants=True,
        variant_loras={m: ad for m in models},
    )
    by_name = {
        n: img
        for _, _, names, imgs in captured
        for n, img in zip(names, imgs)
        if n is not None
    }
    for i in range(3):
        np.testing.assert_array_equal(
            by_name[f"DreamBooth/3_{i:03d}.png"], by_name[f"ID-Booth/3_{i:03d}.png"]
        )
    # different prompts get DIFFERENT noise (unlike the per-batch-slot
    # recycled stream of the unpacked path)
    assert (by_name["DreamBooth/3_000.png"] != by_name["DreamBooth/3_001.png"]).any()


def test_packed_slot_matches_direct_sample(pipe, tmp_path):
    """End-to-end math: a packed slot's image == a direct sample() call with
    that slot's adapter and per-prompt noise in the same batch geometry
    (slot independence is pinned bit-exactly in test_multi_lora)."""
    from faceposegenerator_tpu.ops.image import quantize_u8

    z = zero_lora(pipe.params["unet"], pipe.params["text_encoder"], rank=4)
    adA = _random_like(z, jax.random.key(10))
    adB = _random_like(z, jax.random.key(11))
    models = ("DreamBooth", "ID-Booth")
    _, captured = _run(
        pipe, tmp_path, "direct", models_to_test=models, pack_variants=True,
        variant_loras={"DreamBooth": adA, "ID-Booth": adB},
    )
    by_name = {
        n: img
        for _, _, names, imgs in captured
        for n, img in zip(names, imgs)
        if n is not None
    }

    # rebuild prompt 1 of variant ID-Booth (adB) directly
    prompts = sweep.build_prompts("3", {}, sweep.build_prompt_combinations(), 3, seed=0)
    ids = pipe.tokenize([prompts[1]] * 4)
    neg = pipe.tokenize([sweep.DEFAULT_NEGATIVE] * 4)
    noise = per_prompt_noise(sampler_key(3), jnp.asarray([1] * 4, jnp.int32), 3, 8, 8)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *([adB] * 4))
    imgs = sample(
        pipe.params, make_ddpm(pipe.scheduler_config, 3), ids, neg,
        jax.random.key(0), models=TINY, height=64, width=64,
        policy=pipe.policy, lora=stacked,
        lora_scale=jnp.ones((4,), jnp.float32), noise_override=noise,
    )
    direct = np.asarray(quantize_u8(imgs))[0]
    np.testing.assert_array_equal(by_name["ID-Booth/3_001.png"], direct)
