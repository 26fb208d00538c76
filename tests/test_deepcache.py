"""DeepCache-style cached UNet apply + sampler integration (opt-in approx).

The splice itself must be EXACT: a partial pass fed the cache computed from
a full pass on the SAME latent must reproduce the full pass's ε̂ — the
approximation in `deepcache_interval=k` sampling comes only from reusing a
cache across adjacent steps (DeepCache arXiv:2312.00858 / Faster Diffusion
arXiv:2312.09608; PAPERS.md), never from the splice bookkeeping. The
reference has no counterpart (full UNet 60×/image,
`inference_ID-Booth.py:138`); default `deepcache_interval=1` is the exact
reference-parity path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceposegenerator_tpu.diffusion import make_ddpm
from faceposegenerator_tpu.diffusion.sampler import SamplerModels, sample
from faceposegenerator_tpu.models import clip_text, unet2d, vae

CFG = unet2d.UNetConfig(
    block_out_channels=(32, 64, 64, 64), cross_attention_dim=48, head_dim=8
)
TINY = SamplerModels(
    text_cfg=clip_text.CLIPTextConfig(
        vocab_size=512, hidden_size=48, num_layers=2, num_heads=4, intermediate_size=96
    ),
    unet_cfg=CFG,
    vae_cfg=vae.VAEConfig(block_out_channels=(32, 32, 32, 32)),
)


@pytest.fixture(scope="module")
def setup():
    params = unet2d.init(jax.random.key(0), CFG)
    lora = unet2d.init_lora(jax.random.key(1), params, rank=4)
    # non-zero B so adapters actually bite
    lora = jax.tree.map(lambda x: x + 0.01, lora)
    z = jax.random.normal(jax.random.key(2), (2, 16, 16, 4))
    ctx = jax.random.normal(jax.random.key(3), (2, 77, 48))
    t = jnp.asarray([7, 7])
    return params, lora, z, ctx, t


@pytest.mark.parametrize("depth", [1, 2, 3])
def test_partial_with_fresh_cache_matches_full(setup, depth):
    params, lora, z, ctx, t = setup
    ref = unet2d.apply(params, z, t, ctx, CFG, lora=lora)
    full, cache = unet2d.apply_cached(
        params, z, t, ctx, CFG, lora=lora, depth=depth, cached=None
    )
    np.testing.assert_allclose(np.asarray(full), np.asarray(ref), rtol=1e-5, atol=1e-5)
    part, cache2 = unet2d.apply_cached(
        params, z, t, ctx, CFG, lora=lora, depth=depth, cached=cache
    )
    # same latent + fresh cache ⇒ the splice is exact
    np.testing.assert_allclose(np.asarray(part), np.asarray(full), rtol=1e-5, atol=1e-5)
    assert cache2 is cache  # partial pass carries the cache through


def test_partial_reacts_to_latent_but_reuses_deep(setup):
    """A different latent with a stale cache changes the output (the shallow
    path sees the fresh z) but differs from the exact output (the deep path
    is stale) — i.e. the mechanism is genuinely partial."""
    params, lora, z, ctx, t = setup
    _, cache = unet2d.apply_cached(params, z, t, ctx, CFG, depth=1, cached=None)
    z2 = z + 0.1
    part2, _ = unet2d.apply_cached(params, z2, t, ctx, CFG, depth=1, cached=cache)
    part1, _ = unet2d.apply_cached(params, z, t, ctx, CFG, depth=1, cached=cache)
    exact2, _ = unet2d.apply_cached(params, z2, t, ctx, CFG, depth=1, cached=None)
    assert np.abs(np.asarray(part2 - part1)).max() > 1e-4   # fresh z enters
    assert np.abs(np.asarray(part2 - exact2)).max() > 1e-6  # deep path stale


def test_depth_bounds(setup):
    params, _, z, ctx, t = setup
    with pytest.raises(ValueError):
        unet2d.apply_cached(params, z, t, ctx, CFG, depth=0)
    with pytest.raises(ValueError):
        unet2d.apply_cached(params, z, t, ctx, CFG, depth=4)


def test_sampler_deepcache(setup):
    params_unet, lora_unet, _, _, _ = setup
    params = {
        "text_encoder": clip_text.init(jax.random.key(4), TINY.text_cfg),
        "unet": params_unet,
        "vae": vae.init(jax.random.key(5), TINY.vae_cfg),
    }
    sched = make_ddpm(num_inference_steps=6)
    ids = jax.random.randint(jax.random.key(6), (2, 77), 0, 512)
    neg = jnp.zeros_like(ids)
    kw = dict(models=TINY, height=64, width=64,
              lora={"unet": lora_unet, "text_encoder": None})
    exact = sample(params, sched, ids, neg, jax.random.key(0), **kw)
    dc = sample(params, sched, ids, neg, jax.random.key(0),
                deepcache_interval=3, deepcache_depth=1, **kw)
    assert dc.shape == exact.shape == (2, 64, 64, 3)
    assert np.isfinite(np.asarray(dc)).all()
    # deterministic across calls
    dc2 = sample(params, sched, ids, neg, jax.random.key(0),
                 deepcache_interval=3, deepcache_depth=1, **kw)
    np.testing.assert_array_equal(np.asarray(dc), np.asarray(dc2))
    # approximate ≠ exact (the cache is actually reused)...
    assert np.abs(np.asarray(dc) - np.asarray(exact)).max() > 1e-6
    # ...but not garbage: same ballpark as the exact image
    assert np.abs(np.asarray(dc) - np.asarray(exact)).mean() < 0.2

    # dpm + deepcache: deterministic, approximate, same-ballpark (the
    # reference's validation sampler is DPM-Solver++,
    # train_ID-Booth.py DPMSolverMultistepScheduler)
    from faceposegenerator_tpu.diffusion import make_dpm_solver

    dpm_sched = make_dpm_solver(num_inference_steps=6)
    dpm_exact = sample(params, dpm_sched, ids, neg, jax.random.key(0),
                       scheduler="dpm", **kw)
    dpm_dc = sample(params, dpm_sched, ids, neg, jax.random.key(0),
                    scheduler="dpm", deepcache_interval=2, **kw)
    dpm_dc2 = sample(params, dpm_sched, ids, neg, jax.random.key(0),
                     scheduler="dpm", deepcache_interval=2, **kw)
    np.testing.assert_array_equal(np.asarray(dpm_dc), np.asarray(dpm_dc2))
    assert np.isfinite(np.asarray(dpm_dc)).all()
    assert np.abs(np.asarray(dpm_dc) - np.asarray(dpm_exact)).max() > 1e-6
    assert np.abs(np.asarray(dpm_dc) - np.asarray(dpm_exact)).mean() < 0.2


def test_serving_deepcache_passthrough(setup):
    """SamplerServer(deepcache_interval=k) serves the approximate program;
    results deterministic per (prompt, seed) and distinct from exact."""
    from faceposegenerator_tpu.data.tokenizer import CLIPTokenizer, bytes_to_unicode
    from faceposegenerator_tpu.pipelines.txt2img import StableDiffusionPipeline
    from faceposegenerator_tpu.serving import GenerationRequest, SamplerServer

    units = list(bytes_to_unicode().values())
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for u in units:
        vocab.setdefault(u, len(vocab))
        vocab.setdefault(u + "</w>", len(vocab))
    tok = CLIPTokenizer(vocab, [], model_max_length=77)
    pipe = StableDiffusionPipeline.from_random(models=TINY, tokenizer=tok)

    exact = SamplerServer(pipe, batch_size=2, max_wait_s=0.02,
                          num_inference_steps=4, height=64, width=64)
    approx = SamplerServer(pipe, batch_size=2, max_wait_s=0.02,
                           num_inference_steps=4, height=64, width=64,
                           deepcache_interval=2)
    try:
        req = GenerationRequest(prompt="a face", seed=9)
        a1 = approx.generate([req])[0]
        a2 = approx.generate([req])[0]
        np.testing.assert_array_equal(a1.image, a2.image)
        e = exact.generate([req])[0]
        assert np.abs(a1.image.astype(int) - e.image.astype(int)).max() >= 1
    finally:
        exact.shutdown(wait=False)
        approx.shutdown(wait=False)
