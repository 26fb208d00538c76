"""Heterogeneous-LoRA batching: per-request adapters in ONE fixed-shape batch.

The reference serves one identity per loaded pipeline
(`inference_ID-Booth.py:103-144`); the classic SamplerServer batches
same-LoRA requests. `multi_lora=True` packs MIXED-identity traffic into full
batches by stacking adapter leaves to a leading request axis and applying
them per-sample (`ops.lora.lora_delta`). These tests pin:

- the batched delta op == per-sample loop (exact math);
- slot independence in the sampler: slot b's image depends only on slot b's
  (prompt, seed, adapter, scale) — bit-equal across batch compositions;
- the server invariants survive: one compiled program across arbitrary
  compositions, determinism, mesh sharding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceposegenerator_tpu.data.tokenizer import CLIPTokenizer, bytes_to_unicode
from faceposegenerator_tpu.diffusion import make_ddpm
from faceposegenerator_tpu.diffusion.lora_io import zero_lora
from faceposegenerator_tpu.diffusion.sampler import SamplerModels, sample
from faceposegenerator_tpu.models import clip_text, unet2d, vae
from faceposegenerator_tpu.ops.lora import broadcast_scale, lora_delta, lora_dense
from faceposegenerator_tpu.pipelines.txt2img import StableDiffusionPipeline
from faceposegenerator_tpu.serving import GenerationRequest, SamplerServer
from faceposegenerator_tpu.serving.engine import _batch_noise


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


def _stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


# -- op level -----------------------------------------------------------------


def test_lora_delta_batched_matches_per_sample_loop():
    key = jax.random.key(0)
    B, S, IN, OUT, R = 3, 5, 16, 24, 4
    x = jax.random.normal(jax.random.fold_in(key, 0), (B, S, IN))
    A = jax.random.normal(jax.random.fold_in(key, 1), (B, R, IN))
    Bm = jax.random.normal(jax.random.fold_in(key, 2), (B, OUT, R))
    batched = lora_delta(x, A, Bm)
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(batched[b]), np.asarray(lora_delta(x[b], A[b], Bm[b])),
            rtol=2e-6, atol=2e-6,
        )


def test_lora_dense_per_sample_scale():
    key = jax.random.key(1)
    B, IN, OUT, R = 4, 8, 6, 2
    x = jax.random.normal(jax.random.fold_in(key, 0), (B, 7, IN))
    w = jax.random.normal(jax.random.fold_in(key, 1), (OUT, IN))
    A = jax.random.normal(jax.random.fold_in(key, 2), (B, R, IN))
    Bm = jax.random.normal(jax.random.fold_in(key, 3), (B, OUT, R))
    scales = jnp.asarray([0.0, 0.5, 1.0, 2.0])
    y = lora_dense(x, w, lora_a=A, lora_b=Bm, scale=scales)
    for b, s in enumerate([0.0, 0.5, 1.0, 2.0]):
        ref = lora_dense(x[b], w, lora_a=A[b], lora_b=Bm[b], scale=s)
        np.testing.assert_allclose(np.asarray(y[b]), np.asarray(ref), rtol=2e-6, atol=2e-6)
    # scale 0.0 slot == no adapter at all
    np.testing.assert_allclose(
        np.asarray(y[0]), np.asarray(lora_dense(x[0], w)), rtol=2e-6, atol=2e-6
    )
    assert np.asarray(broadcast_scale(scales, 3)).shape == (4, 1, 1)


# -- sampler level ------------------------------------------------------------


@pytest.fixture(scope="module")
def pipe():
    return StableDiffusionPipeline.from_random(models=TINY, tokenizer=_byte_tokenizer())


def _sample_batched(pipe, lora, scale, seeds=(3, 4)):
    ids = pipe.tokenize(["a portrait", "another face"])
    neg = pipe.tokenize(["", ""])
    schedule = make_ddpm(pipe.scheduler_config, 3)
    noise = _batch_noise(jnp.asarray(seeds, jnp.uint32), 3, 8, 8)
    return np.asarray(
        sample(
            pipe.params, schedule, ids, neg, jax.random.key(0), models=TINY,
            height=64, width=64, policy=pipe.policy, lora=lora,
            lora_scale=scale, noise_override=noise,
        )
    )


def test_sampler_slot_independence_bit_exact(pipe):
    """Changing slot 1's adapter must not move slot 0 AT ALL (same program):
    per-sample application cannot mix request slots anywhere in CLIP→UNet."""
    zero = zero_lora(pipe.params["unet"], pipe.params["text_encoder"], rank=4)
    adA = _random_like(zero, jax.random.key(10))
    adB = _random_like(zero, jax.random.key(11))

    mixed_ab = _sample_batched(pipe, _stack([adA, adB]), jnp.asarray([1.0, 1.0]))
    mixed_az = _sample_batched(pipe, _stack([adA, zero]), jnp.asarray([1.0, 1.0]))
    np.testing.assert_array_equal(mixed_ab[0], mixed_az[0])  # slot 0 untouched
    assert np.abs(mixed_ab[1] - mixed_az[1]).max() > 1e-5    # slot 1 moved

    # per-slot scale: slot 1 at scale 0 == slot 1 with the zero adapter
    scaled = _sample_batched(pipe, _stack([adA, adB]), jnp.asarray([1.0, 0.0]))
    np.testing.assert_array_equal(scaled[1], mixed_az[1])


def test_sampler_batched_uniform_matches_shared_adapter(pipe):
    """All-same-adapter stacked batch ≈ the classic shared-adapter program
    (different XLA program ⇒ tolerance, not equality)."""
    zero = zero_lora(pipe.params["unet"], pipe.params["text_encoder"], rank=4)
    adA = _random_like(zero, jax.random.key(10))
    stacked = _sample_batched(pipe, _stack([adA, adA]), jnp.asarray([1.0, 1.0]))
    shared = _sample_batched(pipe, adA, 1.0)
    np.testing.assert_allclose(stacked, shared, atol=2e-3)


# -- server level -------------------------------------------------------------


@pytest.fixture(scope="module")
def mserver(pipe):
    srv = SamplerServer(
        pipe, batch_size=4, max_wait_s=0.02, num_inference_steps=3,
        height=64, width=64, multi_lora=True,
    )
    zero = srv._loras[None][0]
    srv.register_lora("idA", _random_like(zero, jax.random.key(10)))
    srv.register_lora("idB", _random_like(zero, jax.random.key(11)), scale=0.5)
    yield srv
    srv.shutdown()


def test_multi_lora_mixed_batch_determinism(mserver):
    """Same (prompt, seed, lora) → same image regardless of which adapters
    share the batch (and whether it's padded)."""
    r = GenerationRequest(prompt="a face portrait", seed=5, lora_id="idA")
    alone = mserver.generate([r])[0]
    mixed = mserver.generate(
        [
            GenerationRequest(prompt="other 0", seed=1, lora_id="idB"),
            GenerationRequest(prompt="other 1", seed=2),
            GenerationRequest(prompt="other 2", seed=3, lora_id="idB"),
            r,
        ]
    )[-1]
    np.testing.assert_array_equal(alone.image, mixed.image)
    # adapters bite: idA result differs from no-lora result for the same seed
    plain = mserver.generate([GenerationRequest(prompt="a face portrait", seed=5)])[0]
    assert np.abs(alone.image.astype(int) - plain.image.astype(int)).max() >= 1


def test_multi_lora_one_program_across_compositions(mserver):
    """Mixed, uniform, and no-lora batches all ride ONE compiled program."""
    size_before = sample._cache_size()
    mserver.generate(
        [
            GenerationRequest(prompt="p0", seed=21, lora_id="idA"),
            GenerationRequest(prompt="p1", seed=22, lora_id="idB"),
            GenerationRequest(prompt="p2", seed=23),
        ]
    )
    mserver.generate([GenerationRequest(prompt=f"u{i}", seed=30 + i, lora_id="idB") for i in range(4)])
    mserver.generate([GenerationRequest(prompt="n", seed=40)])
    assert sample._cache_size() == size_before


def test_multi_lora_stack_cache(mserver):
    n0 = len(mserver._stack_cache)
    reqs = [GenerationRequest(prompt=f"c{i}", seed=50 + i, lora_id="idA") for i in range(4)]
    mserver.generate(reqs)
    n1 = len(mserver._stack_cache)
    mserver.generate(reqs)  # same composition → cache hit, no growth
    assert len(mserver._stack_cache) == n1 >= max(n0, 1)
    # re-registering an adapter invalidates stale compositions
    mserver.register_lora("idA", mserver._loras["idA"][0])
    assert len(mserver._stack_cache) == 0


def test_multi_lora_matches_classic_server(pipe, mserver):
    """A uniform-lora batch through the hetero server ≈ the classic per-LoRA
    server (different program ⇒ a few uint8 codes of jitter allowed)."""
    classic = SamplerServer(
        pipe, batch_size=4, max_wait_s=0.02, num_inference_steps=3,
        height=64, width=64,
    )
    try:
        classic.register_lora("idA", mserver._loras["idA"][0])
        reqs = [GenerationRequest(prompt=f"m{i}", seed=60 + i, lora_id="idA") for i in range(4)]
        a = mserver.generate(reqs)
        b = classic.generate(reqs)
        for x, y in zip(a, b):
            diff = np.abs(x.image.astype(int) - y.image.astype(int))
            assert diff.max() <= 8 and diff.mean() < 1.5, (diff.max(), diff.mean())
    finally:
        classic.shutdown(wait=False)


def test_multi_lora_mesh_sharded(pipe, mserver):
    """multi_lora under a data-parallel mesh: stacked adapters shard over
    "data" aligned with their prompt rows; in-placement results exact."""
    from faceposegenerator_tpu.core.mesh import make_mesh

    mesh = make_mesh(devices=jax.devices()[:4])
    srv = SamplerServer(
        pipe, batch_size=4, max_wait_s=0.02, num_inference_steps=3,
        height=64, width=64, mesh=mesh, multi_lora=True,
    )
    try:
        srv.register_lora("idA", mserver._loras["idA"][0])
        srv.register_lora("idB", mserver._loras["idB"][0], scale=0.5)
        reqs = [
            GenerationRequest(prompt=f"mesh {i}", seed=70 + i,
                              lora_id=["idA", "idB", None, "idA"][i])
            for i in range(4)
        ]
        out = srv.generate(reqs)
        again = srv.generate(reqs)
        for m, a in zip(out, again):
            np.testing.assert_array_equal(m.image, a.image)  # exact in-placement
        single = mserver.generate(reqs)
        for m, s in zip(out, single):
            diff = np.abs(m.image.astype(int) - s.image.astype(int))
            assert diff.max() <= 8 and diff.mean() < 1.5, (diff.max(), diff.mean())
    finally:
        srv.shutdown(wait=False)
