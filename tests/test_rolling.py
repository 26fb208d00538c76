"""Rolling (iteration-level) serving engine (`serving/rolling.py`).

The contracts that make continuous batching trustworthy:
 - a (prompt, seed, lora) request gets the SAME image whether it rode an
   empty rolling server, a staggered mixed load, or the classic batch
   engine (slot-independence + the shared per-seed noise stream);
 - requests admitted mid-flight complete without disturbing in-flight
   slots;
 - per-slot LoRA adapters bite (and compose with quantized params);
 - the server surface (stats/shutdown/backpressure) behaves.

fp32 policy throughout: the rolling tick and the batch sampler are
different XLA programs, so bf16 would add compile-level jitter; at fp32
the per-request images must agree to within 1 uint8 code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceposegenerator_tpu.core.precision import PARITY_POLICY
from faceposegenerator_tpu.data.tokenizer import CLIPTokenizer, bytes_to_unicode
from faceposegenerator_tpu.diffusion.sampler import SamplerModels
from faceposegenerator_tpu.models import clip_text, unet2d, vae
from faceposegenerator_tpu.pipelines.txt2img import StableDiffusionPipeline
from faceposegenerator_tpu.serving import GenerationRequest, RollingServer, SamplerServer

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


def _pipe():
    return StableDiffusionPipeline.from_random(
        jax.random.key(0), models=TINY, tokenizer=_byte_tokenizer(),
        policy=PARITY_POLICY,
    )


def _rand_lora(srv, key=10, scale=0.1):
    zero = srv._loras[None][0]
    leaves, treedef = jax.tree_util.tree_flatten(zero)
    keys = jax.random.split(jax.random.key(key), len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef,
        [scale * jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)],
    )


KW = dict(batch_size=3, max_wait_s=0.0, num_inference_steps=3, height=64, width=64)


def test_matches_batch_engine_and_staggered_admission():
    pipe = _pipe()
    classic = SamplerServer(pipe, **KW)
    rolling = RollingServer(pipe, **KW)
    try:
        lora = _rand_lora(classic)
        classic.register_lora("idA", lora)
        rolling.register_lora("idA", lora)

        reqs = [
            GenerationRequest(prompt="a face portrait", seed=5),
            GenerationRequest(prompt="another person", seed=9, lora_id="idA"),
            GenerationRequest(prompt="third subject", seed=2),
            GenerationRequest(prompt="fourth subject", seed=7, lora_id="idA"),
        ]
        want = [classic.generate([r])[0] for r in reqs]

        # staggered: submit r0, let it start, then pile on r1..r3 (r3 queues
        # behind the 3 slots and admits only after a slot frees)
        f0 = rolling.submit(reqs[0])
        rest = [rolling.submit(r) for r in reqs[1:]]
        got = [f0.result(timeout=600)] + [f.result(timeout=600) for f in rest]

        for w_, g in zip(want, got):
            # different XLA programs: allow 1 uint8 code of fp32 jitter
            diff = np.abs(w_.image.astype(int) - g.image.astype(int)).max()
            assert diff <= 1, diff
        # and rolling is internally reproducible bit-exactly
        again = rolling.generate([reqs[1]])[0]
        np.testing.assert_array_equal(got[1].image, again.image)

        s = rolling.stats()
        assert s["requests"] == 5 and s["ticks"] >= 3
    finally:
        classic.shutdown()
        rolling.shutdown()


def test_midflight_admission_does_not_disturb_inflight():
    """Submit A alone; separately submit A then B one tick later — A's image
    must be identical in both runs (slot independence under admission)."""
    pipe = _pipe()
    srv = RollingServer(pipe, **KW)
    try:
        a = GenerationRequest(prompt="subject A", seed=11)
        b = GenerationRequest(prompt="subject B", seed=22)
        alone = srv.generate([a])[0]
        fa = srv.submit(a)
        fb = srv.submit(b)
        both_a, both_b = fa.result(timeout=600), fb.result(timeout=600)
        np.testing.assert_array_equal(alone.image, both_a.image)
        # and B matches its own solo run
        solo_b = srv.generate([b])[0]
        np.testing.assert_array_equal(solo_b.image, both_b.image)
    finally:
        srv.shutdown()


def test_rolling_on_quantized_pipeline():
    pipe = _pipe()
    pipe.quantize("w8a8")
    srv = RollingServer(pipe, **KW)
    try:
        r = GenerationRequest(prompt="a face", seed=3)
        one = srv.generate([r])[0]
        two = srv.generate([r])[0]
        np.testing.assert_array_equal(one.image, two.image)
        assert one.image.shape == (64, 64, 3) and one.image.dtype == np.uint8
    finally:
        srv.shutdown()


def test_rejects_uncomposable_modes():
    pipe = _pipe()
    with pytest.raises(ValueError, match="deepcache"):
        RollingServer(pipe, deepcache_interval=3, **KW)
    # "dpm" became a first-class rolling scheduler in round 4 (`_tick_dpm`
    # with per-slot multistep history) — constructing must NOT raise now.
    srv = RollingServer(pipe, scheduler="dpm", **KW)
    srv.shutdown()
    with pytest.raises(ValueError, match="scheduler"):
        RollingServer(pipe, scheduler="euler-nope", **KW)


def test_mesh_dp_rolling_matches_single_device():
    """Rolling slots shard over the mesh "data" axis (persistent ctx/noise/
    latent buffers pinned with `_place`, params/stacked LoRAs replicated by
    the base class): the same requests through a 4-device rolling server
    reproduce the single-device rolling server, slot reuse included (6
    requests through 4 slots). fp32 policy — cross-placement programs may
    differ in reduction order, so allow 1 uint8 code."""
    from faceposegenerator_tpu.core.mesh import make_mesh

    pipe = _pipe()
    mesh = make_mesh(devices=jax.devices()[:4])
    kw = {**KW, "batch_size": 4}
    single = RollingServer(pipe, **kw)
    meshed = RollingServer(pipe, mesh=mesh, **kw)
    try:
        lora = _rand_lora(single)
        single.register_lora("idA", lora)
        meshed.register_lora("idA", lora)
        reqs = [
            GenerationRequest(prompt=f"mesh roll {i}", seed=40 + i,
                              lora_id="idA" if i % 2 else None)
            for i in range(6)
        ]
        out_m = meshed.generate(reqs)
        out_s = single.generate(reqs)
        for m, s in zip(out_m, out_s):
            diff = np.abs(m.image.astype(int) - s.image.astype(int))
            assert diff.max() <= 1, diff.max()
        # slot count must divide the data axis
        with pytest.raises(ValueError, match="data axis"):
            RollingServer(pipe, mesh=mesh, **{**KW, "batch_size": 3})
    finally:
        single.shutdown(wait=False)
        meshed.shutdown(wait=False)


def test_shutdown_fails_inflight_and_queued():
    pipe = _pipe()
    srv = RollingServer(pipe, **KW)
    futs = [srv.submit(GenerationRequest(prompt=f"p{i}", seed=i)) for i in range(5)]
    srv.shutdown()
    for f in futs:
        try:
            f.result(timeout=60)
        except RuntimeError:
            pass  # shut down — expected for whatever had not completed
    with pytest.raises(RuntimeError):
        srv.submit(GenerationRequest(prompt="late", seed=0))


def test_http_api_over_rolling_server():
    """The HTTP layer (the `cli serve --rolling` surface) works unchanged
    over the rolling engine: POST /generate round-trips, /stats reports the
    rolling fields."""
    import json
    import urllib.request

    from faceposegenerator_tpu.serving.http_api import start_http_background

    pipe = _pipe()
    srv = RollingServer(pipe, **KW)
    httpd, port = start_http_background(srv, port=0)
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"prompt": "hi", "seed": 3, "output": "none"}).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            out = json.load(r)
        assert out["seed"] == 3
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats") as r:
            stats = json.load(r)
        assert stats["requests"] >= 1 and stats["ticks"] >= KW["num_inference_steps"]
    finally:
        httpd.shutdown()
        srv.shutdown()


def test_dpm_rolling_matches_batch_engine():
    """VERDICT r3 #8: the few-step DPM-Solver++ scheduler on the rolling
    path. A (prompt, seed) request's image must equal the classic batch
    engine's dpm result (same noise stream seeds the initial latent; the
    multistep history is per-slot), including requests admitted mid-flight
    whose slot inherits a previous occupant's stale m0/m1 — the warm-up
    first-order branch masks it by construction (`_tick_dpm` docstring)."""
    pipe = _pipe()
    kw = dict(KW, scheduler="dpm", num_inference_steps=4)
    classic = SamplerServer(pipe, **kw)
    rolling = RollingServer(pipe, **kw)
    try:
        lora = _rand_lora(classic)
        classic.register_lora("idA", lora)
        rolling.register_lora("idA", lora)
        reqs = [
            GenerationRequest(prompt="a face portrait", seed=5),
            GenerationRequest(prompt="another person", seed=9, lora_id="idA"),
            GenerationRequest(prompt="third subject", seed=2),
            # 4th request queues behind the 3 slots -> admits MID-FLIGHT
            # into a freed slot whose m0/m1 hold the previous occupant's
            # final history
            GenerationRequest(prompt="fourth subject", seed=7, lora_id="idA"),
        ]
        want = [classic.generate([r])[0] for r in reqs]
        futs = [rolling.submit(r) for r in reqs]
        got = [f.result(timeout=600) for f in futs]
        for w, g in zip(want, got):
            np.testing.assert_allclose(
                g.image.astype(np.int32), w.image.astype(np.int32), atol=1,
            )
        assert rolling.stats()["requests"] == 4
    finally:
        classic.shutdown()
        rolling.shutdown()
