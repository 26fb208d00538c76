"""SamplerServer latency mode: parallel-in-time sampling behind the engine.

A batch_size-1 server with `parallel_window=W` serves per-request
deterministic images from the Picard sampler (`diffusion/parallel_sampler.py`)
while keeping every engine invariant (noise from the request seed via
`noise_override`, LoRA hot-swap, stats). tolerance=0 must reproduce the exact
sequential server's images bit-for-bit-at-u8 (same noise stream, fp32-policy
pipeline)."""

import numpy as np

from faceposegenerator_tpu.core.precision import PARITY_POLICY
from faceposegenerator_tpu.data.tokenizer import CLIPTokenizer, bytes_to_unicode
from faceposegenerator_tpu.diffusion.sampler import SamplerModels
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


def _make_pipe():
    units = list(bytes_to_unicode().values())
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for u in units:
        vocab.setdefault(u, len(vocab))
        vocab.setdefault(u + "</w>", len(vocab))
    tok = CLIPTokenizer(vocab, [], model_max_length=77)
    return StableDiffusionPipeline.from_random(
        models=TINY, tokenizer=tok, policy=PARITY_POLICY
    )


def test_parallel_server_matches_sequential_server():
    pipe = _make_pipe()
    kw = dict(batch_size=1, max_wait_s=0.02, num_inference_steps=4,
              height=64, width=64)
    seq = SamplerServer(pipe, **kw)
    par = SamplerServer(pipe, parallel_window=3, parallel_tolerance=0.0, **kw)
    loose = SamplerServer(pipe, parallel_window=4, parallel_tolerance=0.5, **kw)
    try:
        req = GenerationRequest(prompt="a face", seed=11)
        s = seq.generate([req])[0]
        p1 = par.generate([req])[0]
        p2 = par.generate([req])[0]
        np.testing.assert_array_equal(p1.image, p2.image)  # deterministic
        # tol=0 == the sequential chain; u8 quantization absorbs any
        # fusion-order jitter except at code boundaries — allow 1 code
        assert np.abs(p1.image.astype(int) - s.image.astype(int)).max() <= 1
        l1 = loose.generate([req])[0]
        assert np.isfinite(l1.image).all()
        assert np.abs(l1.image.astype(int) - s.image.astype(int)).mean() < 48
    finally:
        seq.shutdown(wait=False)
        par.shutdown(wait=False)
        loose.shutdown(wait=False)


def test_parallel_server_rejects_dpm():
    pipe = _make_pipe()
    pipe.set_scheduler("dpm")
    import pytest

    with pytest.raises(ValueError):
        SamplerServer(pipe, batch_size=1, scheduler="dpm", parallel_window=2,
                      num_inference_steps=4, height=64, width=64)
