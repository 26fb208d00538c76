"""Acceleration-mode quality report (`evaluation/accel_report.py`).

What must hold: the spec parser round-trips every mode key and rejects
junk; an exactness-anchor mode (cfg_interval=(0,S) — same program as
exact) reports 100% bit-identical images; approximate modes report finite
PSNR and identity cosines; the sibling pipeline used for quantized modes
leaves the caller's exact params untouched.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceposegenerator_tpu.core.precision import PARITY_POLICY
from faceposegenerator_tpu.diffusion.sampler import SamplerModels
from faceposegenerator_tpu.evaluation.accel_report import (
    compare_modes,
    make_embed_fn_u8,
    parse_mode,
)
from faceposegenerator_tpu.models import clip_text, unet2d, vae
from faceposegenerator_tpu.ops import quant
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


def test_parse_mode():
    kw, q = parse_mode("deepcache=3")
    assert kw == {"deepcache_interval": 3} and q is None
    kw, q = parse_mode("deepcache=3:2+cfg_interval=5:20+quantize=w8a8")
    assert kw == {"deepcache_interval": 3, "deepcache_depth": 2, "cfg_interval": (5, 20)}
    assert q == "w8a8"
    # '+' is the composition separator, so ToMe op lists use commas
    kw, q = parse_mode("tome=0.5:attn,xattn,mlp")
    assert kw == {"tome_ratio": 0.5, "tome_ops": "attn+xattn+mlp"}
    kw, q = parse_mode("parallel=8:0.2")
    assert kw == {"parallel_window": 8, "parallel_tolerance": 0.2}
    # pipeline-level keys (compare_modes pops them before the pipe call)
    kw, q = parse_mode("attn=flash_int8")
    assert kw == {"attn_impl": "flash_int8"} and q is None
    kw, q = parse_mode("scheduler=dpm:20")
    assert kw == {"scheduler_kind": "dpm", "num_inference_steps": 20}
    kw, q = parse_mode("scheduler=dpm+quantize=w8a8")
    assert kw == {"scheduler_kind": "dpm"} and q == "w8a8"


def test_parse_mode_rejects_junk():
    with pytest.raises(ValueError):
        parse_mode("warp=9")
    with pytest.raises(ValueError):
        parse_mode("deepcache")
    with pytest.raises(ValueError):
        parse_mode("attn=int4")
    with pytest.raises(ValueError):
        parse_mode("scheduler=euler")


def test_compare_modes_anchors_and_approximations():
    pipe = StableDiffusionPipeline.from_random(
        jax.random.key(0), models=TINY, policy=PARITY_POLICY
    )
    ids = jax.random.randint(jax.random.key(1), (2, 77), 0, 512)

    from faceposegenerator_tpu.models import iresnet

    cfg = iresnet.config_for("r18")
    ap_, st_ = iresnet.init(jax.random.key(2), cfg)
    embed_fn = make_embed_fn_u8(ap_, st_, cfg, policy=PARITY_POLICY)

    report = compare_modes(
        pipe,
        ["cfg_interval=0:3", "deepcache=2", "quantize=w8a8"],
        input_ids=ids, seed=5, num_inference_steps=3,
        height=64, width=64, embed_fn=embed_fn,
    )
    assert report["config"]["n_images"] == 2

    anchor = report["modes"]["cfg_interval=0:3"]
    assert anchor["identical_frac"] == 1.0
    assert anchor["psnr_db"] == [None, None] and anchor["psnr_min"] is None
    assert anchor["identity_cos_min"] == pytest.approx(1.0, abs=1e-3)

    for name in ("deepcache=2", "quantize=w8a8"):
        m = report["modes"][name]
        assert m["identical_frac"] < 1.0
        assert m["psnr_min"] is not None and np.isfinite(m["psnr_min"])
        assert len(m["identity_cos"]) == 2
        assert all(-1.0 <= c <= 1.0 + 1e-6 for c in m["identity_cos"])

    # the quantized sibling must not have touched the exact pipeline
    assert not quant.is_quantized(
        pipe.params["unet"]["down_blocks"][0]["resnets"][0]["conv1"]["w"]
    )
    # the report is JSON-serializable (None for infinite PSNR, plain floats)
    json.dumps(report)


def test_accel_report_cli(tmp_path):
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_parity_cli import _write_tiny_model_dir
    from faceposegenerator_tpu.data.tokenizer import bytes_to_unicode
    from faceposegenerator_tpu.cli import main

    model_dir = str(tmp_path / "model")
    os.makedirs(model_dir)
    _write_tiny_model_dir(model_dir)
    tok_dir = os.path.join(model_dir, "tokenizer")
    os.makedirs(tok_dir, exist_ok=True)
    units = list(bytes_to_unicode().values())
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for u in units:
        vocab.setdefault(u, len(vocab))
        vocab.setdefault(u + "</w>", len(vocab))
    with open(os.path.join(tok_dir, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(tok_dir, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")

    out = str(tmp_path / "report.json")
    rc = main([
        "accel-report", "--model_dir", model_dir, "--mode", "deepcache=2",
        "--prompt", "a face", "--steps", "2", "--height", "64", "--width", "64",
        "--output", out,
    ])
    assert rc == 0
    rep = json.load(open(out))
    assert "deepcache=2" in rep["modes"]
    assert rep["modes"]["deepcache=2"]["identical_frac"] <= 1.0


def test_compare_modes_pipeline_level_keys():
    """attn=/scheduler= modes build the sibling with a different
    SamplerModels/scheduler (popped before the pipe call); the caller's
    pipeline keeps its own attn impl, scheduler, and step count."""
    pipe = StableDiffusionPipeline.from_random(
        jax.random.key(0), models=TINY, policy=PARITY_POLICY
    )
    ids = jax.random.randint(jax.random.key(1), (1, 77), 0, 512)
    report = compare_modes(
        pipe, ["attn=reference", "scheduler=dpm:2"],
        input_ids=ids, seed=7, num_inference_steps=3, height=64, width=64,
    )
    # attn=reference is the same math through a different program: output
    # must be valid u8 images and the row JSON-clean (bit-identity is not
    # guaranteed across programs, so no anchor assertion)
    for name in ("attn=reference", "scheduler=dpm:2"):
        m = report["modes"][name]
        assert m["identical_frac"] <= 1.0
        json.dumps(m)
    # the few-step DPM row is a genuinely different chain vs DDPM-3 exact
    assert report["modes"]["scheduler=dpm:2"]["identical_frac"] < 1.0
    # the caller's pipeline is untouched
    assert pipe.models.attn_impl == TINY.attn_impl
    assert pipe.scheduler_kind == "ddpm"


def test_compare_modes_static_quant():
    """quantize=w8a8:static:N calibrates static act scales on the report's
    prompts; the report row is a real (non-anchor) approximation and the
    exact pipeline stays untouched."""
    pipe = StableDiffusionPipeline.from_random(
        jax.random.key(0), models=TINY, policy=PARITY_POLICY
    )
    ids = jax.random.randint(jax.random.key(1), (1, 77), 0, 512)
    report = compare_modes(
        pipe, ["quantize=w8a8:static:1"],
        input_ids=ids, seed=3, num_inference_steps=2, height=64, width=64,
    )
    m = report["modes"]["quantize=w8a8:static:1"]
    assert m["psnr_min"] is not None and np.isfinite(m["psnr_min"])
    assert not quant.is_quantized(
        pipe.params["unet"]["down_blocks"][0]["resnets"][0]["conv1"]["w"]
    )
    json.dumps(report)
