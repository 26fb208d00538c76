"""Named acceleration presets (`pipelines/presets.py`).

What must hold: every preset's `mode_spec()` round-trips through the
accel-report parser into exactly the knobs the preset applies (the knob
and its quality measurement stay bound together — VERDICT r3 #1);
`apply()` swaps the scheduler and quantizes in place and the returned
kwargs drive `sample()`; the CLI refuses ambiguous `--preset` + manual
turbo-flag combinations; BENCH_PRESET expands to the documented knob envs
with explicit envs winning.

Reference precedent for the few-step stack: the validation sampler swaps
DDPM for DPMSolverMultistepScheduler (`train_ID-Booth.py:155`) while the
inference op point stays 30-step DDPM (`inference_ID-Booth.py:48-50`).
"""

import os

import jax
import jax.numpy as jnp
import pytest

from faceposegenerator_tpu.core.precision import PARITY_POLICY
from faceposegenerator_tpu.diffusion.sampler import SamplerModels
from faceposegenerator_tpu.evaluation.accel_report import parse_mode
from faceposegenerator_tpu.models import clip_text, unet2d, vae
from faceposegenerator_tpu.ops import quant
from faceposegenerator_tpu.pipelines.presets import PRESETS, Preset, get_preset
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


def test_registry():
    assert set(PRESETS) >= {"turbo", "latency"}
    assert get_preset("turbo") is PRESETS["turbo"]
    with pytest.raises(ValueError, match="unknown preset"):
        get_preset("warp9")


@pytest.mark.parametrize("name", sorted(PRESETS))
def test_mode_spec_roundtrips_through_parse_mode(name):
    """The spec accel-report measures must be EXACTLY the stack the preset
    applies: scheduler/steps as pipeline-level keys, sampler kwargs equal
    to sample_kwargs(), quantize mode + static-calibration suffix intact."""
    p = PRESETS[name]
    kwargs, quantize = parse_mode(p.mode_spec())
    assert kwargs.pop("scheduler_kind", "ddpm") == p.scheduler
    assert kwargs.pop("num_inference_steps", 30) == p.steps
    assert kwargs == p.sample_kwargs()
    if p.quantize is None:
        assert quantize is None
    else:
        base, _, static = (quantize or "").partition(":")
        assert base == p.quantize
        if p.quant_calibrate_steps > 0:
            assert static == f"static:{p.quant_calibrate_steps}"


def test_server_kwargs_carry_scheduler_and_steps():
    p = PRESETS["turbo"]
    kw = p.server_kwargs()
    assert kw["scheduler"] == p.scheduler
    assert kw["num_inference_steps"] == p.steps
    for k, v in p.sample_kwargs().items():
        assert kw[k] == v


def test_apply_quantizes_and_sets_scheduler():
    pipe = StableDiffusionPipeline.from_random(
        jax.random.key(0), models=TINY, policy=PARITY_POLICY
    )
    p = PRESETS["turbo"]
    kw = p.apply(pipe, calibrate=False)  # dynamic scales: fast for CPU tests
    assert pipe.scheduler_kind == p.scheduler
    assert kw == p.sample_kwargs()
    assert quant.is_quantized(
        pipe.params["unet"]["down_blocks"][0]["resnets"][0]["conv1"]["w"]
    )
    # the preset pipeline still samples end to end (its own program)
    ids = jax.random.randint(jax.random.key(1), (1, 77), 0, 512)
    img = pipe(
        input_ids=ids, num_inference_steps=p.steps, height=64, width=64,
        seed=0, **kw,
    )
    assert img.shape == (1, 64, 64, 3)
    assert bool(jnp.all(jnp.isfinite(jnp.asarray(img))))


def test_apply_calibrates_static_scales():
    """calibrate=True freezes static act scales (the 'a' leaf) on observed
    quant sites — the program bench.py probes with BENCH_QUANT_ACT."""
    pipe = StableDiffusionPipeline.from_random(
        jax.random.key(0), models=TINY, policy=PARITY_POLICY
    )
    ids = jax.random.randint(jax.random.key(1), (1, 77), 0, 512)
    p = Preset(name="t", scheduler="dpm", steps=2, quantize="w8a8",
               quant_calibrate_steps=1)
    p.apply(pipe, calibrate=True, input_ids=ids, height=64, width=64)
    leaf = pipe.params["unet"]["down_blocks"][0]["resnets"][0]["conv1"]["w"]
    assert quant.is_quantized(leaf) and "a" in leaf


def test_latency_preset_stays_bf16():
    """w8a8 at batch 1 measured negative (perf/r3as) — the latency preset
    must not quantize."""
    p = PRESETS["latency"]
    assert p.quantize is None
    assert p.cfg_interval is not None and p.deepcache_interval > 1


def test_cli_generate_rejects_preset_plus_manual_knob(tmp_path):
    from faceposegenerator_tpu.cli import main

    with pytest.raises(SystemExit) as e:
        main([
            "generate", "--model_dir", str(tmp_path), "--lora_root",
            str(tmp_path), "--preset", "turbo", "--quantize", "w8a8",
        ])
    assert e.value.code == 2  # argparse .error, before any model load


def test_cli_serve_rejects_preset_plus_rolling(tmp_path):
    from faceposegenerator_tpu.cli import main

    with pytest.raises(SystemExit) as e:
        main([
            "serve", "--model_dir", str(tmp_path), "--preset", "latency",
            "--rolling",
        ])
    assert e.value.code == 2


def test_bench_preset_env_expansion(monkeypatch):
    import bench

    for k in ("BENCH_SCHEDULER", "BENCH_STEPS", "BENCH_DEEPCACHE",
              "BENCH_DEEPCACHE_DEPTH", "BENCH_CFG_INTERVAL", "BENCH_QUANT",
              "BENCH_QUANT_ACT"):
        monkeypatch.delenv(k, raising=False)
    bench.apply_bench_preset("turbo")
    p = PRESETS["turbo"]
    assert os.environ["BENCH_SCHEDULER"] == p.scheduler
    assert os.environ["BENCH_STEPS"] == str(p.steps)
    assert os.environ["BENCH_DEEPCACHE"] == str(p.deepcache_interval)
    assert os.environ["BENCH_QUANT"] == p.quantize
    assert os.environ["BENCH_QUANT_ACT"] == "1.0"  # const static scales

    # an explicitly-set knob env wins over the preset (setdefault) — pick a
    # step count distinct from the preset's so the assertion stays meaningful
    override_steps = str(p.steps + 7)
    monkeypatch.setenv("BENCH_STEPS", override_steps)
    monkeypatch.delenv("BENCH_SCHEDULER", raising=False)
    bench.apply_bench_preset("turbo")
    assert os.environ["BENCH_STEPS"] == override_steps
    assert os.environ["BENCH_SCHEDULER"] == p.scheduler
