"""Benchmark: images/sec/chip for the flagship pipeline — 512×512 txt2img,
30-step DDPM + CFG 5.0, SD2.1 + rank-4 LoRA (the reference's inference
operating point, `inference_ID-Booth.py:47-50,138`; BASELINE.md north star
≥30 img/s/chip).

Runs on whatever chip `jax.devices()[0]` is (the driver runs it on real TPU).
Weights are randomly initialised — throughput is weight-agnostic. Prints ONE
JSON line: {"metric", "value", "unit", "vs_baseline"}.

Env knobs: BENCH_BATCH (default 8), BENCH_STEPS (default 30),
BENCH_REPEATS (default 3), BENCH_ATTN (auto|flash|reference).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp


def main():
    from faceposegenerator_tpu.core.precision import Policy
    from faceposegenerator_tpu.diffusion import make_ddpm
    from faceposegenerator_tpu.diffusion.sampler import SamplerModels, sample
    from faceposegenerator_tpu.models import clip_text, unet2d, vae

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    steps = int(os.environ.get("BENCH_STEPS", "30"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    attn = os.environ.get("BENCH_ATTN", "auto")

    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    models = SamplerModels(attn_impl=attn)

    params = {
        "text_encoder": clip_text.init(jax.random.key(0), models.text_cfg, dtype=jnp.bfloat16),
        "unet": unet2d.init(jax.random.key(1), models.unet_cfg, dtype=jnp.bfloat16),
        "vae": vae.init(jax.random.key(2), models.vae_cfg, dtype=jnp.bfloat16),
    }
    lora = {
        "unet": unet2d.init_lora(jax.random.key(3), params["unet"], rank=4, dtype=jnp.bfloat16),
        "text_encoder": None,
    }
    sched = make_ddpm(num_inference_steps=steps)
    ids = jax.random.randint(jax.random.key(4), (batch, 77), 0, 49408)
    neg = jnp.zeros_like(ids)

    def run(key):
        return sample(
            params, sched, ids, neg, key,
            models=models, guidance_scale=5.0, height=512, width=512,
            policy=policy, lora=lora,
        )

    # warmup/compile
    run(jax.random.key(0)).block_until_ready()

    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        run(jax.random.key(i + 1)).block_until_ready()
        times.append(time.perf_counter() - t0)

    best = min(times)
    ips = batch / best
    p50_latency = best / batch
    result = {
        "metric": f"images/sec/chip 512x512 {steps}-step DDPM+CFG SD2.1+LoRA bs{batch}",
        "value": round(ips, 3),
        "unit": "img/s",
        "vs_baseline": round(ips / 30.0, 3),
        "extra": {
            "p50_s_per_image": round(p50_latency, 3),
            "times_s": [round(t, 2) for t in times],
            "attn": attn,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
