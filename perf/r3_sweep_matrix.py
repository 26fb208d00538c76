"""One-process sweep-bench matrix (round 3, VERDICT #1 attribution).

Runs the sweep bench variants in a single process so the compiled sampler
programs are shared (axon recompiles per process otherwise). Prints one
JSON line per variant.
"""

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

import bench


def run(tag, **env):
    for k, v in env.items():
        os.environ[k] = str(v)
    try:
        r = bench.bench_sweep(int(os.environ.get("BENCH_REPEATS", "3")))
        r["variant"] = tag
        print(json.dumps(r), flush=True)
    finally:
        for k in env:
            os.environ.pop(k, None)


# 1. pure generation through run_sweep infra (no eval hook, no PNGs)
run("gen_only_8", BENCH_SWEEP_PROMPTS=8, BENCH_SWEEP_EVAL=0, BENCH_SWEEP_PNGS=0)
# 2. + PNG writes (thread pool)
run("gen_png_8", BENCH_SWEEP_PROMPTS=8, BENCH_SWEEP_EVAL=0, BENCH_SWEEP_PNGS=1)
# 3. full harness (default): eval hook + PNGs
run("full_8", BENCH_SWEEP_PROMPTS=8)
# 4. full harness at 16 prompts (one bs16 generation batch)
run("full_16", BENCH_SWEEP_PROMPTS=16)
# 5. 16 prompts as 2×bs8 (cross-batch overlap engaged)
run("full_16_bs8", BENCH_SWEEP_PROMPTS=16, BENCH_SWEEP_BATCH=8)
# 6. raw sampler reference point at bs8 (shares the compiled program)
import time

import jax
import jax.numpy as jnp


def raw_sampler(bs):
    from faceposegenerator_tpu.core.precision import Policy
    from faceposegenerator_tpu.diffusion import make_ddpm
    from faceposegenerator_tpu.diffusion.sampler import SamplerModels, sample
    from faceposegenerator_tpu.models import clip_text, unet2d, vae

    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    models = SamplerModels(attn_impl="auto")
    params = {
        "text_encoder": clip_text.init(jax.random.key(0), models.text_cfg, dtype=jnp.bfloat16),
        "unet": unet2d.init(jax.random.key(1), models.unet_cfg, dtype=jnp.bfloat16),
        "vae": vae.init(jax.random.key(2), models.vae_cfg, dtype=jnp.bfloat16),
    }
    lora = {
        "unet": unet2d.init_lora(jax.random.key(3), params["unet"], rank=4, dtype=jnp.bfloat16),
        "text_encoder": None,
    }
    sched = make_ddpm(num_inference_steps=30)
    ids = jax.random.randint(jax.random.key(4), (bs, 77), 0, 49408)

    def run_once(key):
        return sample(params, sched, ids, jnp.zeros_like(ids), key,
                      models=models, guidance_scale=5.0, height=512, width=512,
                      policy=policy, lora=lora)

    float(jnp.sum(run_once(jax.random.key(0))))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(run_once(jax.random.key(i + 1))))
        ts.append(time.perf_counter() - t0)
    print(json.dumps({"variant": f"raw_sampler_bs{bs}", "batch_s": round(min(ts), 3),
                      "img_s": round(bs / min(ts), 3)}), flush=True)


raw_sampler(8)
raw_sampler(16)
