"""Round-3 extras: the reference's ACTUAL per-identity prompt count (21)
through the streaming sweep harness, and bs8 sampler time attribution for
the new default batch."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import bench

def run(fn, tag, **env):
    for k, v in env.items():
        os.environ[k] = str(v)
    try:
        r = fn(); r["variant"] = tag
        print(json.dumps(r), flush=True)
    except Exception as e:
        print(json.dumps({"variant": tag, "error": f"{type(e).__name__}: {e}"[:300]}), flush=True)
    finally:
        for k in env:
            os.environ.pop(k, None)

run(lambda: bench.bench_sweep(3), "sweep_21_ref_op_point", BENCH_SWEEP_PROMPTS=21)

# bs8 attribution (BENCH_ABLATE path lives in bench.main; replicate inline)
import time
import jax, jax.numpy as jnp

def sampler_run(tag, ablate=None):
    if ablate:
        bench.apply_ablation(ablate)
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
    lora = {"unet": unet2d.init_lora(jax.random.key(3), params["unet"], rank=4, dtype=jnp.bfloat16), "text_encoder": None}
    sched = make_ddpm(num_inference_steps=30)
    ids = jax.random.randint(jax.random.key(4), (8, 77), 0, 49408)
    f = lambda k: sample(params, sched, ids, jnp.zeros_like(ids), k, models=models,
                         guidance_scale=5.0, height=512, width=512, policy=policy, lora=lora)
    float(jnp.sum(f(jax.random.key(0))))
    ts = []
    for i in range(3):
        t0 = time.perf_counter(); float(jnp.sum(f(jax.random.key(i+1)))); ts.append(time.perf_counter()-t0)
    print(json.dumps({"variant": tag, "batch_s": round(min(ts),3), "img_s": round(8/min(ts),3)}), flush=True)

sampler_run("bs8_no_attn", "no_attn")
sampler_run("bs8_no_xf", "no_xf")
