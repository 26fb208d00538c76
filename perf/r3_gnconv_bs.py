"""Round-3: GN+SiLU→conv prologue-fusion measurement (VERDICT r2 #5) and
the bs8-vs-bs16 sampler sweet-spot check (raw bs8 measured 1.99 img/s in
perf/r3_sweep_matrix.jsonl — ABOVE bs16's 1.952; confirm with more
repeats). One process; one JSON line per variant."""

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))

from faceposegenerator_tpu.core.precision import Policy
from faceposegenerator_tpu.diffusion import make_ddpm
from faceposegenerator_tpu.diffusion.sampler import SamplerModels, sample
from faceposegenerator_tpu.models import clip_text, unet2d, vae
from faceposegenerator_tpu.ops import fused_gn_conv

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


def run(tag, bs, gn_conv, repeats=3):
    fused_gn_conv._IMPL = "pallas" if gn_conv else "xla"
    ids = jax.random.randint(jax.random.key(4), (bs, 77), 0, 49408)

    def once(key):
        return sample(params, sched, ids, jnp.zeros_like(ids), key,
                      models=models, guidance_scale=5.0, height=512, width=512,
                      policy=policy, lora=lora)

    try:
        float(jnp.sum(once(jax.random.key(0))))
        ts = []
        for i in range(repeats):
            t0 = time.perf_counter()
            float(jnp.sum(once(jax.random.key(i + 1))))
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"variant": tag, "batch_s": round(min(ts), 3),
                          "img_s": round(bs / min(ts), 3),
                          "times": [round(t, 3) for t in ts]}), flush=True)
    except Exception as e:
        print(json.dumps({"variant": tag, "error": f"{type(e).__name__}: {e}"[:400]}),
              flush=True)
        time.sleep(150)  # kernel crashes poison the worker briefly
    finally:
        fused_gn_conv._IMPL = "xla"


run("bs16_xla_control", 16, False)
run("bs16_gnconv_pallas", 16, True)
run("bs8_xla", 8, False, repeats=5)
run("bs8_gnconv_pallas", 8, True)
