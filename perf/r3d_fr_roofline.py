"""FR utility-training roofline (round 3): algorithmic FLOPs of the exact
bench_fr train step (iresnet50+AdaFace, 112², `FR_training/config/
FR_config.py:32-56`) from XLA cost analysis on CPU, combined with the
measured TPU throughput (perf/r3_final_benches2.jsonl: 1628 img/s bs128)
into an MFU statement like the sampler/train/embed rooflines in STATUS.md.

Run on CPU (the FLOP count is algorithmic, platform-independent):
    python perf/r3d_fr_roofline.py [measured_img_s]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from faceposegenerator_tpu.core.flops import cost_analysis
from faceposegenerator_tpu.core.precision import Policy
from faceposegenerator_tpu.training import fr

V5E_BF16_PEAK = 197e12
MEASURED = float(sys.argv[1]) if len(sys.argv) > 1 else 1628.0
BATCH = 128

policy = Policy(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16)
cfg = fr.FRConfig(network="iresnet50", loss="AdaFace", num_classes=1000, batch_size=BATCH)
params, state = fr.init_train_state(jax.random.key(0), cfg)
opt = fr.make_optimizer(cfg)
opt_state = opt.init(params)
step = fr.make_train_step(cfg, opt, policy=policy, donate=False)
batch = {
    "images": jax.random.uniform(jax.random.key(1), (BATCH, 112, 112, 3), minval=-1, maxval=1),
    "labels": jax.random.randint(jax.random.key(2), (BATCH,), 0, cfg.num_classes),
}
cost = cost_analysis(step, params, state, opt_state, batch, jax.random.key(3))
flops = cost["flops"]
gflop_per_img = flops / BATCH / 1e9
achieved = MEASURED * flops / BATCH
print(json.dumps({
    "config": "fr_train iresnet50+AdaFace bs128 112x112",
    "step_gflop": round(flops / 1e9, 1),
    "gflop_per_img": round(gflop_per_img, 2),
    "measured_img_s": MEASURED,
    "achieved_tflop_s": round(achieved / 1e12, 1),
    "mfu_vs_v5e_bf16_peak": round(achieved / V5E_BF16_PEAK, 3),
    "peak_bound_img_s": round(V5E_BF16_PEAK * BATCH / flops, 0),
}))
