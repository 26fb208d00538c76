import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json, time
import numpy as np
import jax, jax.numpy as jnp
from faceposegenerator_tpu.models import mtcnn

params = mtcnn.brightness_cascade_params()
imgs = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (64, 250, 250, 3)).astype(np.float32))

def t(name, f):
    try:
        t0 = time.perf_counter(); f(); dt = time.perf_counter() - t0
        print(json.dumps({"name": name, "ok": True, "s": round(dt, 2)}), flush=True)
    except Exception as e:
        print(json.dumps({"name": name, "ok": False, "err": f"{type(e).__name__}: {e}"[:200]}), flush=True)

# 1. pyramid program at the largest scale
t("pnet_scale 150x150", lambda: np.asarray(mtcnn._pnet_scale_apply(params["pnet"], imgs, 150, 150)[0]).sum())
# 2. stage program small bucket
idx = jnp.zeros((128,), jnp.int32)
boxes = jnp.tile(jnp.asarray([[50., 50., 150., 150.]]), (128, 1))
t("stage rnet M=128", lambda: np.asarray(mtcnn._stage_apply(params["rnet"], imgs, idx, boxes, 24, "rnet")[0]).sum())
# 3. stage big bucket
idx2 = jnp.zeros((2048,), jnp.int32)
boxes2 = jnp.tile(jnp.asarray([[50., 50., 150., 150.]]), (2048, 1))
t("stage rnet M=2048", lambda: np.asarray(mtcnn._stage_apply(params["rnet"], imgs, idx2, boxes2, 24, "rnet")[0]).sum())
# 4. onet
t("stage onet M=128", lambda: np.asarray(mtcnn._stage_apply(params["onet"], imgs, idx, boxes, 48, "onet")[0]).sum())
