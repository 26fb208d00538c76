import sys, os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os, time, json
import jax, jax.numpy as jnp
import numpy as np
from faceposegenerator_tpu.ops.image import quantize_u8

f32 = jnp.asarray(np.random.default_rng(1).uniform(0,1,(8,512,512,3)).astype(np.float32)) + 0.0

@jax.jit
def bump(x, i):
    return x + i * 1e-6

def t(name, f):
    f(0)
    ts=[]
    for i in range(1,4):
        t0=time.perf_counter(); f(i); ts.append(time.perf_counter()-t0)
    print(json.dumps({"name":name,"best_s":round(min(ts),4),"times":[round(x,3) for x in ts]}), flush=True)

# fresh arrays each rep (cache-busted)
t("fetch f32 25MB", lambda i: np.asarray(bump(f32, i)).sum())
t("fetch u8 6MB (quantize)", lambda i: np.asarray(quantize_u8(bump(f32, i))).sum())
t("fetch scalar (sum)", lambda i: float(jnp.sum(bump(f32, i))))

@jax.jit
def small(i):
    return jnp.full((8,4), i, jnp.float32)
t("fetch tiny (8,4)", lambda i: np.asarray(small(i)).sum())
