import sys, os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os, time, json
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
from faceposegenerator_tpu.core.precision import Policy
from faceposegenerator_tpu.evaluation import fiqa, pose
from faceposegenerator_tpu.models import iresnet
from faceposegenerator_tpu.ops.image import resize_bilinear

policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
fr_cfg = iresnet.config_for("r100")
fp, fs = iresnet.init(jax.random.key(1), fr_cfg)
qs = fiqa.init_qs_head(jax.random.key(2))
qfn = fiqa.make_quality_fn_u8(fp, fs, qs, fr_cfg, policy=policy)
pp = pose.init_sixdrepnet(jax.random.key(3))
pfn = pose.make_pose_fn_u8(pp)

u8 = jnp.asarray(np.random.default_rng(0).integers(0,256,(8,512,512,3),np.uint8))

def timeit(name, f):
    f()  # warm
    ts=[]
    for _ in range(3):
        t0=time.perf_counter(); f(); ts.append(time.perf_counter()-t0)
    print(json.dumps({"name":name,"best_s":round(min(ts),4)}))

timeit("fiqa_u8 gather-resize bs8", lambda: float(jnp.sum(qfn(u8)[1])))
timeit("pose_u8 gather-resize bs8", lambda: float(jnp.sum(pfn(u8))))

@jax.jit
def q2(x_u8):
    x = x_u8.astype(jnp.float32)
    x = jax.image.resize(x, (x.shape[0],112,112,3), "bilinear")
    x = (x/255.0-0.5)/0.5
    emb,_,feats = iresnet.apply(fp,fs,x,fr_cfg,policy=policy,train=False,return_features=True)
    return feats @ qs["w"].astype(jnp.float32).T

@jax.jit
def p2(x_u8):
    x = x_u8.astype(jnp.float32)
    x = jnp.pad(x,((0,0),(30,30),(30,30),(0,0)),mode="edge")
    x = jax.image.resize(x,(x.shape[0],224,224,3),"bilinear")
    x = (x/255.0-jnp.asarray(pose.IMAGENET_MEAN))/jnp.asarray(pose.IMAGENET_STD)
    from faceposegenerator_tpu.models import repvgg
    feats = repvgg.apply(pp["backbone"], x, repvgg.REPVGG_B1G2)
    sixd = feats @ pp["head"]["w"].T + pp["head"]["b"]
    return pose.euler_from_rotation(pose.rotation_from_ortho6d(sixd))

timeit("fiqa jax.image.resize bs8", lambda: float(jnp.sum(q2(u8))))
timeit("pose jax.image.resize bs8", lambda: float(jnp.sum(p2(u8))))

# also: quantize+transfer cost
from faceposegenerator_tpu.ops.image import quantize_u8
f32 = jnp.asarray(np.random.default_rng(1).uniform(0,1,(8,512,512,3)).astype(np.float32))
timeit("quantize+host-transfer u8 bs8", lambda: np.asarray(quantize_u8(f32)).sum())
timeit("host-transfer f32 bs8", lambda: np.asarray(f32).sum())
