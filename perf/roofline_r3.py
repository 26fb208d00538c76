"""Round-3 rooflines (VERDICT r2 #2): algorithmic FLOPs for the embed path
and the ID-Booth train step from the compiler's own cost analysis, to state
MFU bounds next to the measured throughputs. Runs on the CPU backend —
compile-only, no execution; XLA's `flops` field is the algorithmic count.
"""

import sys, os as _os

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from faceposegenerator_tpu.core.flops import cost_analysis
from faceposegenerator_tpu.core.precision import Policy
from faceposegenerator_tpu.models import clip_text, iresnet, unet2d, vae
from faceposegenerator_tpu.training import idbooth

V5E_BF16_PEAK = 394e12 / 2  # 197 TFLOP/s bf16 per chip (v5e public number)

policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)


def report(tag, flops_total, n_imgs, measured_img_s):
    f_img = flops_total / n_imgs
    achieved = f_img * measured_img_s
    out = {
        "tag": tag,
        "gflops_per_img": round(f_img / 1e9, 2),
        "measured_img_s": measured_img_s,
        "achieved_tflops": round(achieved / 1e12, 2),
        "mfu_vs_v5e_bf16_peak": round(achieved / V5E_BF16_PEAK, 4),
        "roofline_img_s_at_peak": round(V5E_BF16_PEAK / f_img, 1),
    }
    print(json.dumps(out), flush=True)
    return out


# --- embed path (BASELINE config 3): r100 @ 112², bs4096 measured 6360 -----
cfg = iresnet.config_for("r100")
params, state = iresnet.init(jax.random.key(0), cfg)
bs = 256  # FLOPs scale linearly; compile a small batch for speed


def embed(x):
    e, _ = iresnet.apply(params, state, x, cfg, policy=policy, train=False)
    return e


ca = cost_analysis(embed, jnp.zeros((bs, 112, 112, 3), jnp.float32))
report("embed r100 112^2 (bs4096 op point)", ca["flops"], bs, 6360.0)

# --- train step (BASELINE config 4) at the reference op point bs2(+prior) --
bundle = idbooth.ModelBundle(arcface_cfg=iresnet.config_for("r100"), attn_impl="reference")
ap, ast = iresnet.init(jax.random.key(3), bundle.arcface_cfg)
frozen = {
    "text_encoder": clip_text.init(jax.random.key(0), bundle.text_cfg, dtype=jnp.bfloat16),
    "unet": unet2d.init(jax.random.key(1), bundle.unet_cfg, dtype=jnp.bfloat16),
    "vae": vae.init(jax.random.key(2), bundle.vae_cfg, dtype=jnp.bfloat16),
    "arcface": {"params": ap, "state": ast},
}

for tag, batch, img_s in (("train bs2(+prior) triplet", 2, 4.61), ("train bs8(+prior)+remat", 8, 8.93)):
    tcfg = idbooth.IDBoothConfig(
        which_loss="triplet_prior", train_batch_size=batch,
        gradient_checkpointing=(batch == 8),
    )
    trainable = idbooth.init_trainable(jax.random.key(4), tcfg, bundle, frozen["unet"])
    from faceposegenerator_tpu.diffusion import make_ddpm

    loss_fn = idbooth.make_loss_fn(tcfg, bundle, make_ddpm(), policy=policy)

    def grad_step(tr, fz, b, k):
        return jax.grad(lambda t: loss_fn(t, fz, b, k)[0])(tr)

    b = {
        "pixel_values": jnp.zeros((2 * batch, 512, 512, 3), jnp.float32),
        "input_ids": jnp.zeros((2 * batch, 77), jnp.int32),
        "gt_embeds": jnp.zeros((2 * batch, 512), jnp.float32),
    }
    ca = cost_analysis(grad_step, trainable, frozen, b, jax.random.key(0))
    report(tag, ca["flops"], batch, img_s)

# --- component attribution for the train step (forward-only FLOPs) ---------
comp = {}
lat = jnp.zeros((4, 64, 64, 4), jnp.bfloat16)
ctx = jnp.zeros((4, 77, 1024), jnp.bfloat16)
comp["unet_fwd_bs4"] = cost_analysis(
    lambda l, t, c: unet2d.apply(frozen["unet"], l, t, c, bundle.unet_cfg, policy=policy),
    lat, jnp.zeros((4,), jnp.int32), ctx,
)["flops"]
comp["vae_encode_bs4"] = cost_analysis(
    lambda x: vae.encode_moments(frozen["vae"], x, bundle.vae_cfg, policy),
    jnp.zeros((4, 512, 512, 3), jnp.float32),
)["flops"]
comp["vae_decode_bs2"] = cost_analysis(
    lambda z: vae.decode(frozen["vae"], z, bundle.vae_cfg, policy),
    jnp.zeros((2, 64, 64, 4), jnp.bfloat16),
)["flops"]
comp["arcface_bs2"] = cost_analysis(
    lambda x: iresnet.apply(ap, ast, x, bundle.arcface_cfg, policy=policy, train=False)[0],
    jnp.zeros((2, 112, 112, 3), jnp.float32),
)["flops"]
print(json.dumps({k: round(v / 1e9, 2) for k, v in comp.items()}), flush=True)
