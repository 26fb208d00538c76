"""On-chip accel-report at the bench op point (512x512, 30-step DDPM+CFG
exact reference, bf16, random SD2.1-shaped weights).

Purpose: every candidate preset change (r4d probes: DeepCache interval
2/4 around the shipped dc3, the DPM-15 step frontier, bs16) must clear a
quality gate before the preset moves (pipelines/presets.py). Real
checkpoints cannot be downloaded here (zero egress), so this measures the
APPROXIMATION SENSITIVITY of the exact 512x512 program itself — PSNR of
the mode's output vs the exact bf16 output under identical (input_ids,
seed) — at the same shapes/dtype bench.py times. Random-weight PSNR is
an indicative lower-signal proxy (no natural-image prior); the day-one
real-weight gate is `cli parity-all`'s preset-quality leg.

Emits one JSON line per --mode to --out (append), bench-row style.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", action="append", required=True,
                    help="accel_report mode spec (repeatable; one process "
                         "compiles exact once and reuses it across modes)")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--out", default="perf/r4e_quality.jsonl")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model configs on CPU (script smoke test only)")
    args = ap.parse_args()

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    from faceposegenerator_tpu.core.precision import Policy
    from faceposegenerator_tpu.diffusion.sampler import SamplerModels
    from faceposegenerator_tpu.evaluation.accel_report import compare_modes
    from faceposegenerator_tpu.pipelines.txt2img import StableDiffusionPipeline

    if args.tiny:
        from faceposegenerator_tpu.models import clip_text, unet2d, vae

        models = SamplerModels(
            text_cfg=clip_text.CLIPTextConfig(
                vocab_size=512, hidden_size=48, num_layers=2, num_heads=4,
                intermediate_size=96,
            ),
            unet_cfg=unet2d.UNetConfig(
                block_out_channels=(32, 64, 64, 64), cross_attention_dim=48,
                head_dim=8,
            ),
            vae_cfg=vae.VAEConfig(block_out_channels=(32, 32, 32, 32)),
        )
    else:
        models = SamplerModels()

    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    pipe = StableDiffusionPipeline.from_random(
        models=models, dtype=jnp.bfloat16, policy=policy
    )
    # same prompt surrogate as bench.py's train batch: random token ids
    vocab = models.text_cfg.vocab_size
    input_ids = jax.random.randint(jax.random.key(7), (args.batch, 77), 0, vocab)

    report = compare_modes(
        pipe, args.mode, input_ids=input_ids, seed=0,
        num_inference_steps=args.steps, height=args.size, width=args.size,
    )
    dev = jax.devices()[0]
    with open(args.out, "a") as f:
        for spec, entry in report["modes"].items():
            row = {
                "metric": f"accel-report PSNR vs exact ({args.size}x{args.size}, "
                          f"{args.steps}-step ddpm exact ref, bf16, random weights)",
                "mode": spec,
                "psnr_min": entry.get("psnr_min"),
                "psnr_mean": entry.get("psnr_mean"),
                "identical_frac": entry.get("identical_frac"),
                "mode_batch_s": entry.get("batch_s"),
                "exact_batch_s": report["exact"]["batch_s"],
                "device": getattr(dev, "device_kind", str(dev)),
            }
            f.write(json.dumps(row) + "\n")
            print(json.dumps(row))


if __name__ == "__main__":
    main()
