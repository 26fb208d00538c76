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
    ap.add_argument("--mode", action="append", default=None,
                    help="accel_report mode spec (repeatable; one process "
                         "compiles exact once and reuses it across modes). "
                         "Optional when --floor is given.")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--out", default="perf/r4e_quality.jsonl")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--qtag", default=None,
                    help="tag written into every emitted row — queue scripts "
                         "key resume-skips on it (VERDICT r4 #5)")
    ap.add_argument("--floor", action="store_true",
                    help="also emit the random-weights PSNR calibration "
                         "brackets: exact(seed) vs exact(seed+1) — the "
                         "UNRELATED-sample floor any mode PSNR must be read "
                         "against — plus an exact re-run bit-identity sanity "
                         "row (VERDICT r4 #4)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model configs on CPU (script smoke test only)")
    args = ap.parse_args()
    if not args.mode and not args.floor:
        ap.error("pass at least one --mode, or --floor")

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

    dev = jax.devices()[0]
    rows = []

    if args.floor:
        import numpy as np

        from faceposegenerator_tpu.evaluation.accel_report import _psnr

        gen_kw = dict(
            input_ids=input_ids, num_inference_steps=args.steps,
            guidance_scale=5.0, height=args.size, width=args.size,
            output_type="u8",
        )
        a = np.asarray(pipe(**gen_kw, seed=args.seed))
        a2 = np.asarray(pipe(**gen_kw, seed=args.seed))  # determinism sanity
        b = np.asarray(pipe(**gen_kw, seed=args.seed + 1))
        psnr_ab, _ = _psnr(a, b)
        _, mse_aa = _psnr(a, a2)
        finite = [v for v in psnr_ab if v is not None]
        rows.append({
            "metric": f"accel-report PSNR floor calibration ({args.size}x"
                      f"{args.size}, {args.steps}-step exact, bf16, random "
                      "weights): exact(seed) vs exact(seed+1) = PSNR of "
                      "UNRELATED samples — the scale bottom for mode PSNRs",
            "mode": "__seed_floor__",
            "psnr_min": min(finite) if finite else None,
            "psnr_mean": round(float(sum(finite) / len(finite)), 2) if finite else None,
            "rerun_identical_frac": round(float((mse_aa == 0.0).mean()), 3),
            "seed": args.seed,
            "device": getattr(dev, "device_kind", str(dev)),
        })

    if args.mode:
        report = compare_modes(
            pipe, args.mode, input_ids=input_ids, seed=args.seed,
            num_inference_steps=args.steps, height=args.size, width=args.size,
        )
        for spec, entry in report["modes"].items():
            rows.append({
                "metric": f"accel-report PSNR vs exact ({args.size}x{args.size}, "
                          f"{args.steps}-step ddpm exact ref, bf16, random weights)",
                "mode": spec,
                "psnr_min": entry.get("psnr_min"),
                "psnr_mean": entry.get("psnr_mean"),
                "identical_frac": entry.get("identical_frac"),
                "mode_batch_s": entry.get("batch_s"),
                "exact_batch_s": report["exact"]["batch_s"],
                "device": getattr(dev, "device_kind", str(dev)),
            })

    with open(args.out, "a") as f:
        for row in rows:
            if args.qtag:
                row["qtag"] = args.qtag
            if args.batch != 2 or args.size != 512:
                row["probe_batch"] = args.batch
                row["probe_size"] = args.size
            f.write(json.dumps(row) + "\n")
            print(json.dumps(row))


if __name__ == "__main__":
    main()
