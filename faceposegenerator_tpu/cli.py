"""Command-line entry points mirroring the reference's script surface.

    python -m faceposegenerator_tpu.cli <command> [args]

Commands ↔ reference scripts:
  train-idbooth   ↔ train_ID-Booth.py        (losses × identities sweep)
  generate        ↔ inference_ID-Booth.py    (prompt-grid synthesis sweep)
  extract-embeds  ↔ extract_ArcFace_embeds.py
  align-crop      ↔ utils/detect_align_crop_data.py
  train-fr        ↔ FR_training/train_FR.py
  test-fr         ↔ FR_training/test_FR.py
  dgm-eval        ↔ python -m dgm_eval
  pyeer           ↔ Evaluation/PyEER_analysis/analyse_pyeer_ID-Booth.py
  fiqa            ↔ Evaluation/CR-FIQA/getQualityScore…
  pose            ↔ Evaluation/PoseEstimation notebook
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _add_common(ap):
    ap.add_argument("--model_dir", default=None, help="local SD2.1 diffusers dir")
    ap.add_argument("--seed", type=int, default=0)


def _reject_preset_conflicts(ap, args, flag_defaults: dict):
    """--preset owns the turbo knobs; an explicit turbo flag alongside it is
    ambiguous (which wins?) — refuse instead of silently overriding."""
    clashing = [
        f"--{name}" for name, default in flag_defaults.items()
        if getattr(args, name) != default
    ]
    if clashing:
        ap.error(
            f"--preset {args.preset} sets the acceleration knobs itself; "
            f"drop {', '.join(clashing)} (or drop --preset and set knobs "
            f"manually)"
        )


def cmd_train_idbooth(argv):
    ap = argparse.ArgumentParser(prog="train-idbooth")
    _add_common(ap)
    ap.add_argument("--source_folder", required=True)
    ap.add_argument("--output_folder", default="Trained_LoRA_Models")
    ap.add_argument("--class_data_dir", default=None)
    ap.add_argument("--embeds_root", default=None)
    ap.add_argument("--arcface_weights", default=None)
    ap.add_argument("--losses", nargs="+", default=["", "identity", "triplet_prior"])
    ap.add_argument("--num_train_epochs", type=int, default=32)
    ap.add_argument("--lora_rank", type=int, default=4)
    ap.add_argument("--learning_rate", type=float, default=1e-4)
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument(
        "--vmap_identities", type=int, default=1,
        help="train K identities concurrently in one vmapped program "
        "(K independent fine-tunes, ~2x sweep throughput at the default "
        "per-identity batch; see training.multi_identity)",
    )
    ap.add_argument(
        "--identity_parallel", type=int, default=0, metavar="N",
        help="shard the K vmapped identities over an N-device 'data' mesh — "
        "identities are independent fine-tunes, so the sweep data-"
        "parallelizes with ZERO gradient collectives (K must divide N; "
        "requires --vmap_identities)",
    )
    args = ap.parse_args(argv)
    if args.identity_parallel and args.vmap_identities < 2:
        ap.error("--identity_parallel requires --vmap_identities K >= 2")

    import jax

    from .core.dist import maybe_init_from_env

    maybe_init_from_env()  # multi-host launch opt-in via FPG_* env (no-op otherwise)

    from .bridge.torch_weights import (
        convert_iresnet_state_dict,
        load_sd21_params,
        load_torch_pth,
    )
    from .data.tokenizer import CLIPTokenizer
    from .models import iresnet
    from .training import idbooth, idbooth_driver

    cfg = idbooth.IDBoothConfig(
        losses_to_test=tuple(args.losses),
        num_train_epochs=args.num_train_epochs,
        lora_rank=args.lora_rank,
        learning_rate=args.learning_rate,
        resolution=args.resolution,
        seed=args.seed,
    )
    bundle = idbooth.ModelBundle()
    if args.model_dir is None:
        ap.error("--model_dir with SD2.1 weights is required for real training")
    frozen = load_sd21_params(args.model_dir)
    if args.arcface_weights:
        ap_, st_ = convert_iresnet_state_dict(load_torch_pth(args.arcface_weights))
    else:
        ap_, st_ = iresnet.init(jax.random.key(0), bundle.arcface_cfg)
    frozen["arcface"] = {"params": ap_, "state": st_}
    tokenizer = CLIPTokenizer.from_pretrained(os.path.join(args.model_dir, "tokenizer"))
    extra = {}
    if args.identity_parallel:
        from .core.mesh import make_mesh

        extra["mesh"] = make_mesh(
            devices=jax.devices()[: args.identity_parallel]
        )
    idbooth_driver.run_experiment_sweep(
        cfg, bundle, frozen, args.source_folder, args.output_folder,
        tokenizer=tokenizer, embeds_root=args.embeds_root, class_dir=args.class_data_dir,
        vmap_identities=args.vmap_identities, **extra,
    )


def _parse_interval(spec):
    """"I0:I1" → (int, int) step-index guidance interval, or None."""
    if spec is None:
        return None
    lo, _, hi = str(spec).partition(":")
    return (int(lo), int(hi))


def cmd_generate(argv):
    ap = argparse.ArgumentParser(prog="generate")
    _add_common(ap)
    ap.add_argument("--lora_root", required=True)
    ap.add_argument("--output", default="Generated_Samples")
    ap.add_argument("--gender_dict", default=None)
    ap.add_argument("--checkpoint", default="checkpoint-31-6400")
    ap.add_argument("--num_prompts", type=int, default=21)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--guidance", type=float, default=5.0)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument(
        "--eval", action="store_true",
        help="stream CR-FIQA + 6DRepNet pose over the in-memory device "
             "batches while generating (no PNG re-read round-trips); writes "
             "<output>/eval/fiqa_scores.txt and pose_stats.json",
    )
    ap.add_argument("--fiqa_weights", default=None, help="CR-FIQA .pth for --eval")
    ap.add_argument("--fiqa_network", default="r100")
    ap.add_argument(
        "--data_parallel", type=int, default=0, metavar="N",
        help="generate over an N-device data-parallel mesh (prompt batch "
             "sharded over 'data', params/LoRAs replicated once; batch_size "
             "must divide N)",
    )
    ap.add_argument(
        "--pack_variants", action="store_true",
        help="pack all model variants' prompts into shared fixed-shape "
             "batches with per-sample LoRA adapters (fewer, fuller UNet "
             "batches at the 3-variant x 21-prompt reference op point; "
             "cross-variant noise identity preserved per prompt)",
    )
    ap.add_argument(
        "--deepcache", type=int, default=1, metavar="K",
        help="OPT-IN DeepCache approximation: full UNet every K-th denoise "
             "step, shallow-blocks + cached-deep-feature splice otherwise "
             "(1 = exact)",
    )
    ap.add_argument("--deepcache_depth", type=int, default=1)
    ap.add_argument(
        "--tome", type=float, default=0.0, metavar="RATIO",
        help="OPT-IN ToMe token merging before >=4096-token UNet "
             "self-attention (0.0 = exact; composable with --deepcache)",
    )
    ap.add_argument(
        "--cfg_interval", default=None, metavar="I0:I1",
        help="OPT-IN guidance interval (arXiv:2404.07724): apply CFG only "
             "at step indices [I0, I1); cond-only half-batch UNet outside",
    )
    ap.add_argument(
        "--quantize", default=None, choices=["w8a8", "w8a8+vae"],
        help="OPT-IN int8 UNet weights+activations (ops/quant.py): "
             "matmuls/convs run int8 on the MXU (2x bf16 rate on v5e); "
             "LoRA adapters still apply in bf16",
    )
    ap.add_argument(
        "--quant_calibrate", type=int, default=0, metavar="STEPS",
        help="with --quantize: freeze STATIC per-tensor activation scales "
             "from an eager STEPS-step calibration denoise "
             "(pipe.calibrate_quant) — removes the dynamic amax passes",
    )
    ap.add_argument(
        "--preset", default=None, metavar="NAME",
        help="named, quality-gated acceleration stack (pipelines/presets.py: "
             "'turbo' throughput / 'latency' batch-1) — sets scheduler, "
             "steps, and the turbo knobs to the measured champion values; "
             "mutually exclusive with the individual turbo flags",
    )
    args = ap.parse_args(argv)

    from .pipelines import StableDiffusionPipeline
    from .pipelines.sweep import run_sweep

    preset = None
    if args.preset:
        from .pipelines.presets import get_preset

        preset = get_preset(args.preset)
        _reject_preset_conflicts(
            ap, args,
            dict(deepcache=1, tome=0.0, cfg_interval=None, quantize=None,
                 quant_calibrate=0, steps=30),
        )

    pipe = StableDiffusionPipeline.from_pretrained(args.model_dir)
    if preset is not None:
        sample_kw = preset.apply(pipe)
        args.steps = preset.steps
        args.deepcache = sample_kw.get("deepcache_interval", 1)
        args.deepcache_depth = sample_kw.get("deepcache_depth", 1)
        civ = sample_kw.get("cfg_interval")
        args.cfg_interval = f"{civ[0]}:{civ[1]}" if civ else None
    else:
        pipe.set_scheduler("ddpm")
    if args.quantize:
        pipe.quantize(args.quantize)
        if args.quant_calibrate:
            pipe.calibrate_quant(
                ["face portrait photo of sks person"], steps=args.quant_calibrate
            )
    if args.data_parallel:
        import jax

        from .core.mesh import make_mesh

        if args.batch_size % args.data_parallel != 0:
            ap.error(f"--batch_size {args.batch_size} must divide "
                     f"--data_parallel {args.data_parallel}")
        pipe.to_mesh(make_mesh(devices=jax.devices()[: args.data_parallel]))

    on_images = None
    finish_eval = None
    if args.eval:
        import jax
        import jax.numpy as jnp
        import numpy as np

        from .evaluation import fiqa, pose
        from .models import iresnet

        fcfg = iresnet.config_for(args.fiqa_network)
        if args.fiqa_weights:
            from .bridge.torch_weights import convert_iresnet_state_dict, load_torch_pth

            sd = load_torch_pth(args.fiqa_weights)
            fparams, fstate = convert_iresnet_state_dict(sd, fcfg)
            qs = fiqa.convert_qs_from_state_dict(sd)
        else:
            fparams, fstate = iresnet.init(jax.random.key(0), fcfg)
            qs = fiqa.init_qs_head(jax.random.key(1))
        quality_fn_u8 = fiqa.make_quality_fn_u8(fparams, fstate, qs, fcfg)
        pose_fn_u8 = pose.make_pose_fn_u8(pose.init_sixdrepnet(jax.random.key(2)))

        dev_evals, names, idents = [], [], []

        def on_images(model_name, identity, batch_names, dev_imgs):
            _, q = quality_fn_u8(dev_imgs)
            dev_evals.append(jnp.concatenate([pose_fn_u8(dev_imgs), q[:, None]], axis=1))
            for n in batch_names:
                if n is None:  # packed-mode pad slot: keep row alignment
                    names.append(None)
                    idents.append(None)
                elif model_name is None:  # packed: n is "<model>/<file>"
                    m, f = n.split("/", 1)
                    names.append(f"{m}/{identity}/{f}")
                    idents.append(f"{m}/{identity}")
                else:
                    names.append(f"{model_name}/{identity}/{n}")
                    idents.append(f"{model_name}/{identity}")

        def finish_eval():
            evals = np.asarray(jnp.concatenate(dev_evals)) if dev_evals else np.zeros((0, 4))
            eval_dir = os.path.join(args.output, "eval")
            os.makedirs(eval_dir, exist_ok=True)
            n_real = 0
            with open(os.path.join(eval_dir, "fiqa_scores.txt"), "w") as f:
                for n, s in zip(names, evals[:, 3]):
                    if n is not None:
                        f.write(f"{n} {float(s)}\n")
                        n_real += 1
            per_id = {}
            for ident, p in zip(idents, evals[:, :3]):
                if ident is not None:
                    per_id.setdefault(ident, []).append([float(v) for v in p])
            pose.aggregate_poses(per_id, os.path.join(eval_dir, "pose_stats.json"))
            print(json.dumps({"eval": eval_dir, "images": n_real}))

    run_sweep(
        pipe, args.lora_root, args.output,
        gender_dict_path=args.gender_dict, checkpoint=args.checkpoint,
        num_prompts=args.num_prompts, num_inference_steps=args.steps,
        guidance_scale=args.guidance, batch_size=args.batch_size, seed=args.seed,
        on_images=on_images, pack_variants=args.pack_variants,
        deepcache_interval=args.deepcache, deepcache_depth=args.deepcache_depth,
        tome_ratio=args.tome, cfg_interval=_parse_interval(args.cfg_interval),
    )
    if finish_eval is not None:
        finish_eval()


def cmd_extract_embeds(argv):
    ap = argparse.ArgumentParser(prog="extract-embeds")
    ap.add_argument("--images_root", required=True)
    ap.add_argument("--output_root", required=True)
    ap.add_argument("--arcface_weights", default=None)
    ap.add_argument("--mtcnn_weights", default=None)
    ap.add_argument("--streaming", action="store_true",
                    help="pipelined path: native JPEG decode → batched detect → "
                         "device crop+embed in ONE program (uniform-size datasets)")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument(
        "--quantize", default=None, choices=["w8a8"],
        help="OPT-IN int8 IResNet body (ops/quant.py; stem/SE/fc stay bf16)",
    )
    ap.add_argument(
        "--quant_calibrate", type=int, default=0, metavar="BATCHES",
        help="with --quantize: freeze STATIC activation scales from eager "
             "forwards over BATCHES random-crop calibration batches "
             "(+36%% over dynamic int8 on v5e, perf/r3ao_queue.jsonl)",
    )
    args = ap.parse_args(argv)

    import jax

    from .models import iresnet, mtcnn
    from .pipelines.embed_extract import (
        calibrate_embed_quant,
        extract_embeddings_streaming,
        extract_folder_embeddings,
        make_arcface_embed_fn,
        make_crop_embed_fn,
    )

    if args.arcface_weights:
        from .bridge.torch_weights import convert_iresnet_state_dict, load_torch_pth

        params, state = convert_iresnet_state_dict(load_torch_pth(args.arcface_weights))
    else:
        params, state = iresnet.init(jax.random.key(0), iresnet.IResNetConfig())
    if args.quantize:
        from .ops.quant import quantize_iresnet

        params = quantize_iresnet(params)
        if args.quant_calibrate:
            # ArcFace inputs are (x/255 - .5)/.5 ∈ [-1,1]; BN-stabilized
            # internals make the scales data-insensitive, so uniform-noise
            # calibration batches are serviceable without touching the
            # dataset (pass real crops via calibrate_embed_quant for the
            # by-the-book version)
            cal = [
                jax.random.uniform(
                    jax.random.key(1000 + i), (32, 112, 112, 3),
                    minval=-1.0, maxval=1.0,
                )
                for i in range(args.quant_calibrate)
            ]
            params = calibrate_embed_quant(params, state, cal)
    detector = None
    if args.mtcnn_weights:
        from .bridge.torch_weights import load_torch_pth

        detector = mtcnn.MTCNN(mtcnn.convert_mtcnn_state_dict(load_torch_pth(args.mtcnn_weights)))
    if args.streaming:
        crop_embed = make_crop_embed_fn(params, state)
        report = extract_embeddings_streaming(
            args.images_root, args.output_root, crop_embed, detector,
            batch_size=args.batch_size,
        )
    else:
        embed_fn = make_arcface_embed_fn(params, state)
        report = extract_folder_embeddings(
            args.images_root, args.output_root, embed_fn, detector
        )
    print(json.dumps({"missing": len(report["files_without_faces"])}))


def cmd_align_crop(argv):
    ap = argparse.ArgumentParser(prog="align-crop")
    ap.add_argument("--input_root", required=True)
    ap.add_argument("--output_root", required=True)
    ap.add_argument("--mtcnn_weights", default=None)
    args = ap.parse_args(argv)

    from .data.align_driver import align_dataset_sweep
    from .models import mtcnn

    params = None
    if args.mtcnn_weights:
        from .bridge.torch_weights import load_torch_pth

        params = mtcnn.convert_mtcnn_state_dict(load_torch_pth(args.mtcnn_weights))
    detector = mtcnn.MTCNN(params)
    reports = align_dataset_sweep(args.input_root, args.output_root, detector)
    print(json.dumps({m: len(r["missing_images"]) for m, r in reports.items()}))


def cmd_train_fr(argv):
    ap = argparse.ArgumentParser(prog="train-fr")
    ap.add_argument("--dataset_root", required=True, help="flat `<label>_<img>` dir")
    ap.add_argument("--output", default="FR_runs")
    ap.add_argument("--network", default="iresnet50")
    ap.add_argument("--loss", default="AdaFace")
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--num_epochs", type=int, default=200)
    ap.add_argument("--augment", default="hf")
    ap.add_argument("--val_bin", action="append", default=[], help="name=path.bin")
    args = ap.parse_args(argv)

    from .core.dist import maybe_init_from_env

    maybe_init_from_env()  # multi-host launch opt-in via FPG_* env (no-op otherwise)

    from .data.augment import get_aug_policy
    from .data.fr_dataset import FlatDirDataset
    from .evaluation import verification
    from .training import fr, fr_driver

    cfg = fr.FRConfig(
        network=args.network, loss=args.loss, batch_size=args.batch_size,
        num_epochs=args.num_epochs,
    )
    dataset = FlatDirDataset(args.dataset_root, augment=get_aug_policy(args.augment))
    bins = {}
    for spec in args.val_bin:
        name, path = spec.split("=", 1)
        bins[name] = verification.load_bin(path)
    res = fr_driver.train_fr_run(cfg, dataset, args.output, val_bins=bins or None)
    print(json.dumps({"best_acc": res.get("best_acc")}))


def cmd_test_fr(argv):
    ap = argparse.ArgumentParser(prog="test-fr")
    ap.add_argument("--backbone", required=True)
    ap.add_argument("--network", default="iresnet50")
    ap.add_argument("--num_classes", type=int, required=True)
    ap.add_argument("--output_json", default="test_FR_results.json")
    ap.add_argument("--val_bin", action="append", default=[], required=False)
    args = ap.parse_args(argv)

    from .evaluation import verification
    from .training import fr, fr_driver

    cfg = fr.FRConfig(network=args.network, num_classes=args.num_classes)
    bins = {}
    for spec in args.val_bin:
        name, path = spec.split("=", 1)
        bins[name] = verification.load_bin(path)
    res = fr_driver.test_fr_run(cfg, args.backbone, bins, args.output_json)
    print(json.dumps(res))


def cmd_dgm_eval(argv):
    from .evaluation.dgm import main as dgm_main

    dgm_main(argv)


def cmd_pyeer(argv):
    ap = argparse.ArgumentParser(prog="pyeer")
    ap.add_argument("--synth_embeds_dir", required=True, help="dir of <id>_<img>.npy")
    ap.add_argument("--real_embeds_dir", default=None)
    ap.add_argument("--output", default="pyeer_out")
    ap.add_argument("--name", default="run")
    ap.add_argument("--min_samples", type=int, default=8)
    ap.add_argument("--skip_among", type=int, default=18)
    ap.add_argument("--skip_vs_real", type=int, default=17)
    args = ap.parse_args(argv)

    import numpy as np

    from .evaluation.pyeer_driver import analyse_from_embedding_files

    def load_dir(d):
        names, embs = [], []
        for f in sorted(os.listdir(d)):
            if f.endswith(".npy"):
                names.append(os.path.splitext(f)[0])
                embs.append(np.load(os.path.join(d, f)))
        return np.stack(embs), names

    synth, snames = load_dir(args.synth_embeds_dir)
    real, rnames = (None, None)
    if args.real_embeds_dir:
        real, rnames = load_dir(args.real_embeds_dir)
    res = analyse_from_embedding_files(
        synth, snames, real, rnames, output_dir=args.output, name=args.name,
        min_samples=args.min_samples, skip_among=args.skip_among,
        skip_vs_real=args.skip_vs_real,
    )
    if not res:
        print(
            f"warning: no score pairs produced — every identity may have fewer "
            f"than --min_samples={args.min_samples} embeddings",
            file=sys.stderr,
        )
    print(json.dumps(res, indent=2))


def cmd_analyze(argv):
    """Dataset-distribution / training-log analysis
    (`Evaluation/PyEER_analysis/analysis_scripts/` live parts:
    `analyse_dataset.py` gen/imp distribution + `plot_distributions.py`
    histogram + `plot_logs.py` curves). One of:
      --embeds_dir: per-identity embeddings → genuine/impostor score split
        (reference sampling convention), full EER stats JSON, score .npz,
        histogram PNG with the EER-threshold line;
      --logs: a core.trackers scalars.jsonl → per-metric curve PNGs."""
    ap = argparse.ArgumentParser(prog="analyze")
    ap.add_argument("--embeds_dir", default=None,
                    help="per-id .npy arrays, per-id subdirs, or flat <id>_<img>.npy")
    ap.add_argument("--logs", default=None, help="scalars.jsonl from core.trackers")
    ap.add_argument("--metric", action="append", default=[],
                    help="with --logs: metric to plot (repeatable; default all)")
    ap.add_argument("--output", default="analysis_out")
    ap.add_argument("--name", default="dataset")
    ap.add_argument("--num_ids", type=int, default=0, help="0 = all")
    ap.add_argument("--num_imgs", type=int, default=0, help="per id; 0 = all")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    if not (args.embeds_dir or args.logs):
        ap.error("pass --embeds_dir and/or --logs")

    from .evaluation.analysis import dataset_distribution_report, plot_training_logs

    out = {}
    if args.embeds_dir:
        out["distribution"] = dataset_distribution_report(
            args.embeds_dir, args.output, name=args.name,
            num_ids=args.num_ids, num_imgs=args.num_imgs, seed=args.seed,
        )
    if args.logs:
        out["logs"] = plot_training_logs(
            args.logs, args.output, metrics=args.metric or None, name=args.name
        )
    print(json.dumps(out, indent=2))


def cmd_fiqa(argv):
    ap = argparse.ArgumentParser(prog="fiqa")
    ap.add_argument("--image_dir", required=True)
    ap.add_argument("--output", default="fiqa_scores.txt")
    ap.add_argument("--weights", default=None, help="CR-FIQA checkpoint (.pth)")
    ap.add_argument("--network", default="r100")
    args = ap.parse_args(argv)

    import jax

    from .evaluation import fiqa
    from .models import iresnet

    cfg = iresnet.config_for(args.network)
    if args.weights:
        from .bridge.torch_weights import convert_iresnet_state_dict, load_torch_pth

        sd = load_torch_pth(args.weights)
        params, state = convert_iresnet_state_dict(sd, cfg)
        qs = fiqa.convert_qs_from_state_dict(sd)
    else:
        params, state = iresnet.init(jax.random.key(0), cfg)
        qs = fiqa.init_qs_head(jax.random.key(1))
    fn = fiqa.make_quality_fn(params, state, qs, cfg)
    scores = fiqa.score_dataset(args.image_dir, fn, args.output)
    print(json.dumps({"scored": len(scores)}))


def cmd_pose(argv):
    ap = argparse.ArgumentParser(prog="pose")
    ap.add_argument("--image_root", required=True)
    ap.add_argument("--output_json", default="poses.json")
    args = ap.parse_args(argv)

    import jax

    from .evaluation import pose

    params = pose.init_sixdrepnet(jax.random.key(0))
    fn = pose.make_pose_fn(params)
    res = pose.estimate_dataset_poses(args.image_root, fn, args.output_json)
    print(json.dumps(res["global"]))


def cmd_parity(argv):
    """Real-checkpoint step-parity runbook (docs/PARITY.md): given a local
    diffusers-format SD directory, run the fp32 CFG denoising loop in JAX
    (PARITY_POLICY, injected noise) and in an independent torch mirror
    (`bridge/torch_mirror.py`, loading the SAME safetensors), compare ε̂ at
    EVERY denoising step plus the final VAE decode, and write a verdict
    JSON. Executable the day weights exist; smoke-tested on random tiny
    checkpoints in tests/test_parity_cli.py."""
    ap = argparse.ArgumentParser(prog="parity")
    ap.add_argument("--model_dir", default=None, help="diffusers-format SD dir (CLIP/UNet/VAE leg)")
    ap.add_argument("--arcface_pth", default=None, help="ArcFace iresnet .pth (identity-stack leg)")
    ap.add_argument("--arcface_network", default="r100")
    ap.add_argument("--mtcnn", default=None,
                    help="facenet-pytorch MTCNN weights: dir with pnet.pt/rnet.pt/onet.pt "
                         "or one .pt with pnet./rnet./onet.-prefixed keys")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--prompt", default="face portrait photo of sks person")
    ap.add_argument("--negative_prompt", default="")
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--guidance_scale", type=float, default=5.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tolerance", type=float, default=5e-4)
    ap.add_argument(
        "--full_chain", action="store_true",
        help="additionally run the FULL-CHAIN per-step leg "
             "(bridge/full_chain.py): the real jitted sampler vs an "
             "all-torch CLIP→UNet→DDPM→VAE loop on identical noise — "
             "BASELINE.md's 'fp32 bit-comparable per denoising step' "
             "criterion over the whole chain (needs --model_dir)",
    )
    ap.add_argument(
        "--full_chain_tolerance", type=float, default=5e-3,
        help="latent max-abs bound for the full-chain leg (accumulates over "
             "steps across two execution orders; per-step bound at step 0 "
             "is --tolerance)",
    )
    ap.add_argument("--output", default="parity_verdict.json")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from .bridge.torch_mirror import TUNet, TVAE
    from .bridge.torch_weights import configs_from_model_dir, load_sd21_params, load_safetensors, load_torch_pth
    from .core.precision import PARITY_POLICY
    from .data.tokenizer import CLIPTokenizer
    from .diffusion import make_ddpm
    from .models import clip_text, unet2d, vae

    if not (args.model_dir or args.arcface_pth or args.mtcnn):
        ap.error("give at least one of --model_dir / --arcface_pth / --mtcnn")

    verdict = {"tolerance": args.tolerance}
    leg_passes = []

    # -- identity-stack legs (VERDICT r2 #8) --------------------------------

    if args.arcface_pth:
        # `prepare_locked_ArcFace_model` (`ArcFace_files/ArcFace_functions.py:27-36`)
        from .bridge.torch_weights import convert_iresnet_state_dict
        from .models import iresnet

        raw = load_torch_pth(args.arcface_pth)
        for container in ("state_dict", "backbone", "model"):
            if container in raw and isinstance(raw[container], dict):
                raw = raw[container]
        acfg = iresnet.config_for(args.arcface_network)
        jp, js = convert_iresnet_state_dict(raw, acfg)
        rng = np.random.default_rng(args.seed)
        x = rng.uniform(-1, 1, (4, 112, 112, 3)).astype(np.float32)
        emb, _ = iresnet.apply(jp, js, jnp.asarray(x), acfg, policy=PARITY_POLICY, train=False)
        emb = np.asarray(emb)
        leg = {"pth": args.arcface_pth, "network": args.arcface_network,
               "embed_finite": bool(np.isfinite(emb).all())}
        # oracle: the reference implementation itself, loading the SAME .pth
        try:
            import sys as _sys

            if "/root/reference" not in _sys.path:
                _sys.path.insert(0, "/root/reference")
            from ArcFace_files.backbones import iresnet as torch_iresnet

            tm = getattr(torch_iresnet, f"iresnet{args.arcface_network.lstrip('r')}")(
                num_features=acfg.num_features
            ).eval()
            tm.load_state_dict({k: torch.from_numpy(np.asarray(v)).float() for k, v in raw.items()})
            with torch.no_grad():
                emb_t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2).copy())).numpy()
            leg["embed_max_abs"] = float(np.max(np.abs(emb - emb_t)))
            # relative: random-init checkpoints produce huge-magnitude
            # embeddings where fp32 reduction noise scales with the values
            leg["embed_rel"] = float(
                leg["embed_max_abs"] / max(float(np.max(np.abs(emb_t))), 1e-6)
            )
            leg["pass"] = bool(
                leg["embed_finite"]
                and (leg["embed_max_abs"] < 1e-2 or leg["embed_rel"] < 1e-3)
            )
            leg_passes.append(leg["pass"])
        except ImportError as e:  # deployment without the reference tree
            leg["oracle"] = f"unavailable ({e}); conversion smoke only"
            leg_passes.append(leg["embed_finite"])
        verdict["arcface"] = leg

    if args.mtcnn:
        from .bridge.torch_mirror import TONet, TPNet, TRNet
        from .models import mtcnn as mtcnn_mod

        if os.path.isdir(args.mtcnn):
            sd = {}
            for net in ("pnet", "rnet", "onet"):
                raw = load_torch_pth(os.path.join(args.mtcnn, f"{net}.pt"))
                sd.update({f"{net}.{k}": v for k, v in raw.items()})
        else:
            sd = load_torch_pth(args.mtcnn)
        params = mtcnn_mod.convert_mtcnn_state_dict(sd)
        rng = np.random.default_rng(args.seed)
        diffs = {}

        def _sub(prefix):
            return {k[len(prefix) + 1:]: torch.from_numpy(np.asarray(v)).float()
                    for k, v in sd.items() if k.startswith(prefix + ".")}

        xp = rng.uniform(-1, 1, (2, 64, 80, 3)).astype(np.float32)
        pp, pr = mtcnn_mod.pnet_apply(params["pnet"], jnp.asarray(xp))
        tp = TPNet().eval(); tp.load_state_dict(_sub("pnet"))
        with torch.no_grad():
            tpp, tprg = tp(torch.from_numpy(xp.transpose(0, 3, 1, 2).copy()))
        diffs["pnet_prob"] = float(np.max(np.abs(np.asarray(pp) - tpp.numpy())))
        diffs["pnet_reg"] = float(
            np.max(np.abs(np.asarray(pr) - tprg.permute(0, 2, 3, 1).numpy()))
        )

        xr = rng.uniform(-1, 1, (3, 24, 24, 3)).astype(np.float32)
        rp, rr = mtcnn_mod.rnet_apply(params["rnet"], jnp.asarray(xr))
        tr = TRNet().eval(); tr.load_state_dict(_sub("rnet"))
        with torch.no_grad():
            trp, trrg = tr(torch.from_numpy(xr.transpose(0, 3, 1, 2).copy()))
        diffs["rnet_prob"] = float(np.max(np.abs(np.asarray(rp) - trp.numpy())))
        diffs["rnet_reg"] = float(np.max(np.abs(np.asarray(rr) - trrg.numpy())))

        xo = rng.uniform(-1, 1, (3, 48, 48, 3)).astype(np.float32)
        op_, orr, olm = mtcnn_mod.onet_apply(params["onet"], jnp.asarray(xo))
        to = TONet().eval(); to.load_state_dict(_sub("onet"))
        with torch.no_grad():
            top_, torg, tolm = to(torch.from_numpy(xo.transpose(0, 3, 1, 2).copy()))
        diffs["onet_prob"] = float(np.max(np.abs(np.asarray(op_) - top_.numpy())))
        diffs["onet_reg"] = float(np.max(np.abs(np.asarray(orr) - torg.numpy())))
        diffs["onet_lmk"] = float(np.max(np.abs(np.asarray(olm) - tolm.numpy())))

        # full-cascade smoke with the real weights (detections are
        # input-dependent; parity is certified at the net level, the cascade
        # logic by the golden-weights tests)
        det = mtcnn_mod.MTCNN(params=params)
        boxes, probs = det.detect(
            rng.uniform(0, 255, (160, 160, 3)).astype(np.float32)
        )
        ok = all(v < args.tolerance * 10 for v in diffs.values())
        verdict["mtcnn"] = {
            "weights": args.mtcnn, "net_max_abs": diffs,
            "cascade_detections": 0 if boxes is None else int(len(boxes)),
            "pass": bool(ok),
        }
        leg_passes.append(ok)

    if not args.model_dir:
        verdict["pass"] = bool(all(leg_passes))
        with open(args.output, "w") as f:
            json.dump(verdict, f, indent=2)
        print(json.dumps(verdict))
        return

    text_cfg, unet_cfg, vae_cfg = configs_from_model_dir(args.model_dir)
    params = load_sd21_params(args.model_dir)

    tok_dir = os.path.join(args.model_dir, "tokenizer")
    ids = None
    if os.path.exists(os.path.join(tok_dir, "vocab.json")):
        tok = CLIPTokenizer.from_pretrained(tok_dir)
        ids = jnp.asarray(tok([args.prompt]))
        neg = jnp.asarray(tok([args.negative_prompt]))
        if int(ids.max()) >= text_cfg.vocab_size:
            # mismatched tokenizer (e.g. a test checkpoint with a tiny text
            # encoder): JAX clamps out-of-range gathers but torch raises —
            # and the parity result would be meaningless either way
            ids = None
    if ids is None:  # tokenizer-less/mismatched checkpoints: deterministic ids
        rng = np.random.default_rng(args.seed)
        ids = jnp.asarray(rng.integers(0, text_cfg.vocab_size, (1, 77)))
        neg = jnp.zeros_like(ids)

    ctx = clip_text.apply(
        params["text_encoder"], jnp.concatenate([neg, ids]), text_cfg, policy=PARITY_POLICY
    )

    # torch mirrors loading the SAME weight files
    def _torch_sd(sub):
        d = os.path.join(args.model_dir, sub)
        for name in ("diffusion_pytorch_model.safetensors", "model.safetensors",
                     "diffusion_pytorch_model.bin", "pytorch_model.bin"):
            p = os.path.join(d, name)
            if os.path.exists(p):
                raw = load_safetensors(p) if p.endswith(".safetensors") else load_torch_pth(p)
                return {k: torch.from_numpy(np.asarray(v)).float() for k, v in raw.items()}
        raise FileNotFoundError(d)

    tm_unet = TUNet(unet_cfg).eval()
    missing, unexpected = tm_unet.load_state_dict(_torch_sd("unet"), strict=False)
    tm_vae = TVAE(vae_cfg).eval()
    mv, uv = tm_vae.load_state_dict(_torch_sd("vae"), strict=False)

    sched = make_ddpm(num_inference_steps=args.steps)
    h = w = args.resolution // 8
    rng = np.random.default_rng(args.seed)
    x = jnp.asarray(rng.standard_normal((1, h, w, 4)), jnp.float32)
    ctx_t = torch.from_numpy(np.asarray(ctx))

    eps_max = []
    for i in range(args.steps):
        t = sched.timesteps[i]
        lat = jnp.concatenate([x, x])
        eps = unet2d.apply(
            params["unet"], lat, jnp.broadcast_to(t, (2,)), ctx, unet_cfg,
            policy=PARITY_POLICY, attn_impl="reference",
        )
        with torch.no_grad():
            lat_t = torch.from_numpy(np.asarray(lat)).permute(0, 3, 1, 2).contiguous()
            eps_t = tm_unet(lat_t, torch.tensor([int(t)] * 2), ctx_t)
        eps_t = eps_t.permute(0, 2, 3, 1).numpy()
        eps_max.append(float(np.max(np.abs(np.asarray(eps) - eps_t))))
        eu, ec = jnp.split(eps, 2)
        guided = eu + args.guidance_scale * (ec - eu)
        noise = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
        x, _ = sched.step(guided, i, x, noise)

    img = vae.decode(params["vae"], x, vae_cfg, policy=PARITY_POLICY)
    with torch.no_grad():
        img_t = tm_vae.decode(torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2).contiguous())
    image_max = float(np.max(np.abs(np.asarray(img) - img_t.permute(0, 2, 3, 1).numpy())))

    diffusion_pass = bool(
        max(eps_max) < args.tolerance
        and image_max < args.tolerance
        and not missing
        and not mv
    )
    leg_passes.append(diffusion_pass)

    if args.full_chain:
        # the jitted sampler program vs an all-torch loop, per scheduler
        # step (VERDICT r3 #2; tests/test_full_chain_parity.py is the
        # tiny-weights version of exactly this leg)
        import transformers

        from .bridge.full_chain import compare_full_chain
        from .diffusion.sampler import SamplerModels

        te_dir = os.path.join(args.model_dir, "text_encoder")
        hf_cfg = transformers.CLIPTextConfig.from_json_file(
            os.path.join(te_dir, "config.json")
        )
        tm_text = transformers.CLIPTextModel(hf_cfg).eval()
        tmissing, _ = tm_text.load_state_dict(
            _torch_sd("text_encoder"), strict=False
        )

        def text_fn(ids_np):
            with torch.no_grad():
                return tm_text(torch.from_numpy(ids_np)).last_hidden_state.numpy()

        chain = compare_full_chain(
            params,
            SamplerModels(text_cfg=text_cfg, unet_cfg=unet_cfg,
                          vae_cfg=vae_cfg, attn_impl="reference"),
            text_fn, tm_unet, tm_vae,
            np.asarray(ids), np.asarray(neg),
            steps=args.steps, guidance_scale=args.guidance_scale,
            height=args.resolution, width=args.resolution, seed=args.seed,
        )
        chain["text_missing_keys"] = len(tmissing)
        chain["pass"] = bool(
            chain["latent_max_abs"] < args.full_chain_tolerance
            and chain["latent_max_abs_per_step"][0] < args.tolerance
            and chain["image_max_abs"] < args.full_chain_tolerance
            and not tmissing
        )
        verdict["full_chain"] = chain
        leg_passes.append(chain["pass"])

    verdict.update({
        "model_dir": args.model_dir,
        "steps": args.steps,
        "eps_max_abs_per_step": eps_max,
        "image_max_abs": image_max,
        "unet_missing_keys": len(missing),
        "unet_unexpected_keys": len(unexpected),
        "vae_missing_keys": len(mv),
        "vae_unexpected_keys": len(uv),
        "pass": bool(all(leg_passes)),
    })
    with open(args.output, "w") as f:
        json.dump(verdict, f, indent=2)
    print(json.dumps(verdict))


def cmd_parity_all(argv):
    """Day-one real-weights runbook (VERDICT r3 #9): ONE command that runs
    every parity leg + the preset quality reports off one weights directory
    and emits ONE verdict JSON. Layout under --weights_root (any subset;
    present pieces run, absent ones are listed as skipped):

        sd/            diffusers-format SD directory (CLIP/UNet/VAE +
                       full-chain per-step legs; tokenizer/ enables real
                       prompts)
        lora/          optional LoRA checkpoint dir for the quality reports
        arcface.pth    ArcFace iresnet weights (identity leg + the
                       accel-report identity-cosine rows)
        mtcnn/ | mtcnn.pt   facenet-pytorch MTCNN weights

    The quality gate: each preset's accel-report must clear --min_psnr /
    --min_identity_cos (identity rows need arcface.pth)."""
    ap = argparse.ArgumentParser(prog="parity-all")
    ap.add_argument("--weights_root", required=True)
    ap.add_argument("--output", default="parity_all_verdict.json")
    ap.add_argument("--steps", type=int, default=30,
                    help="denoise steps for the per-step parity legs")
    ap.add_argument("--report_steps", type=int, default=30,
                    help="exact-baseline steps for the preset quality "
                         "reports (the product op point; presets override "
                         "their own scheduler/steps via their mode spec)")
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--arcface_network", default="r100")
    ap.add_argument("--report_prompts", action="append", default=[],
                    help="accel-report prompts (default: one face portrait)")
    ap.add_argument("--min_psnr", type=float, default=None,
                    help="ABSOLUTE PSNR gate override (dB) for every preset. "
                         "Default: floor-relative per-preset gates — mean "
                         "PSNR >= seed_floor + Preset.gate_psnr_margin_db, "
                         "where seed_floor is the unrelated-sample PSNR "
                         "measured on THESE weights (exact seed vs seed+1)")
    ap.add_argument("--min_identity_cos", type=float, default=None,
                    help="ArcFace-cosine gate override for every preset "
                         "(default: Preset.gate_min_identity_cos, 0.90)")
    args = ap.parse_args(argv)

    import tempfile

    root = args.weights_root
    sd_dir = os.path.join(root, "sd")
    lora_dir = os.path.join(root, "lora")
    arcface = os.path.join(root, "arcface.pth")
    mtcnn = next(
        (p for p in (os.path.join(root, "mtcnn"), os.path.join(root, "mtcnn.pt"))
         if os.path.exists(p)), None,
    )
    verdict = {"weights_root": root, "skipped": [], "legs": {}}
    passes = []

    parity_args = ["--steps", str(args.steps), "--resolution", str(args.resolution)]
    if os.path.isdir(sd_dir):
        parity_args += ["--model_dir", sd_dir, "--full_chain"]
    else:
        verdict["skipped"].append("sd (no sd/ dir)")
    if os.path.exists(arcface):
        parity_args += ["--arcface_pth", arcface,
                        "--arcface_network", args.arcface_network]
    else:
        verdict["skipped"].append("arcface (no arcface.pth)")
    if mtcnn:
        parity_args += ["--mtcnn", mtcnn]
    else:
        verdict["skipped"].append("mtcnn (no mtcnn/ or mtcnn.pt)")

    with tempfile.TemporaryDirectory() as td:
        if len(parity_args) > 2:
            out = os.path.join(td, "parity.json")
            cmd_parity(parity_args + ["--output", out])
            leg = json.load(open(out))
            verdict["legs"]["parity"] = leg
            passes.append(leg["pass"])

        if os.path.isdir(sd_dir):
            # quality gate: every shipped preset measured on THESE weights
            from .pipelines.presets import PRESETS

            rep_args = ["--model_dir", sd_dir, "--steps", str(args.report_steps),
                        "--height", str(args.resolution),
                        "--width", str(args.resolution)]
            for name in sorted(PRESETS):
                rep_args += ["--preset", name]
            if os.path.isdir(lora_dir):
                rep_args += ["--lora_dir", lora_dir]
            if os.path.exists(arcface):
                rep_args += ["--arcface_pth", arcface,
                             "--arcface_network", args.arcface_network]
            for p in args.report_prompts:
                rep_args += ["--prompt", p]
            out = os.path.join(td, "report.json")
            cmd_accel_report(rep_args + ["--seed_floor", "--output", out])
            rep = json.load(open(out))
            floor = (rep.get("seed_floor") or {}).get("psnr_mean")
            gates = {}
            for name in sorted(PRESETS):
                preset = PRESETS[name]
                spec = preset.mode_spec()
                m = rep["modes"][spec]
                if args.min_psnr is not None:
                    thr = args.min_psnr  # explicit absolute override
                elif floor is not None:
                    # floor-relative: the gate the evidence supports — the
                    # preset must beat "a different image entirely" by its
                    # shipped margin, on WHATEVER weights this runs on
                    thr = floor + preset.gate_psnr_margin_db
                else:
                    thr = 25.0  # no floor measurable (shouldn't happen)
                ok = (m["psnr_mean"] is None  # bit-identical: trivially ok
                      or m["psnr_mean"] >= thr)
                cos_thr = (args.min_identity_cos
                           if args.min_identity_cos is not None
                           else preset.gate_min_identity_cos)
                if "identity_cos_mean" in m:
                    ok = ok and m["identity_cos_mean"] >= cos_thr
                gates[name] = {"mode": spec, "pass": bool(ok),
                               "psnr_mean": m["psnr_mean"],
                               "psnr_threshold": round(thr, 2),
                               "seed_floor_psnr": floor,
                               "identity_cos_mean": m.get("identity_cos_mean"),
                               "identity_cos_threshold": cos_thr}
                passes.append(bool(ok))
            verdict["legs"]["preset_quality"] = {"gates": gates, "report": rep}

    if not passes:
        raise SystemExit(f"nothing to run under {root} (see layout in --help)")
    verdict["pass"] = bool(all(passes))
    with open(args.output, "w") as f:
        json.dump(verdict, f, indent=2)
    print(json.dumps({k: v for k, v in verdict.items() if k != "legs"}
                     | {"legs": list(verdict["legs"])}))


def cmd_serve(argv):
    """Serving: fixed-shape batching HTTP server over the jitted sampler
    (see serving/engine.py). LoRA checkpoints are registered at startup as
    --lora name=path pairs and selected per request via lora_id."""
    ap = argparse.ArgumentParser(prog="serve")
    _add_common(ap)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--max_wait_ms", type=float, default=50.0)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--guidance", type=float, default=5.0)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--scheduler", choices=("ddpm", "dpm"), default="ddpm")
    ap.add_argument(
        "--lora", action="append", default=[], metavar="NAME=CKPT_DIR",
        help="register a LoRA checkpoint (repeatable)",
    )
    ap.add_argument(
        "--data_parallel", type=int, default=0, metavar="N",
        help="serve over an N-device data-parallel mesh (batch sharded over "
             "'data', params/LoRAs replicated); 0 = single device",
    )
    ap.add_argument("--max_queue", type=int, default=None)
    ap.add_argument("--request_timeout_s", type=float, default=None)
    ap.add_argument(
        "--multi_lora", action="store_true",
        help="heterogeneous batching: each request slot rides its own "
             "adapter (per-sample LoRA), so mixed-identity traffic packs "
             "full batches instead of fragmenting per LoRA",
    )
    ap.add_argument(
        "--rolling", action="store_true",
        help="continuous batching (serving/rolling.py): a persistent slot "
             "buffer where every request advances its own denoise step per "
             "tick — requests admit immediately instead of waiting for a "
             "whole-batch program boundary; implies per-slot adapters",
    )
    ap.add_argument(
        "--deepcache", type=int, default=1, metavar="K",
        help="OPT-IN DeepCache approximation: full UNet every K-th denoise "
             "step, shallow-blocks + cached-deep-feature splice otherwise "
             "(1 = exact)",
    )
    ap.add_argument("--deepcache_depth", type=int, default=1)
    ap.add_argument(
        "--tome", type=float, default=0.0, metavar="RATIO",
        help="OPT-IN ToMe token merging before >=4096-token UNet "
             "self-attention (0.0 = exact; composable with --deepcache)",
    )
    ap.add_argument(
        "--parallel_window", type=int, default=0, metavar="W",
        help="OPT-IN latency mode: parallel-in-time Picard sampling over a "
             "W-step window (diffusion/parallel_sampler.py; ddpm only). "
             "Meant for --batch_size 1; with --data_parallel the WINDOW "
             "shards over the mesh (more chips on one image)",
    )
    ap.add_argument("--parallel_tol", type=float, default=0.1)
    ap.add_argument(
        "--cfg_interval", default=None, metavar="I0:I1",
        help="OPT-IN guidance interval (arXiv:2404.07724): apply CFG only "
             "at step indices [I0, I1); cond-only half-batch UNet outside",
    )
    ap.add_argument(
        "--quantize", default=None, choices=["w8a8", "w8a8+vae"],
        help="OPT-IN int8 UNet weights+activations (ops/quant.py); "
             "registered LoRA adapters still apply in bf16",
    )
    ap.add_argument(
        "--quant_calibrate", type=int, default=0, metavar="STEPS",
        help="with --quantize: freeze STATIC per-tensor activation scales "
             "from an eager STEPS-step calibration denoise before serving",
    )
    ap.add_argument(
        "--quant_scales", default=None, metavar="FILE",
        help="with --quantize: attach saved static act scales from FILE "
             "(pipe.load_quant_scales); with --quant_calibrate, SAVE the "
             "freshly calibrated scales to FILE instead",
    )
    ap.add_argument(
        "--preset", default=None, metavar="NAME",
        help="named, quality-gated acceleration stack (pipelines/presets.py: "
             "'turbo' throughput / 'latency' batch-1) — sets scheduler, "
             "steps, and the turbo knobs to the measured champion values; "
             "mutually exclusive with the individual turbo flags and "
             "--rolling (rolling composes only with --quantize)",
    )
    args = ap.parse_args(argv)

    from .pipelines import StableDiffusionPipeline
    from .serving import SamplerServer
    from .serving.http_api import serve_http

    preset = None
    if args.preset:
        from .pipelines.presets import get_preset

        preset = get_preset(args.preset)
        if args.rolling:
            ap.error("--preset does not compose with --rolling (DeepCache "
                     "state is step-synchronized across slots; rolling "
                     "composes with --quantize and --scheduler dpm instead)")
        _reject_preset_conflicts(
            ap, args,
            dict(deepcache=1, tome=0.0, cfg_interval=None, quantize=None,
                 quant_calibrate=0, steps=30, scheduler="ddpm",
                 parallel_window=0),
        )

    mesh = None
    if args.data_parallel:
        import jax

        from .core.mesh import make_mesh

        mesh = make_mesh(devices=jax.devices()[: args.data_parallel])

    pipe = StableDiffusionPipeline.from_pretrained(args.model_dir)
    if preset is not None:
        sample_kw = preset.apply(pipe)
        args.scheduler = preset.scheduler
        args.steps = preset.steps
        args.deepcache = sample_kw.get("deepcache_interval", 1)
        args.deepcache_depth = sample_kw.get("deepcache_depth", 1)
        civ = sample_kw.get("cfg_interval")
        args.cfg_interval = f"{civ[0]}:{civ[1]}" if civ else None
    else:
        pipe.set_scheduler(args.scheduler)
    if args.quantize:
        pipe.quantize(args.quantize)
        if args.quant_calibrate:
            pipe.calibrate_quant(
                ["face portrait photo of sks person"], steps=args.quant_calibrate
            )
            if args.quant_scales:
                pipe.save_quant_scales(args.quant_scales)
        elif args.quant_scales:
            pipe.load_quant_scales(args.quant_scales)
    if args.rolling:
        from .serving import RollingServer

        server = RollingServer(
            pipe, batch_size=args.batch_size, max_wait_s=args.max_wait_ms / 1e3,
            num_inference_steps=args.steps, guidance_scale=args.guidance,
            height=args.size, width=args.size, scheduler=args.scheduler,
            mesh=mesh, max_queue=args.max_queue,
            request_timeout_s=args.request_timeout_s,
        )
    else:
        server = SamplerServer(
            pipe, batch_size=args.batch_size, max_wait_s=args.max_wait_ms / 1e3,
            num_inference_steps=args.steps, guidance_scale=args.guidance,
            height=args.size, width=args.size, scheduler=args.scheduler,
            mesh=mesh, max_queue=args.max_queue,
            request_timeout_s=args.request_timeout_s, multi_lora=args.multi_lora,
            deepcache_interval=args.deepcache, deepcache_depth=args.deepcache_depth,
            tome_ratio=args.tome,
            parallel_window=args.parallel_window, parallel_tolerance=args.parallel_tol,
            cfg_interval=_parse_interval(args.cfg_interval),
        )
    for spec in args.lora:
        name, _, path = spec.partition("=")
        if not path:
            raise SystemExit(f"--lora expects NAME=CKPT_DIR, got {spec!r}")
        server.register_lora(name, path)
    print(f"serving on http://{args.host}:{args.port} (batch {args.batch_size}, "
          f"{args.steps} steps, loras: {[s.split('=')[0] for s in args.lora] or '[]'})")
    serve_http(server, args.host, args.port)


def cmd_accel_report(argv):
    """Quality report for the opt-in acceleration modes on YOUR checkpoint:
    renders the same (prompt, seed) set exact and under each --mode spec,
    reports per-image PSNR + optional ArcFace identity cosine + the
    bit-identical fraction (evaluation/accel_report.py)."""
    ap = argparse.ArgumentParser(prog="accel-report")
    ap.add_argument("--model_dir", required=True)
    ap.add_argument("--lora_dir", default=None, help="optional LoRA checkpoint to load first")
    ap.add_argument(
        "--mode", action="append", default=[], metavar="SPEC",
        help="mode spec, repeatable: deepcache=3, tome=0.5, cfg_interval=5:20, "
             "quantize=w8a8, parallel=8:0.1, attn=flash_int8, scheduler=dpm:20, "
             "or compositions joined with '+' "
             "(e.g. deepcache=3+cfg_interval=5:20)",
    )
    ap.add_argument("--prompt", action="append", default=[],
                    help="prompt, repeatable (default: one face-portrait prompt)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--guidance", type=float, default=5.0)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--scheduler", default="ddpm", choices=["ddpm", "dpm"])
    ap.add_argument("--arcface_pth", default=None,
                    help="ArcFace .pth — enables the identity-cosine rows")
    ap.add_argument("--arcface_network", default="r100")
    ap.add_argument(
        "--preset", action="append", default=[], metavar="NAME",
        help="report a named preset (pipelines/presets.py) — expands to the "
             "mode spec measuring EXACTLY that stack (Preset.mode_spec()); "
             "repeatable, composable with --mode",
    )
    ap.add_argument(
        "--seed_floor", action="store_true",
        help="also report the unrelated-sample PSNR floor (exact at seed vs "
             "exact at seed+1) — the reference point mode PSNRs are read "
             "against; parity-all's floor-relative preset gates need it",
    )
    ap.add_argument("--output", default=None, help="write the report JSON here (also printed)")
    args = ap.parse_args(argv)
    if args.preset:
        from .pipelines.presets import get_preset

        args.mode.extend(get_preset(n).mode_spec() for n in args.preset)
    if not args.mode:
        ap.error("pass at least one --mode (or --preset)")

    from .evaluation.accel_report import compare_modes, make_embed_fn_u8
    from .pipelines import StableDiffusionPipeline

    pipe = StableDiffusionPipeline.from_pretrained(args.model_dir)
    pipe.set_scheduler(args.scheduler)
    if args.lora_dir:
        pipe.load_lora_weights(args.lora_dir)

    embed_fn = None
    if args.arcface_pth:
        from .bridge.torch_weights import convert_iresnet_state_dict, load_torch_pth
        from .models import iresnet

        raw = load_torch_pth(args.arcface_pth)
        for container in ("state_dict", "backbone", "model"):
            if container in raw and isinstance(raw[container], dict):
                raw = raw[container]
        cfg = iresnet.config_for(args.arcface_network)
        ap_, st_ = convert_iresnet_state_dict(raw, cfg)
        embed_fn = make_embed_fn_u8(ap_, st_, cfg)

    prompts = args.prompt or ["photo of a person, portrait, high quality"]
    report = compare_modes(
        pipe, args.mode, prompts=prompts, seed=args.seed,
        num_inference_steps=args.steps, guidance_scale=args.guidance,
        height=args.height, width=args.width, embed_fn=embed_fn,
        seed_floor=args.seed_floor,
    )
    out = json.dumps(report, indent=2)
    print(out)
    if args.output:
        with open(args.output, "w") as f:
            f.write(out)


def cmd_pod_rehearsal(argv):
    """Multi-process pod-launch rehearsal on the CPU backend — separate OS
    processes + jax.distributed coordinator, the real-pod topology (see
    parallel/pod_rehearsal.py). `cli pod-rehearsal --processes 2
    --local_devices 2` proves bring-up, the sharded ID-Booth train step,
    host-local loading, rank-0 checkpointing, and the DP sampler."""
    from .parallel.pod_rehearsal import main as pod_main

    rc = pod_main(argv)
    if rc:
        raise SystemExit(rc)


COMMANDS = {
    "parity": cmd_parity,
    "pod-rehearsal": cmd_pod_rehearsal,
    "parity-all": cmd_parity_all,
    "serve": cmd_serve,
    "train-idbooth": cmd_train_idbooth,
    "generate": cmd_generate,
    "extract-embeds": cmd_extract_embeds,
    "align-crop": cmd_align_crop,
    "train-fr": cmd_train_fr,
    "test-fr": cmd_test_fr,
    "dgm-eval": cmd_dgm_eval,
    "pyeer": cmd_pyeer,
    "analyze": cmd_analyze,
    "fiqa": cmd_fiqa,
    "pose": cmd_pose,
    "accel-report": cmd_accel_report,
}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        print("commands:", ", ".join(sorted(COMMANDS)))
        return 0
    cmd, rest = argv[0], argv[1:]
    if cmd not in COMMANDS:
        print(f"unknown command {cmd!r}; available: {', '.join(sorted(COMMANDS))}")
        return 2
    COMMANDS[cmd](rest)
    return 0


if __name__ == "__main__":
    sys.exit(main())
