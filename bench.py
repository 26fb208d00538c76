"""Benchmark: images/sec/chip for the flagship pipeline — 512×512 txt2img,
30-step DDPM + CFG 5.0, SD2.1 + rank-4 LoRA (the reference's inference
operating point, `inference_ID-Booth.py:47-50,138`; BASELINE.md north star
≥30 img/s/chip).

Runs on whatever chip `jax.devices()[0]` is (the driver runs it on real TPU).
Weights are randomly initialised — throughput is weight-agnostic. Prints ONE
JSON line: {"metric", "value", "unit", "vs_baseline"}.

Env knobs: BENCH_BATCH (default 16), BENCH_STEPS (default 30),
BENCH_REPEATS (default 3), BENCH_ATTN (auto|flash|reference),
BENCH_KIND (sample [default] | train | embed | sweep | serve | latency — the
BASELINE.md configs: txt2img sampling, ID-Booth LoRA fine-tune step, ArcFace
embed extraction, synthesis sweep + pose/FIQA eval harness, plus true batch-1
p50 latency with the optional parallel-in-time sampler BENCH_PARA_WINDOW),
BENCH_ABLATE (no_attn|no_xf|no_gn|no_vae time-attribution variants).
Opt-in turbo knobs (exact default untouched; all tagged in the metric):
BENCH_DEEPCACHE / BENCH_DEEPCACHE_DEPTH, BENCH_CFG_INTERVAL=i0:i1,
BENCH_TOME / BENCH_TOME_OPS, BENCH_QUANT=w8a8|w8a8+vae,
BENCH_QUANT_ACT=<float> (constant STATIC act scales — program-identical to
a calibrated tree), BENCH_SCHEDULER=ddpm|dpm (DPM-Solver++ few-step mode;
sampler, latency, and sweep benches), BENCH_PRESET=turbo|latency (named
quality-gated stack from pipelines/presets.py — expands to the knob envs
above; an explicitly-set knob env still wins).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache, scoped per host CPU type — a cross-machine
# CPU AOT entry can SIGILL the loading process (core/compile.py docstring).
from faceposegenerator_tpu.core.compile import machine_scoped_cache_dir

jax.config.update("jax_compilation_cache_dir", machine_scoped_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def apply_bench_preset(name: str):
    """Expand BENCH_PRESET into the individual knob envs (setdefault: an
    explicitly-set knob env overrides the preset's value). The preset's
    static-act-scale calibration maps to BENCH_QUANT_ACT=1.0 — constant
    scales are PROGRAM-IDENTICAL to a calibrated tree (same fused
    elementwise quantize, different constants), so throughput carries over;
    quality of the real calibrated scales is accel-report's job
    (`cli accel-report --preset`)."""
    from faceposegenerator_tpu.pipelines.presets import get_preset

    p = get_preset(name)
    env = {"BENCH_SCHEDULER": p.scheduler, "BENCH_STEPS": str(p.steps)}
    if p.deepcache_interval > 1:
        env["BENCH_DEEPCACHE"] = str(p.deepcache_interval)
        env["BENCH_DEEPCACHE_DEPTH"] = str(p.deepcache_depth)
    if p.cfg_interval is not None:
        env["BENCH_CFG_INTERVAL"] = f"{p.cfg_interval[0]}:{p.cfg_interval[1]}"
    if p.quantize:
        env["BENCH_QUANT"] = p.quantize
        if p.quant_calibrate_steps > 0:
            env["BENCH_QUANT_ACT"] = "1.0"
    for k, v in env.items():
        os.environ.setdefault(k, v)


# Chip-peak context so the driver's one JSON line is self-interpreting
# (VERDICT r3 #6): BASELINE.md's >=30 img/s north star is stated for v5p;
# on the v5e-lite chip the EXACT 30-step CFG bs8 program is bound at
# ~2.35 img/s by its own FLOPs (attribution: 8 imgs / (2.73 s non-attention
# + 0.67 s attention-at-matmul-floor), perf/r3n_ablate.jsonl) — a 0.07
# vs_baseline is ~87% of what this hardware can run on the exact path.
CHIP_PEAKS_BF16_TFLOPS = {"v5 lite": 197, "v5e": 197, "v5p": 459, "v4": 275, "v6": 918}
EXACT_BOUND_V5E_IMG_S = 2.35


def exact_path_context(value_img_s: float, is_exact_default: bool) -> dict:
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", str(dev))
    peak = next(
        (v for k, v in CHIP_PEAKS_BF16_TFLOPS.items() if k in kind.lower()), None
    )
    ctx = {"chip": kind, "bf16_peak_tflops": peak,
           "north_star_chip": "v5p (BASELINE.md states >=30 img/s for v5p-class hardware)"}
    if is_exact_default and peak == 197:
        ctx["exact_path_bound_img_s"] = EXACT_BOUND_V5E_IMG_S
        ctx["frac_of_exact_bound"] = round(value_img_s / EXACT_BOUND_V5E_IMG_S, 3)
        # the default line measures the EXACT path; the opt-in quality-gated
        # presets were measured separately (same chip, 5-repeat) — recorded
        # here so one JSON line carries the whole picture
        ctx["preset_turbo_measured_img_s"] = 10.117  # perf/r5a_queue.jsonl (dpm12xdc4 stack)
        ctx["preset_latency_measured_s_per_img"] = 0.262  # perf/r4i_queue.jsonl (dpm20 stack)
        ctx["presets"] = "BENCH_PRESET=turbo|latency re-measures (pipelines/presets.py)"
    return ctx


def bench_train(batch: int, repeats: int):
    """ID-Booth LoRA fine-tune step throughput (BASELINE config 4).

    Ablation knobs (train-step roofline attribution, VERDICT r1 #9):
      BENCH_LOSS   ""|identity|triplet_prior (default triplet_prior) — "";
                   drops the whole x̂0→decode→ArcFace identity branch
      BENCH_REMAT  1 turns on jax.checkpoint around UNet blocks
      BENCH_REMAT_ID 1 remats the identity branch (VAE-decode backward)
      BENCH_ID_CHUNK N runs the identity branch in sub-batches of N
      BENCH_ATTN   auto|flash|reference (threaded into the UNet)
    """
    from faceposegenerator_tpu.core.precision import Policy
    from faceposegenerator_tpu.models import clip_text, unet2d, vae, iresnet
    from faceposegenerator_tpu.training import idbooth

    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    which_loss = os.environ.get("BENCH_LOSS", "triplet_prior")
    remat = os.environ.get("BENCH_REMAT", "0") == "1"
    remat_id = os.environ.get("BENCH_REMAT_ID", "0") == "1"
    id_chunk = int(os.environ.get("BENCH_ID_CHUNK", "0")) or None
    attn = os.environ.get("BENCH_ATTN", "auto")  # flash w/ Pallas bwd (see ModelBundle.attn_impl)
    bundle = idbooth.ModelBundle(arcface_cfg=iresnet.config_for("r100"), attn_impl=attn)
    ap, ast = iresnet.init(jax.random.key(3), bundle.arcface_cfg)
    frozen = {
        "text_encoder": clip_text.init(jax.random.key(0), bundle.text_cfg, dtype=jnp.bfloat16),
        "unet": unet2d.init(jax.random.key(1), bundle.unet_cfg, dtype=jnp.bfloat16),
        "vae": vae.init(jax.random.key(2), bundle.vae_cfg, dtype=jnp.bfloat16),
        "arcface": {"params": ap, "state": ast},
    }
    cfg = idbooth.IDBoothConfig(
        which_loss=which_loss, train_batch_size=batch,
        gradient_checkpointing=remat, remat_identity=remat_id,
        identity_chunk=id_chunk,
    )
    trainable = idbooth.init_trainable(jax.random.key(4), cfg, bundle, frozen["unet"])
    import optax

    opt = idbooth.make_optimizer(cfg, total_steps=1000)
    opt_state = opt.init(trainable)

    def make_batch(seed):
        return {
            "pixel_values": jax.random.uniform(jax.random.key(seed), (2 * batch, 512, 512, 3), minval=-1, maxval=1),
            "input_ids": jax.random.randint(jax.random.key(seed + 1), (2 * batch, 77), 0, 49408),
            "gt_embeds": jax.random.normal(jax.random.key(seed + 2), (2 * batch, 512)),
        }

    # BENCH_VMAP_IDS=K: K identities' fine-tunes vmapped into one program
    # (training.multi_identity) — per-identity bs stays `batch`, the convs
    # see K× that, aggregate img/s is reported. K=1 is the classic path.
    vmap_ids = int(os.environ.get("BENCH_VMAP_IDS", "1"))
    if vmap_ids > 1:
        from faceposegenerator_tpu.training import multi_identity

        step = multi_identity.make_multi_train_step(
            cfg, bundle, opt, policy=policy, donate=False
        )
        trainable = multi_identity.stack_pytrees([trainable] * vmap_ids)
        opt_state = multi_identity.stack_pytrees([opt_state] * vmap_ids)
        batch_data = multi_identity.stack_pytrees(
            [make_batch(5 + 3 * i) for i in range(vmap_ids)]
        )
        keyify = lambda i: jnp.stack(
            [jax.random.key(1000 * k + i) for k in range(vmap_ids)]
        )
        fetch = lambda m: float(jnp.sum(m["loss"]))
    else:
        step = idbooth.make_train_step(cfg, bundle, opt, policy=policy, donate=False)
        batch_data = make_batch(5)
        keyify = jax.random.key
        fetch = lambda m: float(m["loss"])

    t2, o2, m = step(trainable, opt_state, frozen, batch_data, keyify(0))
    fetch(m)  # axon: block_until_ready can return early; force a host fetch
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        t2, o2, m = step(t2, o2, frozen, batch_data, keyify(i))
        fetch(m)
        times.append(time.perf_counter() - t0)
    best = min(times)
    imgs = batch * vmap_ids
    return {
        "metric": f"ID-Booth train imgs/sec/chip 512x512 loss={which_loss or 'mse'} bs{batch}(+prior)"
        + (" remat" if remat else "") + (" remat_id" if remat_id else "")
        + (f" id_chunk{id_chunk}" if id_chunk else "")
        + (f" vmap_ids{vmap_ids}" if vmap_ids > 1 else ""),
        "value": round(imgs / best, 3),
        "unit": "img/s",
        "vs_baseline": round(imgs / best, 3),
        "extra": {"step_s": round(best, 3), "device": str(jax.devices()[0])},
    }


def bench_sweep(repeats: int):
    """BASELINE config 5: multi-identity synthesis sweep + pose/CR-FIQA eval
    harness, end-to-end (prompt build → batched 30-step CFG generation →
    PNGs → CR-FIQA quality scoring → 6DRepNet pose stats). Random weights;
    one identity × one model variant × 8 prompts per timed pass."""
    import tempfile

    import numpy as np

    from faceposegenerator_tpu.core.precision import Policy
    from faceposegenerator_tpu.data.tokenizer import CLIPTokenizer, bytes_to_unicode
    from faceposegenerator_tpu.diffusion.sampler import SamplerModels
    from faceposegenerator_tpu.evaluation import fiqa, pose
    from faceposegenerator_tpu.models import iresnet
    from faceposegenerator_tpu.pipelines.sweep import run_sweep
    from faceposegenerator_tpu.pipelines.txt2img import StableDiffusionPipeline

    # byte-fallback tokenizer: every prompt tokenizes without real vocab files
    units = list(bytes_to_unicode().values())
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for u in units:
        vocab.setdefault(u, len(vocab))
        vocab.setdefault(u + "</w>", len(vocab))
    tok = CLIPTokenizer(vocab, [], model_max_length=77)

    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    models = SamplerModels(attn_impl=os.environ.get("BENCH_ATTN", "auto"))
    pipe = StableDiffusionPipeline.from_random(
        models=models, dtype=jnp.bfloat16, tokenizer=tok, policy=policy
    )
    qmode = os.environ.get("BENCH_QUANT", "")
    qact = os.environ.get("BENCH_QUANT_ACT", "")
    if qmode:
        # OPT-IN int8 UNet (ops/quant.py); QUANT tag below. BENCH_QUANT_ACT
        # stamps constant static act scales (perf probe for the calibrated
        # path — same program as calibrate_quant, different constants).
        pipe.quantize(qmode, act_scale=float(qact) if qact else None)
    # BENCH_SCHEDULER=dpm + BENCH_STEPS: DPM-Solver++ few-step sweep (the
    # scheduler is pipeline-level; run_sweep inherits pipe.scheduler_kind)
    sched_kind = os.environ.get("BENCH_SCHEDULER", "ddpm")
    sweep_steps = int(os.environ.get("BENCH_STEPS", "30"))
    pipe.set_scheduler(sched_kind)

    # eval harness models (random weights; throughput is weight-agnostic)
    fr_cfg = iresnet.config_for("r100")
    fp, fs = iresnet.init(jax.random.key(1), fr_cfg)
    qs = fiqa.init_qs_head(jax.random.key(2))
    quality_fn_u8 = fiqa.make_quality_fn_u8(fp, fs, qs, fr_cfg, policy=policy)
    pose_params = pose.init_sixdrepnet(jax.random.key(3))
    pose_fn_u8 = pose.make_pose_fn_u8(pose_params)

    n_prompts = int(os.environ.get("BENCH_SWEEP_PROMPTS", "8"))
    # Steady-state measurement: the reference op point is a sweep over MANY
    # identities × 3 model variants (`inference_ID-Booth.py:86-97`), not one
    # isolated batch. With >1 identity per timed pass, run_sweep's one-deep
    # pipeline hides each batch's host tail (u8 fetch + PNG + eval dispatch,
    # ~0.8 s) under generation of the next identity's batch; a single-batch
    # pass exposes the full tail (1.663 vs ~1.9 img/s at 8 prompts,
    # perf/r3b_sweep_steady.jsonl). BENCH_SWEEP_IDS=1 recovers the isolated
    # single-pass configuration.
    n_ids = int(os.environ.get("BENCH_SWEEP_IDS", "3"))
    # bs8 generation batches beat bs16 even within the sweep (1.915 vs
    # 1.817 at 16 prompts, perf/r3_final_benches.jsonl): bs8 is the raw
    # sampler optimum AND multi-batch passes overlap host work under
    # generation of the next batch
    gen_batch = int(os.environ.get("BENCH_SWEEP_BATCH", "0")) or min(n_prompts, 8)
    write_pngs = os.environ.get("BENCH_SWEEP_PNGS", "1") == "1"
    run_eval = os.environ.get("BENCH_SWEEP_EVAL", "1") == "1"  # attribution knob
    # BENCH_SWEEP_MODELS=V sweeps V model variants per identity (the
    # reference op point is 3, `inference_ID-Booth.py:97`; default 1 keeps
    # the historical metric). BENCH_SWEEP_PACK=1 packs all variants' prompts
    # into shared fixed-shape batches with per-sample adapters
    # (pipelines.sweep pack_variants) — at 3×21 that is 8 batches vs 9.
    n_models = int(os.environ.get("BENCH_SWEEP_MODELS", "1"))
    pack = os.environ.get("BENCH_SWEEP_PACK", "0") == "1"
    # turbo knobs thread through run_sweep (opt-in, reported in the tag)
    sweep_dc = int(os.environ.get("BENCH_DEEPCACHE", "1"))
    civ = os.environ.get("BENCH_CFG_INTERVAL", "")
    sweep_civ = tuple(int(v) for v in civ.split(":")) if civ else None
    from faceposegenerator_tpu.pipelines.sweep import MODEL_VARIANTS

    models_to_test = MODEL_VARIANTS[-n_models:]

    def one_pass(workdir):
        """Streaming harness (VERDICT r2 #1): FIQA/pose consume the sampler's
        in-memory device uint8 batches via the on_images hook — eval device
        work and PNG writes (thread pool) overlap generation of the next
        batch; no PNG re-read/re-decode round-trips. Device eval results are
        forced ONCE at the end."""
        lora_root = os.path.join(workdir, "lora")  # no checkpoints → base model
        out_root = os.path.join(workdir, "out")
        dev_evals, all_names, all_idents = [], [], []

        def harness(model_name, identity, names, dev_imgs):
            # pack (pose 3 + quality 1) into ONE device array per batch:
            # each device→host fetch over the axon tunnel costs ~25 ms RTT
            # (perf/xfer_micro_r3.py), so the whole pass fetches eval results
            # exactly once. Packed mode: model_name is None and names may
            # contain None pad slots — keep row alignment, filter at the end.
            _, q = quality_fn_u8(dev_imgs)
            dev_evals.append(jnp.concatenate([pose_fn_u8(dev_imgs), q[:, None]], axis=1))
            all_names.extend(names)
            all_idents.extend(
                [identity if n is not None else None for n in names]
            )

        run_sweep(
            pipe, lora_root, out_root,
            identities=[str(i) for i in range(n_ids)], models_to_test=models_to_test,
            num_prompts=n_prompts, num_inference_steps=sweep_steps,
            guidance_scale=5.0, batch_size=gen_batch, seed=0,
            on_images=harness if run_eval else None, write_pngs=write_pngs,
            pack_variants=pack,
            deepcache_interval=sweep_dc, cfg_interval=sweep_civ,
        )
        if not run_eval:
            return
        evals = np.asarray(jnp.concatenate(dev_evals))  # single fetch
        poses_np, scores = evals[:, :3], evals[:, 3]
        with open(os.path.join(workdir, "fiqa.txt"), "w") as f:
            for n, s in zip(all_names, scores):
                if n is not None:
                    f.write(f"{n} {float(s)}\n")
        per_id = {}
        for ident, p in zip(all_idents, poses_np):
            if ident is not None:
                per_id.setdefault(ident, []).append([float(v) for v in p])
        pose.aggregate_poses(per_id, os.path.join(workdir, "poses.json"))

    with tempfile.TemporaryDirectory() as wd:
        one_pass(wd)  # compile warmup
    times = []
    for _ in range(repeats):
        with tempfile.TemporaryDirectory() as wd:
            t0 = time.perf_counter()
            one_pass(wd)
            times.append(time.perf_counter() - t0)
    best = min(times)
    n_images = n_prompts * n_ids * n_models
    ids_tag = f" x {n_ids} identities" if n_ids != 1 else ""
    models_tag = f" x {n_models} variants" if n_models != 1 else ""
    pack_tag = ", packed" if pack else ""
    quant_tag = (f", QUANT={qmode}" + (f" ACT=static{qact}" if qact else "")) if qmode else ""
    if sweep_dc > 1:
        quant_tag += f", DEEPCACHE={sweep_dc}"
    if sweep_civ is not None:
        quant_tag += f", CFGIV={sweep_civ[0]}:{sweep_civ[1]}"
    sched_tag = f"{sweep_steps}-step CFG" if sched_kind == "ddpm" else f"{sweep_steps}-step DPM++ CFG"
    return {
        "metric": f"synthesis-sweep+eval imgs/sec/chip 512x512 ({n_prompts} prompts{ids_tag}{models_tag}{pack_tag}{quant_tag}, {sched_tag} + FIQA + pose)",
        "value": round(n_images / best, 3),
        "unit": "img/s",
        "vs_baseline": round(n_images / best / 30.0, 3),
        "extra": {"pass_s": round(best, 2), "n_images": n_images,
                  "device": str(jax.devices()[0])},
    }


def bench_embed(batch: int, repeats: int):
    """Batched ArcFace r100 embed extraction (BASELINE config 3)."""
    from faceposegenerator_tpu.core.precision import Policy
    from faceposegenerator_tpu.models import iresnet

    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    cfg = iresnet.config_for("r100")
    params, state = iresnet.init(jax.random.key(0), cfg)

    # BENCH_QUANT=w8a8: OPT-IN int8 body (ops/quant.py) — v5e MXU int8 runs
    # at 2x the bf16 rate; reported with a QUANT tag, never as the default.
    qmode = os.environ.get("BENCH_QUANT", "")
    qact = os.environ.get("BENCH_QUANT_ACT", "")
    if qmode:
        from faceposegenerator_tpu.ops.quant import quantize_iresnet

        params = quantize_iresnet(
            params, act_scale=float(qact) if qact else None
        )

    from faceposegenerator_tpu.core.compile import jit as _options_jit

    @_options_jit
    def embed(x):
        e, _ = iresnet.apply(params, state, x, cfg, policy=policy, train=False)
        return e

    x = jax.random.uniform(jax.random.key(1), (batch, 112, 112, 3), minval=-1, maxval=1)
    float(jnp.sum(embed(x)))  # axon: block_until_ready can return early
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(jnp.sum(embed(x)))
        times.append(time.perf_counter() - t0)
    best = min(times)
    return {
        "metric": f"ArcFace r100 embeds/sec/chip 112x112 bs{batch}"
        + (f" QUANT={qmode}" if qmode else "")
        + (f" ACT=static{qact}" if qmode and qact else ""),
        "value": round(batch / best, 1),
        "unit": "img/s",
        "vs_baseline": round(batch / best / 1000.0, 3),
        "extra": {"batch_s": round(best, 4), "device": str(jax.devices()[0])},
    }


def bench_embed_e2e(batch: int, repeats: int):
    """BASELINE config 3 measured END-TO-END (VERDICT r2 #3): the pipeline
    the reference ships (`extract_ArcFace_embeds.py:35-75`) — JPEG decode
    (native C++ thread-parallel) → batched MTCNN detect (shared pyramid,
    one device call per stage) → device crop+normalize+ArcFace-r100 embed
    (ONE jitted program) → per-image .npy writes. Synthetic bright-square
    faces make the hand-built cascade deterministic so every stage does the
    real pipeline's work. Also reports the host/device stage split."""
    import shutil
    import tempfile

    import numpy as np
    from PIL import Image

    from faceposegenerator_tpu.core.precision import Policy
    from faceposegenerator_tpu.models import iresnet, mtcnn
    from faceposegenerator_tpu.pipelines.embed_extract import (
        _decode_files_batch,
        extract_embeddings_streaming,
        make_crop_embed_fn,
    )

    n_images = int(os.environ.get("BENCH_E2E_IMAGES", str(8 * batch)))
    n_ids = 16
    res = 250
    rng = np.random.default_rng(0)

    workdir = tempfile.mkdtemp(prefix="embed_e2e_")
    try:
        src = os.path.join(workdir, "images")
        paths = []
        for i in range(n_images):
            ident = os.path.join(src, f"{i % n_ids}")
            os.makedirs(ident, exist_ok=True)
            img = rng.integers(10, 60, (res, res, 3)).astype(np.uint8)
            s = int(rng.integers(60, 120))
            y, x = rng.integers(10, res - s - 10, 2)
            img[y : y + s, x : x + s] = 255  # the "face"
            p = os.path.join(ident, f"{i:05d}.jpg")
            Image.fromarray(img).save(p, quality=92)
            paths.append(p)

        detector = mtcnn.MTCNN(params=mtcnn.brightness_cascade_params())
        policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
        cfg = iresnet.config_for("r100")
        params, state = iresnet.init(jax.random.key(0), cfg)
        crop_embed = make_crop_embed_fn(params, state, cfg, policy)

        from faceposegenerator_tpu import native as native_pkg

        native_mod = native_pkg.load()

        def one_pass(tag):
            out = os.path.join(workdir, f"out_{tag}")
            r = extract_embeddings_streaming(
                src, out, crop_embed, detector, batch_size=batch
            )
            assert len(r["files_without_faces"]) == 0, "cascade must fire on every image"

        one_pass("warmup")  # compiles detect-stage nets + the crop+embed program
        times = []
        for i in range(repeats):
            t0 = time.perf_counter()
            one_pass(f"run{i}")
            times.append(time.perf_counter() - t0)
        best = min(times)

        # stage attribution (one measured pass each, same batch shapes)
        chunk = paths[:batch]
        imgs = _decode_files_batch(chunk, native_mod, (res, res))
        t0 = time.perf_counter()
        for _ in range(3):
            _decode_files_batch(chunk, native_mod, (res, res))
        t_decode = (time.perf_counter() - t0) / 3
        t0 = time.perf_counter()
        for _ in range(3):
            detector.detect_batch(imgs)
        t_detect = (time.perf_counter() - t0) / 3
        boxes = np.tile(np.array([[60.0, 60.0, 180.0, 180.0]], np.float32), (batch, 1))
        float(jnp.sum(crop_embed(imgs, boxes)))
        t0 = time.perf_counter()
        for _ in range(3):
            float(jnp.sum(crop_embed(imgs, boxes)))
        t_embed = (time.perf_counter() - t0) / 3

        return {
            "metric": f"ArcFace embed pipeline E2E imgs/sec/chip (decode+MTCNN+crop+embed, bs{batch})",
            "value": round(n_images / best, 1),
            "unit": "img/s",
            "vs_baseline": round(n_images / best / 1000.0, 3),
            "extra": {
                "pass_s": round(best, 3),
                "n_images": n_images,
                "native_decoder": native_mod is not None,
                "stage_s_per_batch": {
                    "decode": round(t_decode, 4),
                    "detect": round(t_detect, 4),
                    "crop+embed": round(t_embed, 4),
                },
                "device": str(jax.devices()[0]),
            },
        }
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def apply_ablation(name: str):
    """Time-attribution ablations, expressed as monkeypatched variants of the
    known-good bench program (on-TPU profiling is unavailable on axon — see
    .claude/skills/verify/SKILL.md). Each variant removes ONE component while
    keeping shapes, dtype flow, and data dependence intact:
      no_attn — attention core (QKᵀ·softmax·V) → identity on q
      no_xf   — whole transformer blocks (attn + proj + GEGLU) → identity
      no_gn   — GroupNorm statistics → affine(+silu) only
      no_vae  — VAE decode → mean-dependent broadcast (keeps the loop live)
    """
    import jax.nn
    from faceposegenerator_tpu.models import unet2d, vae

    if name == "no_attn":
        def fake_attn(q, k, v, **kw):
            return q
        unet2d.dot_product_attention = fake_attn
    elif name == "no_xf":
        def fake_transformer(p, x, ctx, cfg, **kw):
            return x
        unet2d._transformer_apply = fake_transformer
    elif name == "no_gn":
        def fake_gn(x, gamma, beta, num_groups=32, eps=1e-5, act=None):
            out = x * gamma.astype(x.dtype) + beta.astype(x.dtype)
            return out * jax.nn.sigmoid(out) if act == "silu" else out
        unet2d.group_norm = fake_gn
    elif name == "no_vae":
        def fake_decode(params, z, cfg, policy=None, **kw):
            b, h, w, _ = z.shape
            return jnp.broadcast_to(jnp.mean(z), (b, h * 8, w * 8, 3))
        vae.decode = fake_decode
    else:
        raise ValueError(f"unknown ablation {name!r}")


def bench_fr(batch: int, repeats: int):
    """FR utility-training step throughput: iresnet50 + AdaFace at the
    reference operating point (bs128, 112², `FR_training/config/FR_config.py:32-56`).
    Not one of the five BASELINE configs — recorded for the downstream
    utility-training story (SURVEY.md L6)."""
    from faceposegenerator_tpu.core.precision import Policy
    from faceposegenerator_tpu.training import fr

    policy = Policy(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16)
    cfg = fr.FRConfig(network="iresnet50", loss="AdaFace", num_classes=1000, batch_size=batch)
    params, state = fr.init_train_state(jax.random.key(0), cfg)
    opt = fr.make_optimizer(cfg)
    opt_state = opt.init(params)
    step = fr.make_train_step(cfg, opt, policy=policy, donate=False)
    batch_data = {
        "images": jax.random.uniform(jax.random.key(1), (batch, 112, 112, 3), minval=-1, maxval=1),
        "labels": jax.random.randint(jax.random.key(2), (batch,), 0, cfg.num_classes),
    }
    p, s, o, m = step(params, state, opt_state, batch_data, jax.random.key(3))
    float(m["loss"])  # force host transfer (axon block_until_ready caveat)
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        p, s, o, m = step(p, s, o, batch_data, jax.random.key(4 + i))
        float(m["loss"])
        times.append(time.perf_counter() - t0)
    best = min(times)
    return {
        "metric": f"FR train imgs/sec/chip iresnet50+AdaFace 112x112 bs{batch}",
        "value": round(batch / best, 1),
        "unit": "img/s",
        "vs_baseline": round(batch / best / 1000.0, 3),
        "extra": {"step_s": round(best, 4), "device": str(jax.devices()[0])},
    }


def bench_serve(batch: int, steps: int, repeats: int):
    """Serving-engine throughput: concurrent requests through SamplerServer
    (batching + per-request noise + future dispatch overhead on top of the
    raw sampler). Mixed seeds and a LoRA hot-swap mid-stream — the
    production shape, one compiled program throughout."""
    from faceposegenerator_tpu.core.precision import Policy
    from faceposegenerator_tpu.data.tokenizer import CLIPTokenizer, bytes_to_unicode
    from faceposegenerator_tpu.diffusion.sampler import SamplerModels
    from faceposegenerator_tpu.pipelines.txt2img import StableDiffusionPipeline
    from faceposegenerator_tpu.serving import GenerationRequest, SamplerServer

    units = list(bytes_to_unicode().values())
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for u in units:
        vocab.setdefault(u, len(vocab))
        vocab.setdefault(u + "</w>", len(vocab))
    tok = CLIPTokenizer(vocab, [], model_max_length=77)
    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    pipe = StableDiffusionPipeline.from_random(
        models=SamplerModels(attn_impl=os.environ.get("BENCH_ATTN", "auto")),
        dtype=jnp.bfloat16, tokenizer=tok, policy=policy,
    )
    qmode = os.environ.get("BENCH_QUANT", "")
    qact = os.environ.get("BENCH_QUANT_ACT", "")
    if qmode:
        # OPT-IN int8 UNet; LoRA hot-swap rides bf16 on top. BENCH_QUANT_ACT:
        # constant static act scales (see bench_sweep).
        pipe.quantize(qmode, act_scale=float(qact) if qact else None)
    # BENCH_SERVE_LORAS=K: round-robin K distinct adapters through the burst
    # (default 2 = the classic metric's None/id0 alternation). With K >
    # batch-window diversity the classic server fragments into padded
    # per-LoRA batches; BENCH_MULTILORA=1 serves the same traffic with
    # per-request adapters packed into full batches (serving/engine.py).
    n_loras = int(os.environ.get("BENCH_SERVE_LORAS", "2"))
    multi = os.environ.get("BENCH_MULTILORA", "0") == "1"
    # BENCH_ROLLING=1: continuous batching (serving/rolling.py) — every slot
    # advances its own denoise step per tick; requests admit immediately.
    # BENCH_SERVE_STAGGER_MS=N: sleep N ms between submits (staggered
    # arrivals — the traffic shape where rolling admission pays; applies to
    # both engines for a fair comparison).
    rolling = os.environ.get("BENCH_ROLLING", "0") == "1"
    stagger_s = float(os.environ.get("BENCH_SERVE_STAGGER_MS", "0")) / 1e3
    # turbo knobs thread into the serving engine exactly as `cli serve`
    # passes them (BENCH_PRESET expands into these envs)
    sched_kind = os.environ.get("BENCH_SCHEDULER", "ddpm")
    dc = int(os.environ.get("BENCH_DEEPCACHE", "1"))
    dc_depth = int(os.environ.get("BENCH_DEEPCACHE_DEPTH", "1"))
    civ = os.environ.get("BENCH_CFG_INTERVAL", "")
    cfg_interval = tuple(int(v) for v in civ.split(":")) if civ else None
    pipe.set_scheduler(sched_kind)
    if rolling:
        from faceposegenerator_tpu.serving import RollingServer

        if dc > 1 or cfg_interval is not None:
            raise SystemExit("BENCH_ROLLING composes with BENCH_QUANT and "
                             "BENCH_SCHEDULER only (per-slot state is "
                             "exact-scheduler-shaped)")
        server = RollingServer(
            pipe, batch_size=batch, max_wait_s=0.2, num_inference_steps=steps,
            scheduler=sched_kind,
        )
    else:
        server = SamplerServer(
            pipe, batch_size=batch, max_wait_s=0.2, num_inference_steps=steps,
            multi_lora=multi, scheduler=sched_kind,
            deepcache_interval=dc, deepcache_depth=dc_depth,
            cfg_interval=cfg_interval,
        )
    from faceposegenerator_tpu.diffusion.lora_io import zero_lora

    zl = zero_lora(pipe.params["unet"], pipe.params["text_encoder"],
                   dtype=jnp.bfloat16)
    lora_ids = [None] + [f"id{k}" for k in range(n_loras - 1)]
    for k in range(n_loras - 1):
        server.register_lora(f"id{k}", zl)

    def burst(n, tag):
        reqs = [
            GenerationRequest(
                prompt=f"face portrait photo {tag} {i}", seed=i,
                lora_id=lora_ids[i % len(lora_ids)],
            )
            for i in range(n)
        ]
        if stagger_s > 0:
            futs = []
            for r in reqs:
                futs.append(server.submit(r))
                time.sleep(stagger_s)
            return [f.result() for f in futs]
        return server.generate(reqs)

    n = 2 * batch
    burst(n, "warmup")  # compile both … actually one program; warms it
    with server._stats_lock:  # drop compile-time batches from the telemetry
        for k in ("batch_times", "batch_sizes", "queue_times"):
            server._stats[k].clear()
    times, req_lat = [], []
    for r in range(repeats):
        t0 = time.perf_counter()
        results = burst(n, f"run{r}")
        times.append(time.perf_counter() - t0)
        # per-request service latency (queue wait + time in the engine) —
        # the number continuous batching exists to improve under staggered
        # arrivals; the burst wall time measures throughput
        req_lat.extend(res.queue_s + res.batch_s for res in results)
    best = min(times)
    req_lat.sort()
    server.shutdown()
    return {
        "metric": f"serving imgs/sec/chip 512x512 {steps}-step "
        + ("CFG" if sched_kind == "ddpm" else "DPM++ CFG") + f" (batch {batch}, "
        + (f"{n_loras}-LoRA bursts" if n_loras != 2 else "mixed-LoRA bursts")
        + (", multi_lora" if multi else "")
        + (", ROLLING" if rolling else "")
        + (f", stagger {int(stagger_s * 1e3)}ms" if stagger_s else "")
        + (f", DEEPCACHE={dc}" if dc > 1 else "")
        + (f", CFGIV={cfg_interval[0]}:{cfg_interval[1]}" if cfg_interval else "")
        + (f", QUANT={qmode}" + (f" ACT=static{qact}" if qact else "") if qmode else "") + ")",
        "value": round(n / best, 3),
        "unit": "img/s",
        "vs_baseline": round(n / best / 30.0, 3),
        "extra": {"burst_s": round(best, 2),
                  "p50_request_s": round(req_lat[len(req_lat) // 2], 3),
                  "p95_request_s": round(req_lat[int(len(req_lat) * 0.95)], 3),
                  "stats": server.stats(),
                  "device": str(jax.devices()[0])},
    }


def bench_latency(steps: int, repeats: int):
    """True batch-1 per-image latency (BASELINE.md: "p50 per-image latency
    tracked alongside throughput"). The reference's real op point is ONE
    image per pipe() call (`inference_ID-Booth.py:138`); the throughput
    bench's p50 divides a batch time by the batch, which hides the
    sequential-depth cost a single request actually pays.

    BENCH_PARA_WINDOW=W (>0) switches to the parallel-in-time Picard sampler
    (`diffusion/parallel_sampler.py`, ParaDiGMS arXiv:2305.16317) with
    BENCH_PARA_TOL tolerance (default 0.1) — the opt-in latency lever that
    spends idle MXU capacity on a W-wide window of future steps. Reports the
    executed Picard iteration count (sequential depth) alongside the time.
    """
    from faceposegenerator_tpu.core.precision import Policy
    from faceposegenerator_tpu.diffusion import make_ddpm, make_dpm_solver
    from faceposegenerator_tpu.diffusion.parallel_sampler import sample_parallel
    from faceposegenerator_tpu.diffusion.sampler import SamplerModels, sample
    from faceposegenerator_tpu.models import clip_text, unet2d, vae

    window = int(os.environ.get("BENCH_PARA_WINDOW", "0"))
    tol = float(os.environ.get("BENCH_PARA_TOL", "0.1"))
    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    models = SamplerModels(attn_impl=os.environ.get("BENCH_ATTN", "auto"))
    params = {
        "text_encoder": clip_text.init(jax.random.key(0), models.text_cfg, dtype=jnp.bfloat16),
        "unet": unet2d.init(jax.random.key(1), models.unet_cfg, dtype=jnp.bfloat16),
        "vae": vae.init(jax.random.key(2), models.vae_cfg, dtype=jnp.bfloat16),
    }
    qmode = os.environ.get("BENCH_QUANT", "")
    qact = os.environ.get("BENCH_QUANT_ACT", "")
    if qmode:
        from faceposegenerator_tpu.ops.quant import quantize_unet, quantize_vae

        aq = float(qact) if qact else None
        params = dict(params, unet=quantize_unet(params["unet"], act_scale=aq))
        if qmode.endswith("+vae"):
            params = dict(params, vae=quantize_vae(params["vae"], act_scale=aq))
    lora = {
        "unet": unet2d.init_lora(jax.random.key(3), params["unet"], rank=4, dtype=jnp.bfloat16),
        "text_encoder": None,
    }
    # BENCH_SCHEDULER=dpm: DPM-Solver++ few-step mode (see main's comment);
    # not composable with the Picard window (DDPM-only there).
    sched_kind = os.environ.get("BENCH_SCHEDULER", "ddpm")
    if sched_kind == "dpm":
        if window > 0:
            raise SystemExit("BENCH_SCHEDULER=dpm does not compose with BENCH_PARA_WINDOW")
        sched = make_dpm_solver(num_inference_steps=steps)
    else:
        sched = make_ddpm(num_inference_steps=steps)
    ids = jax.random.randint(jax.random.key(4), (1, 77), 0, 49408)
    neg = jnp.zeros_like(ids)
    kw = dict(models=models, guidance_scale=5.0, height=512, width=512,
              policy=policy, lora=lora)
    # turbo knobs compose with the sequential batch-1 path (NOT with the
    # Picard window — its iterates are step-synchronized)
    dc = int(os.environ.get("BENCH_DEEPCACHE", "1"))
    dc_depth = int(os.environ.get("BENCH_DEEPCACHE_DEPTH", "1"))
    cfg_iv = os.environ.get("BENCH_CFG_INTERVAL", "")
    cfg_interval = tuple(int(v) for v in cfg_iv.split(":")) if cfg_iv else None
    if window == 0:
        kw.update(deepcache_interval=dc, deepcache_depth=dc_depth,
                  cfg_interval=cfg_interval, scheduler=sched_kind)
    elif dc > 1 or cfg_interval is not None:
        raise SystemExit("BENCH_DEEPCACHE/BENCH_CFG_INTERVAL do not compose "
                         "with BENCH_PARA_WINDOW")

    def run(key):
        if window > 0:
            img, iters = sample_parallel(
                params, sched, ids, neg, key,
                window=window, tolerance=tol, return_stats=True, **kw,
            )
            return img, iters
        return sample(params, sched, ids, neg, key, **kw), None

    img, iters = run(jax.random.key(0))
    float(jnp.sum(img))  # compile + settle (host fetch: axon block_until_ready lies)

    times, iter_counts = [], []
    for i in range(repeats):
        t0 = time.perf_counter()
        img, iters = run(jax.random.key(i + 1))
        float(jnp.sum(img))
        times.append(time.perf_counter() - t0)
        if iters is not None:
            iter_counts.append(int(iters))

    times.sort()
    p50 = times[len(times) // 2]
    tag = f" PARA={window}/tol{tol}" if window > 0 else " sequential"
    if qmode:
        tag += f" QUANT={qmode}" + (f" ACT=static{qact}" if qact else "")
    if window == 0 and dc > 1:
        tag += f" DEEPCACHE={dc}/d{dc_depth}"
    if window == 0 and cfg_interval is not None:
        tag += f" CFGIV={cfg_interval[0]}:{cfg_interval[1]}"
    return {
        "metric": f"p50 batch-1 latency 512x512 {steps}-step "
        f"{'DDPM' if sched_kind == 'ddpm' else 'DPM++'}+CFG SD2.1+LoRA{tag}",
        "value": round(p50, 3),
        "unit": "s/img",
        "vs_baseline": round(p50, 3),
        "extra": {
            "times_s": [round(t, 3) for t in times],
            "best_s": round(times[0], 3),
            "picard_iters": iter_counts or None,
            "device": str(jax.devices()[0]),
        },
    }


def main():
    from faceposegenerator_tpu.core.precision import Policy
    from faceposegenerator_tpu.diffusion import make_ddpm, make_dpm_solver
    from faceposegenerator_tpu.diffusion.sampler import SamplerModels, sample
    from faceposegenerator_tpu.models import clip_text, unet2d, vae

    preset = os.environ.get("BENCH_PRESET", "")
    if preset:
        apply_bench_preset(preset)  # setdefault: explicit knob envs win
    sched_env = os.environ.get("BENCH_SCHEDULER", "ddpm")
    if sched_env not in ("ddpm", "dpm"):
        # SystemExit skips the retry loop — a typo'd env must not burn slots
        raise SystemExit(
            f"BENCH_SCHEDULER={sched_env!r} unknown (allowed: ddpm, dpm)"
        )

    kind = os.environ.get("BENCH_KIND", "sample")
    # bs8 measured 2.005 img/s vs bs16's 1.956 on v5e (5-repeat confirm,
    # perf/r3_gnconv_bs.jsonl) — the CFG doubling means bs8 already runs the
    # UNet at batch 16; the smaller live set fits HBM better. bs8 is the
    # single-chip throughput optimum AND the latency winner (4.0 s batch).
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    steps = int(os.environ.get("BENCH_STEPS", "30"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    attn = os.environ.get("BENCH_ATTN", "auto")

    if kind == "train":
        print(json.dumps(bench_train(int(os.environ.get("BENCH_BATCH", "4")), repeats)))
        return
    if kind == "embed":
        print(json.dumps(bench_embed(int(os.environ.get("BENCH_BATCH", "256")), repeats)))
        return
    if kind == "embed_e2e":
        print(json.dumps(bench_embed_e2e(int(os.environ.get("BENCH_BATCH", "64")), repeats)))
        return
    if kind == "sweep":
        print(json.dumps(bench_sweep(repeats)))
        return
    if kind == "serve":
        print(json.dumps(bench_serve(batch, steps, repeats)))
        return
    if kind == "fr":
        print(json.dumps(bench_fr(int(os.environ.get("BENCH_BATCH", "128")), repeats)))
        return
    if kind == "latency":
        print(json.dumps(bench_latency(steps, max(repeats, 5))))
        return

    ablate = os.environ.get("BENCH_ABLATE", "")
    if ablate:
        apply_ablation(ablate)

    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    models = SamplerModels(attn_impl=attn)

    params = {
        "text_encoder": clip_text.init(jax.random.key(0), models.text_cfg, dtype=jnp.bfloat16),
        "unet": unet2d.init(jax.random.key(1), models.unet_cfg, dtype=jnp.bfloat16),
        "vae": vae.init(jax.random.key(2), models.vae_cfg, dtype=jnp.bfloat16),
    }
    lora = {
        "unet": unet2d.init_lora(jax.random.key(3), params["unet"], rank=4, dtype=jnp.bfloat16),
        "text_encoder": None,
    }
    # BENCH_SCHEDULER=dpm: DPM-Solver++ multistep (the reference's own
    # VALIDATION sampler, `train_ID-Booth.py:155`) — the few-step turbo
    # mode: same program shape, deterministic 2nd-order steps, typically
    # run at BENCH_STEPS=15-20 instead of DDPM's 30. Reported with a
    # SCHED tag, never as the default (the reference inference op point
    # is 30-step DDPM).
    sched_kind = os.environ.get("BENCH_SCHEDULER", "ddpm")
    if sched_kind == "dpm":
        sched = make_dpm_solver(num_inference_steps=steps)
    else:
        sched = make_ddpm(num_inference_steps=steps)
    ids = jax.random.randint(jax.random.key(4), (batch, 77), 0, 49408)
    neg = jnp.zeros_like(ids)

    decode_chunk = int(os.environ.get("BENCH_DECODE_CHUNK", "0")) or None
    unroll = int(os.environ.get("BENCH_UNROLL", "1"))
    # BENCH_DEEPCACHE=k: OPT-IN DeepCache approximation — full UNet every
    # k-th step, shallow-blocks-only + deep-feature splice otherwise
    # (BENCH_DEEPCACHE_DEPTH shallow blocks recomputed; sampler docstring).
    # Reported SEPARATELY from the exact default metric.
    dc = int(os.environ.get("BENCH_DEEPCACHE", "1"))
    dc_depth = int(os.environ.get("BENCH_DEEPCACHE_DEPTH", "1"))
    # BENCH_TOME=0.5: OPT-IN ToMe token merging before >=4096-token UNet
    # self-attention (ops/tome.py); composable with DEEPCACHE; 0 = exact.
    tome = float(os.environ.get("BENCH_TOME", "0"))
    tome_ops = os.environ.get("BENCH_TOME_OPS", "attn")  # attn[+xattn][+mlp]
    # BENCH_CFG_INTERVAL="i0:i1": OPT-IN guidance interval (arXiv:2404.07724)
    # — CFG only at step indices [i0, i1); cond-only half-batch UNet outside.
    cfg_iv = os.environ.get("BENCH_CFG_INTERVAL", "")
    cfg_interval = tuple(int(v) for v in cfg_iv.split(":")) if cfg_iv else None
    # BENCH_QUANT=w8a8: OPT-IN int8 UNet (ops/quant.py) — matmuls/convs run
    # int8x int8->int32 on the MXU (2x bf16 rate on v5e); CLIP/VAE and the
    # exact default program untouched. Reported with a QUANT tag.
    qmode = os.environ.get("BENCH_QUANT", "")
    # BENCH_QUANT_ACT=<float>: static per-tensor activation scales stamped on
    # every quantized site (ops/quant.py) — removes the dynamic amax reduce
    # passes over activations; perf-equivalent to a calibrated tree (same
    # program, different constants). Tagged ACT=static in the metric.
    qact = os.environ.get("BENCH_QUANT_ACT", "")
    if qmode:
        from faceposegenerator_tpu.ops.quant import quantize_unet, quantize_vae

        aq = float(qact) if qact else None
        params = dict(params, unet=quantize_unet(params["unet"], act_scale=aq))
        if qmode.endswith("+vae"):
            params = dict(params, vae=quantize_vae(params["vae"], act_scale=aq))

    def run(key):
        return sample(
            params, sched, ids, neg, key,
            models=models, guidance_scale=5.0, height=512, width=512,
            policy=policy, lora=lora, decode_chunk=decode_chunk,
            unroll=unroll, deepcache_interval=dc, deepcache_depth=dc_depth,
            tome_ratio=tome, tome_ops=tome_ops, cfg_interval=cfg_interval,
            scheduler=sched_kind,
        )

    # warmup/compile — fetch to host: on the axon platform block_until_ready
    # can return before execution completes, so timing uses device_get
    float(jnp.sum(run(jax.random.key(0))))

    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        float(jnp.sum(run(jax.random.key(i + 1))))
        times.append(time.perf_counter() - t0)

    best = min(times)
    ips = batch / best
    p50_latency = best / batch
    tag = f" ABLATE={ablate}" if ablate else ""
    if dc > 1:
        tag += f" DEEPCACHE={dc}/d{dc_depth}"
    if tome > 0:
        tag += f" TOME={tome}/{tome_ops}"
    if cfg_interval is not None:
        tag += f" CFGIV={cfg_interval[0]}:{cfg_interval[1]}"
    if qmode:
        tag += f" QUANT={qmode}" + (f" ACT=static{qact}" if qact else "")
    if preset:
        tag += f" PRESET={preset}"
    sched_name = "DDPM" if sched_kind == "ddpm" else "DPM++"
    is_exact_default = (
        not ablate and dc == 1 and tome == 0 and cfg_interval is None
        and not qmode and sched_kind == "ddpm" and steps == 30 and batch == 8
    )
    result = {
        "metric": f"images/sec/chip 512x512 {steps}-step {sched_name}+CFG SD2.1+LoRA bs{batch}{tag}",
        "value": round(ips, 3),
        "unit": "img/s",
        "vs_baseline": round(ips / 30.0, 3),
        "extra": {
            "p50_s_per_image": round(p50_latency, 3),
            "times_s": [round(t, 2) for t in times],
            "attn": attn,
            "device": str(jax.devices()[0]),
            **exact_path_context(ips, is_exact_default),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    # the axon relay occasionally drops mid-run, and after a kernel-OOM crash
    # the TPU worker reports FAILED_PRECONDITION for a minute or two while it
    # restarts — retries (with a settle delay) keep the driver's recorded
    # bench alive (a wasted queue slot was measured: STATUS.md queue C)
    import sys, time as _time, traceback

    for attempt in range(3):
        try:
            main()
            break
        except Exception as e:
            traceback.print_exc(file=sys.stderr)
            if attempt == 2:
                raise
            print(f"bench retry {attempt + 1} after error:", type(e).__name__, file=sys.stderr)
            _time.sleep(150 if "FAILED_PRECONDITION" in str(e) else 10)
