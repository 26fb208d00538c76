"""ID-Booth experiment driver: epoch loop, checkpointing, validation, sweep.

Behavioral rebuild of the reference's `main(args)` + `__main__` sweep
(`train_ID-Booth.py:505-1334`):
  - one full LoRA fine-tune per (loss-variant, identity);
  - sweep folders named DreamBooth / PortraitBooth / ID-Booth per
    `losses_to_test` mapping (`:1299-1307`);
  - `training_config.json` snapshot per run (`:1316-1322`);
  - checkpoints `checkpoint-{epoch}-{global_step}` every
    `checkpointing_epochs`, resumable from "latest" (`:928-956,1181-1206`);
  - validation sampling with DPM-Solver++ every `validation_epochs`
    (`log_validation`, `:132-191,1208-1234`);
  - final diffusers-format LoRA export (`:1240-1258`).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpointing import CheckpointManager
from ..core.config import snapshot_config
from ..core.logging_utils import AverageMeter, ThroughputLogger, setup_logging
from ..core.precision import Policy, DEFAULT_POLICY
from ..core.rng import train_step_key
from ..data.dreambooth import DreamBoothDataset
from ..diffusion import make_ddpm, make_dpm_solver
from ..diffusion.sampler import SamplerModels, sample
from . import idbooth


def generate_class_images(
    pipe,
    class_dir: str,
    class_prompt: str,
    num_class_images: int = 200,
    batch_size: int = 4,
    num_inference_steps: int = 30,
):
    """Pre-generate prior-preservation images when missing
    (`train_ID-Booth.py:547-592`)."""
    import hashlib

    from PIL import Image

    os.makedirs(class_dir, exist_ok=True)
    existing = len(
        [f for f in os.listdir(class_dir) if f.lower().endswith((".jpg", ".png"))]
    )
    needed = num_class_images - existing
    idx = existing
    while needed > 0:
        n = min(batch_size, needed)
        imgs = pipe(
            prompt=[class_prompt] * n,
            num_inference_steps=num_inference_steps,
            seed=idx,
        )
        for img in imgs:
            arr = (np.asarray(img) * 255).astype(np.uint8)
            digest = hashlib.sha1(arr.tobytes()).hexdigest()
            Image.fromarray(arr).save(os.path.join(class_dir, f"{idx}-{digest}.jpg"))
            idx += 1
        needed -= n
    return idx


def validation_images(
    frozen: Dict,
    trainable: Dict,
    cfg: idbooth.IDBoothConfig,
    bundle: idbooth.ModelBundle,
    tokenizer,
    policy: Policy,
    num_steps: int = 25,
):
    """DPM-Solver++ validation sampling (`log_validation`)."""
    models = SamplerModels(
        text_cfg=bundle.text_cfg, unet_cfg=bundle.unet_cfg, vae_cfg=bundle.vae_cfg,
        attn_impl=bundle.attn_impl,
    )
    sched = make_dpm_solver(num_inference_steps=num_steps)
    ids = jnp.asarray(
        tokenizer([cfg.validation_prompt] * cfg.num_validation_images)
    )
    neg = jnp.asarray(tokenizer([""] * cfg.num_validation_images))
    params = {
        "text_encoder": frozen["text_encoder"],
        "unet": frozen["unet"],
        "vae": frozen["vae"],
    }
    lora = {"unet": trainable["unet_lora"], "text_encoder": trainable.get("text_lora")}
    return np.asarray(
        sample(
            params, sched, ids, neg, jax.random.key(cfg.seed),
            models=models, guidance_scale=5.0,
            height=cfg.resolution, width=cfg.resolution,
            policy=policy, scheduler="dpm", lora=lora,
        )
    )


def run_identity(
    cfg: idbooth.IDBoothConfig,
    bundle: idbooth.ModelBundle,
    frozen: Dict,
    instance_dir: str,
    output_dir: str,
    tokenizer=None,
    embeds_dir: Optional[str] = None,
    class_dir: Optional[str] = None,
    policy: Policy = DEFAULT_POLICY,
    detect_fn: Callable = idbooth.full_image_boxes,
    resume: bool = True,
    instance_ids: Optional[np.ndarray] = None,
    class_ids: Optional[np.ndarray] = None,
    logger=None,
    on_epoch_end: Optional[Callable] = None,
    mesh=None,
    num_hosts: int = 1,
    host_id: int = 0,
):
    """Full fine-tune of one identity. Returns (trainable, history).

    `mesh`: optional `jax.sharding.Mesh` — the epoch loop runs DATA-PARALLEL
    (trainable/opt/frozen replicated, batches sharded over "data" via
    `core.mesh.form_global_batch`). On a multi-host pod additionally pass
    `num_hosts`/`host_id`: each host loads ONLY its row slice of every
    global batch (`DreamBoothDataset.sharded_batches` — the Accelerate
    dataloader-wrap contract, `train_ID-Booth.py:890-898`).
    `cfg.train_batch_size` is the PER-HOST batch; global = × num_hosts."""
    logger = logger or setup_logging(output_dir)
    if instance_ids is None:
        instance_ids = tokenizer([cfg.instance_prompt])[0]
    if class_ids is None and cfg.with_prior_preservation:
        class_ids = tokenizer([cfg.class_prompt])[0]

    dataset = DreamBoothDataset(
        instance_dir, instance_ids,
        class_dir=class_dir if cfg.with_prior_preservation else None,
        class_ids=class_ids,
        embeds_dir=embeds_dir,
        resolution=cfg.resolution,
        seed=cfg.seed,
        embed_dim=bundle.arcface_cfg.num_features,
    )
    global_batch = cfg.train_batch_size * max(num_hosts, 1)
    steps_per_epoch = max(len(dataset) // global_batch, 1)
    total_steps = steps_per_epoch * cfg.num_train_epochs

    trainable = idbooth.init_trainable(
        jax.random.key(cfg.seed), cfg, bundle, frozen["unet"],
        frozen.get("text_encoder"),
    )
    optimizer = idbooth.make_optimizer(cfg, total_steps)
    opt_state = optimizer.init(trainable)
    schedule = make_ddpm()
    train_step = idbooth.make_train_step(
        cfg, bundle, optimizer, schedule, policy=policy, detect_fn=detect_fn
    )

    ckpt = CheckpointManager(output_dir, cfg.checkpoints_total_limit)
    first_epoch, global_step = 0, 0
    if resume and ckpt.latest():
        trainable, opt_state, first_epoch, global_step = ckpt.restore(
            ckpt.latest(), trainable, opt_state
        )
        first_epoch += 1
        logger.info(f"resumed from {ckpt.latest()} (epoch {first_epoch})")

    if mesh is not None:
        from ..core.mesh import replicate as _replicate

        trainable = _replicate(mesh, trainable)
        opt_state = _replicate(mesh, opt_state)
        frozen = _replicate(mesh, frozen)

    base_key = jax.random.key(cfg.seed)
    throughput = ThroughputLogger(
        frequency=50, total_steps=total_steps, logger=logger
    )
    from ..core.trackers import Tracker

    tracker = Tracker(os.path.join(output_dir, "logs"))
    history: List[Dict] = []

    for epoch in range(first_epoch, cfg.num_train_epochs):
        meters = {k: AverageMeter() for k in ("loss", "instance_loss", "prior_loss", "id_loss")}
        if mesh is not None or num_hosts > 1:
            batch_iter = dataset.sharded_batches(
                cfg.train_batch_size, num_shards=max(num_hosts, 1),
                shard_index=host_id, epoch=epoch, order_seed=cfg.seed,
            )
        else:
            batch_iter = dataset.batches(cfg.train_batch_size)
        for batch in batch_iter:
            if mesh is not None:
                from ..core.mesh import form_global_batch

                batch = form_global_batch(mesh, batch)
            key = train_step_key(base_key, global_step)
            trainable, opt_state, metrics = train_step(
                trainable, opt_state, frozen, batch, key
            )
            global_step += 1
            for k, m in meters.items():
                if k in metrics:
                    m.update(float(metrics[k]))
            throughput(global_step, cfg.train_batch_size, None)
        epoch_stats = {k: m.avg for k, m in meters.items() if m.count}
        epoch_stats["epoch"] = epoch
        history.append(epoch_stats)
        tracker.log_scalars(global_step, {k: v for k, v in epoch_stats.items() if k != "epoch"})
        logger.info(f"epoch {epoch}: " + ", ".join(f"{k}={v:.4f}" for k, v in epoch_stats.items() if k != "epoch"))

        last = epoch == cfg.num_train_epochs - 1
        if (epoch + 1) % cfg.checkpointing_epochs == 0 or last:
            lora_export = {
                "unet": trainable["unet_lora"],
                "text_encoder": trainable.get("text_lora"),
            }
            ckpt.save(epoch, global_step, trainable, opt_state, lora_export)
        if on_epoch_end is not None:
            on_epoch_end(epoch, trainable, history)
        if tokenizer is not None and ((epoch + 1) % cfg.validation_epochs == 0 or last):
            try:
                imgs = validation_images(frozen, trainable, cfg, bundle, tokenizer, policy)
                from ..pipelines.sweep import save_image_grid

                save_image_grid(
                    imgs, os.path.join(output_dir, "validation", f"epoch_{epoch}.png")
                )
                tracker.log_images(global_step, "validation", imgs)
            except Exception as e:  # validation must never kill training
                logger.warning(f"validation sampling failed: {e}")

    # final LoRA export at the root (`pytorch_lora_weights.safetensors`)
    from ..diffusion.lora_io import save_lora_safetensors

    save_lora_safetensors(
        {"unet": trainable["unet_lora"], "text_encoder": trainable.get("text_lora")},
        os.path.join(output_dir, "pytorch_lora_weights.safetensors"),
    )
    tracker.close()
    return trainable, history


def run_experiment_sweep(
    cfg: idbooth.IDBoothConfig,
    bundle: idbooth.ModelBundle,
    frozen: Dict,
    source_folder: str,
    output_folder: str,
    tokenizer=None,
    embeds_root: Optional[str] = None,
    class_dir: Optional[str] = None,
    identities: Optional[List[str]] = None,
    vmap_identities: int = 1,
    **kw,
):
    """losses_to_test × identities sweep (`train_ID-Booth.py:1287-1334`).

    `vmap_identities=K` trains identities in vmapped groups of K (ONE
    compiled program per group; see `training.multi_identity`) instead of
    serially — per-identity semantics and on-disk artifacts are unchanged,
    but the convs see batch K×(inst+prior), which is the difference between
    25% and 55% MFU at the reference's tiny per-identity batch (STATUS.md
    train roofline). Identities are grouped by dataset-size quotient so
    each group shares one steps_per_epoch/LR schedule; ragged leftovers
    fall back to serial `run_identity`.
    """
    from ..data.dreambooth import _natural_key

    if identities is None:
        identities = sorted(
            (d for d in os.listdir(source_folder) if os.path.isdir(os.path.join(source_folder, d))),
            key=_natural_key,
        )
    results = {}
    for which_loss in cfg.losses_to_test:
        run_cfg = cfg.replace(which_loss=which_loss)
        folder = idbooth.LOSS_TO_FOLDER[which_loss]
        run_root = os.path.join(output_folder, folder)
        os.makedirs(run_root, exist_ok=True)
        snapshot_config(run_cfg, run_root)
        serial: List[str] = []
        if vmap_identities > 1:
            from .multi_identity import run_identities_vmapped

            # group identities whose datasets yield the same steps/epoch
            # (dataset length = max(instance, class) — the DreamBooth
            # shorter-side-cycling semantics, data/dreambooth.py)
            from ..data.dreambooth import list_images

            n_class = (
                len(list_images(class_dir))
                if class_dir and run_cfg.with_prior_preservation else 0
            )
            by_spe: Dict[int, List[str]] = {}
            for ident in identities:
                n_img = len(list_images(os.path.join(source_folder, ident)))
                length = max(n_img, n_class or 1)
                by_spe.setdefault(length // run_cfg.train_batch_size, []).append(ident)
            for group_ids in by_spe.values():
                while len(group_ids) >= vmap_identities:
                    grp, group_ids = (
                        group_ids[:vmap_identities], group_ids[vmap_identities:]
                    )
                    _, hists = run_identities_vmapped(
                        run_cfg, bundle, frozen,
                        instance_dirs=[os.path.join(source_folder, g) for g in grp],
                        output_dirs=[os.path.join(run_root, g) for g in grp],
                        tokenizer=tokenizer,
                        embeds_dirs=[
                            os.path.join(embeds_root, g) if embeds_root else None
                            for g in grp
                        ],
                        class_dir=class_dir,
                        **{k: v for k, v in kw.items()
                           if k in ("policy", "detect_fn", "resume",
                                    "instance_ids", "class_ids", "logger",
                                    "mesh")},
                    )
                    for g, h in zip(grp, hists):
                        results[(which_loss, g)] = h
                serial.extend(group_ids)
        else:
            serial = list(identities)
        for ident in serial:
            out = os.path.join(run_root, ident)
            _, history = run_identity(
                run_cfg, bundle, frozen,
                instance_dir=os.path.join(source_folder, ident),
                output_dir=out,
                tokenizer=tokenizer,
                embeds_dir=os.path.join(embeds_root, ident) if embeds_root else None,
                class_dir=class_dir,
                **kw,
            )
            results[(which_loss, ident)] = history
    return results
