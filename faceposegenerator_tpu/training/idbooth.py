"""ID-Booth LoRA fine-tuning: a single pjit-compiled train step.

Rebuilds the reference trainer's hot loop (`train_ID-Booth.py:994-1146`) as
one pure function: VAE encode → noise/timesteps → CLIP → UNet(LoRA) → loss →
AdamW-on-LoRA update, compiled once and sharded over the mesh "data" axis
(replacing HF Accelerate DP, SURVEY.md §2.5).

Loss composition (reference `train_ID-Booth.py:1054-1138`):
  - instance MSE + `prior_loss_weight` · prior MSE (batch is the concat
    [instance; class] from the collate, `:354-389`)
  - "identity" (PortraitBooth): + w · (1 − cos(ArcFace(x̂0 face), gt)),
    w = (1 − t/T)² (`:1079-1105`)
  - "triplet_prior" (ID-Booth): + w · max(d(a,p) − d(a,n) + margin, 0) with
    cosine distance, anchor = ArcFace(x̂0 face), positive = gt instance
    embed, negative = gt class embed (`:1107-1134`; margin 1.0 =
    `TripletMarginWithDistanceLoss` default)

TPU-native differences (documented superset):
  - the reference computes the identity branch only on batch element 0
    (`timesteps[0]`, SURVEY.md appendix); we compute it batched over all
    instance elements — identical when per-device batch is 1 (the
    reference's operating point, `configs/config_train_SD21.py:49`).
  - face detection is a device-side stage returning (boxes, found-mask);
    "no face" masks the identity term instead of skipping the step
    (`train_ID-Booth.py:1087`). Gradients flow through the bilinear
    crop into the VAE decode exactly as in the reference.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.config import ConfigBase
from ..core.compile import jit as _options_jit
from ..core.precision import Policy, DEFAULT_POLICY
from ..diffusion.schedulers import DDPMSchedule, make_ddpm
from ..models import clip_text, unet2d, vae, iresnet
from ..ops.image import crop_and_resize


@dataclasses.dataclass
class IDBoothConfig(ConfigBase):
    """Parameter surface of `configs/config_train_SD21.py` (LX layer)."""

    pretrained_model_name_or_path: str = "stabilityai/stable-diffusion-2-1-base"
    resolution: int = 512
    instance_prompt: str = "photo of sks person"
    class_prompt: str = "photo of a person"
    with_prior_preservation: bool = True
    num_class_images: int = 200
    prior_loss_weight: float = 1.0
    lora_rank: int = 4
    train_batch_size: int = 1
    gradient_accumulation_steps: int = 1
    gradient_checkpointing: bool = False
    # remat the x̂0→VAE-decode→detect→ArcFace identity branch: its backward
    # otherwise saves every VAE-decoder activation for the full instance
    # half at 512² (the multi-GB tensors behind the bs16 HBM OOM —
    # STATUS.md train table). Costs one extra decode forward when on.
    remat_identity: bool = False
    # run the identity branch over sub-batches of this size via lax.map
    # (sequential), dividing the branch's fwd+bwd activation peak by
    # b_inst/chunk — remat_identity alone left bs16 674 MB short of HBM.
    # None = whole instance half at once. Memory-only knob: the chunked
    # masked sums add in the same order (loss matches tightly); grads match
    # to fp32-reassociation tolerance (conv-backward reduction order shifts
    # with the branch's batch shape).
    identity_chunk: Optional[int] = None
    num_train_epochs: int = 32
    validation_epochs: int = 8
    checkpointing_epochs: int = 8
    checkpoints_total_limit: Optional[int] = None
    learning_rate: float = 1e-4
    # reference scale_lr (`configs/config_train_SD21.py:71`, False there):
    # lr *= grad_accum · batch · num_processes (`train_ID-Booth.py:773-776`)
    scale_lr: bool = False
    lr_scheduler: str = "cosine"
    lr_warmup_steps: int = 0
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_weight_decay: float = 1e-2
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    train_text_encoder: bool = False
    which_loss: str = ""  # "", "identity", "triplet_prior"
    timestep_loss_weighting: bool = True
    triplet_margin: float = 1.0
    seed: int = 0
    losses_to_test: Tuple[str, ...] = ("", "identity", "triplet_prior")
    num_validation_images: int = 4
    validation_prompt: str = "photo of sks person with blue hair"


# Reference experiment-sweep folder naming (`train_ID-Booth.py:1299-1307`)
LOSS_TO_FOLDER = {"": "DreamBooth", "identity": "PortraitBooth", "triplet_prior": "ID-Booth"}


@dataclasses.dataclass(frozen=True)
class ModelBundle:
    """Static model configs for the trainer (hashable, jit-safe)."""

    text_cfg: clip_text.CLIPTextConfig = clip_text.SD21_TEXT_CONFIG
    unet_cfg: unet2d.UNetConfig = unet2d.SD21_UNET_CONFIG
    vae_cfg: vae.VAEConfig = vae.SD_VAE_CONFIG
    arcface_cfg: iresnet.IResNetConfig = iresnet.IResNetConfig()
    # "auto" (flash) since the fused Pallas backward landed: it saves only
    # (o, lse) row statistics and recomputes normalized p in-kernel, beating
    # XLA's saved-residual backward at the ID-Booth shapes (measured v5e:
    # 4.61 vs 3.90 train-imgs/s bs2+prior, 8.93 vs 7.03 bs8+remat). The
    # earlier recompute-via-reference backward had measured slower (3.27).
    attn_impl: str = "auto"


def full_image_boxes(images: jax.Array):
    """Default detector stub: whole image, always found. Replaced by the
    MTCNN port; keeps the train step structure (and XLA program) fixed."""
    b, h, w, _ = images.shape
    boxes = jnp.tile(jnp.array([[0.0, 0.0, float(w), float(h)]], jnp.float32), (b, 1))
    return boxes, jnp.ones((b,), bool)


def make_optimizer(cfg: IDBoothConfig, total_steps: int, num_replicas: int = 1):
    """AdamW over LoRA params with cosine decay and global-norm clipping
    (reference `train_ID-Booth.py:787-811,881-888,1140-1146`; LR is scaled
    by the replica count like Accelerate does at `:773-776`)."""
    lr = cfg.learning_rate
    if cfg.scale_lr:
        # `train_ID-Booth.py:773-776` (Accelerate DP semantics)
        lr = lr * cfg.gradient_accumulation_steps * cfg.train_batch_size * num_replicas
    if cfg.lr_scheduler == "cosine":
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0 if cfg.lr_warmup_steps else lr,
            peak_value=lr,
            warmup_steps=cfg.lr_warmup_steps,
            decay_steps=max(total_steps, 1),
            end_value=0.0,
        )
    elif cfg.lr_scheduler == "constant":
        schedule = lr
    else:
        raise ValueError(cfg.lr_scheduler)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            schedule,
            b1=cfg.adam_beta1,
            b2=cfg.adam_beta2,
            eps=cfg.adam_epsilon,
            weight_decay=cfg.adam_weight_decay,
        ),
    )
    if cfg.gradient_accumulation_steps > 1:
        # reference semantics: `accelerator.accumulate` averages grads over
        # N micro-batches and steps the optimizer every N
        # (`train_ID-Booth.py:511,995`); optax.MultiSteps is the functional
        # equivalent — the schedule advances per real update only
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.gradient_accumulation_steps)
    return tx


def _cosine_sim(a, b, eps=1e-6):
    a32, b32 = a.astype(jnp.float32), b.astype(jnp.float32)
    denom = jnp.maximum(jnp.linalg.norm(a32, axis=-1) * jnp.linalg.norm(b32, axis=-1), eps)
    return jnp.sum(a32 * b32, axis=-1) / denom


def make_loss_fn(
    cfg: IDBoothConfig,
    models: ModelBundle,
    schedule: DDPMSchedule,
    policy: Policy = DEFAULT_POLICY,
    detect_fn: Callable = full_image_boxes,
):
    """Build the pure loss function.

    batch: {"pixel_values": (2B,H,W,3) [-1,1] — [instance; class] concat,
            "input_ids": (2B,77), "gt_embeds": (2B,512)}
    (without prior preservation the batch is just (B, ...)).
    """
    T = schedule.num_train_timesteps

    def loss_fn(trainable, frozen, batch, key):
        pix = batch["pixel_values"]
        ids = batch["input_ids"]
        n = pix.shape[0]
        b_inst = n // 2 if cfg.with_prior_preservation else n

        k_lat, k_noise, k_t = jax.random.split(key, 3)

        # latent encode (train_ID-Booth.py:1001)
        moments = vae.encode_moments(frozen["vae"], pix, models.vae_cfg, policy)
        latents = vae.sample_latents(moments, k_lat, models.vae_cfg)

        noise = jax.random.normal(k_noise, latents.shape, jnp.float32)
        timesteps = jax.random.randint(k_t, (n,), 0, T)
        noisy = schedule.add_noise(latents, noise, timesteps)

        # text conditioning (train_ID-Booth.py:1024); precomputed embeddings
        # short-circuit the CLIP forward (pre_compute_text_embeddings path,
        # `train_ID-Booth.py:813-849,1021-1022`)
        if "encoder_hidden_states" in batch:
            ctx = batch["encoder_hidden_states"].astype(policy.compute_dtype)
        else:
            text_lora = trainable.get("text_lora") if cfg.train_text_encoder else None
            ctx = clip_text.apply(
                frozen["text_encoder"], ids, models.text_cfg, policy=policy, lora=text_lora
            )

        pred = unet2d.apply(
            frozen["unet"], noisy, timesteps, ctx, models.unet_cfg, policy=policy,
            lora=trainable["unet_lora"], attn_impl=models.attn_impl,
            remat=cfg.gradient_checkpointing,
        )
        if pred.shape[-1] == 2 * latents.shape[-1]:
            # variance-predicting UNets: train only on the mean half
            # (`train_ID-Booth.py:1051-1052`; inert for SD2.1's 4-ch output)
            pred = pred[..., : latents.shape[-1]]

        target = noise  # epsilon prediction (SD2.1-base)

        metrics = {}
        if cfg.with_prior_preservation:
            pred_inst, pred_prior = pred[:b_inst], pred[b_inst:]
            tgt_inst, tgt_prior = target[:b_inst], target[b_inst:]
            instance_loss = jnp.mean(jnp.square(pred_inst - tgt_inst))
            prior_loss = jnp.mean(jnp.square(pred_prior - tgt_prior))
            loss = instance_loss + cfg.prior_loss_weight * prior_loss
            metrics["prior_loss"] = prior_loss
        else:
            pred_inst = pred
            instance_loss = jnp.mean(jnp.square(pred - target))
            loss = instance_loss
        metrics["instance_loss"] = instance_loss

        if cfg.which_loss in ("identity", "triplet_prior"):
            t_inst = timesteps[:b_inst]
            x0 = schedule.pred_original(pred_inst, t_inst, noisy[:b_inst])
            gt_inst = batch["gt_embeds"][:b_inst]
            gt_neg = batch["gt_embeds"][b_inst:] if cfg.with_prior_preservation else gt_inst

            def _identity_sums(x0, gt_inst, gt_neg, t_inst):
                """(Σ mask·w·term, Σ mask) over these samples — associative,
                so chunked evaluation is bit-identical to one-shot."""
                # decode to [0,255] image (latents_to_image_for_mtcnn, :408-441)
                img = vae.decode(frozen["vae"], x0, models.vae_cfg, policy)
                img255 = jnp.clip(img * 0.5 + 0.5, 0.0, 1.0) * 255.0

                boxes, found = detect_fn(img255)
                face = crop_and_resize(img255, boxes, 112)
                face = (face / 255.0 - 0.5) / 0.5  # cropped_image_to_arcface_input
                emb, _ = iresnet.apply(
                    frozen["arcface"]["params"], frozen["arcface"]["state"], face,
                    models.arcface_cfg, policy=policy, train=False,
                )

                w = jnp.square(1.0 - t_inst.astype(jnp.float32) / T)
                if not cfg.timestep_loss_weighting:
                    w = jnp.ones_like(w)
                mask = found.astype(jnp.float32)

                if cfg.which_loss == "identity":
                    term = 1.0 - _cosine_sim(emb, gt_inst)
                else:  # triplet_prior
                    d_ap = 1.0 - _cosine_sim(emb, gt_inst)
                    d_an = 1.0 - _cosine_sim(emb, gt_neg)
                    term = jnp.maximum(d_ap - d_an + cfg.triplet_margin, 0.0)
                return jnp.sum(mask * w * term), jnp.sum(mask)

            branch = _identity_sums
            if cfg.remat_identity:
                branch = jax.checkpoint(branch)
            ck = cfg.identity_chunk
            if ck is not None and (ck <= 0 or ck > b_inst or b_inst % ck != 0):
                # the knob exists to avoid HBM OOM — silently falling through
                # to the whole-batch branch would OOM anyway with no signal
                # (VERDICT r2 weak #6 / ADVICE r2)
                raise ValueError(
                    f"identity_chunk={ck} does not evenly divide the instance "
                    f"batch {b_inst}; choose a divisor of the (instance) batch "
                    "size or unset it"
                )
            if ck and ck < b_inst:
                nch = b_inst // ck
                args = jax.tree.map(
                    lambda a: a.reshape(nch, ck, *a.shape[1:]),
                    (x0, gt_inst, gt_neg, t_inst),
                )
                num, den = jax.lax.map(lambda a: branch(*a), args)
                num, den = jnp.sum(num), jnp.sum(den)
            else:
                num, den = branch(x0, gt_inst, gt_neg, t_inst)
            id_loss = num / jnp.maximum(den, 1.0)
            loss = loss + id_loss
            metrics["id_loss"] = id_loss

        metrics["loss"] = loss
        return loss, metrics

    return loss_fn


def make_train_step(
    cfg: IDBoothConfig,
    models: ModelBundle,
    optimizer,
    schedule: Optional[DDPMSchedule] = None,
    policy: Policy = DEFAULT_POLICY,
    detect_fn: Callable = full_image_boxes,
    donate: bool = True,
):
    """Returns jitted `train_step(trainable, opt_state, frozen, batch, key)
    -> (trainable, opt_state, metrics)`. Under a mesh, shard `batch` over
    the data axis and replicate params — gradient psum is jit-implicit
    (replacing `accelerator.backward`'s DDP all-reduce,
    `train_ID-Booth.py:1140`)."""
    if schedule is None:
        schedule = make_ddpm()
    loss_fn = make_loss_fn(cfg, models, schedule, policy, detect_fn)

    @functools.partial(_options_jit, donate_argnums=(0, 1) if donate else ())
    def train_step(trainable, opt_state, frozen, batch, key):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, metrics), grads = grad_fn(trainable, frozen, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return trainable, opt_state, metrics

    return train_step


def init_trainable(key: jax.Array, cfg: IDBoothConfig, models: ModelBundle, unet_params, text_params=None):
    """Fresh LoRA pytrees (gaussian A, zero B — `train_ID-Booth.py:676`)."""
    k1, k2 = jax.random.split(key)
    trainable = {"unet_lora": unet2d.init_lora(k1, unet_params, rank=cfg.lora_rank)}
    if cfg.train_text_encoder and text_params is not None:
        text_lora = {}
        # thread the split key so cfg.seed governs text-LoRA init and every
        # layer/projection draws from an independent stream
        keys = jax.random.split(k2, len(text_params["layers"]) * 4)
        for i, layer in enumerate(text_params["layers"]):
            text_lora[f"layer_{i}"] = {}
            for j, name in enumerate(("q", "k", "v", "out")):
                w = layer[name]["w"]
                a = jax.random.normal(keys[i * 4 + j], (cfg.lora_rank, w.shape[1])) / cfg.lora_rank
                text_lora[f"layer_{i}"][name] = {
                    "a": a,
                    "b": jnp.zeros((w.shape[0], cfg.lora_rank)),
                }
        trainable["text_lora"] = text_lora
    return trainable
