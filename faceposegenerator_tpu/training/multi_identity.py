"""Multi-identity vmapped ID-Booth training: K fine-tunes in ONE program.

The reference trains one identity per full fine-tune and loops identities
serially (`train_ID-Booth.py:1324-1334`), so its hot loop runs at the tiny
per-identity batch (bs 1–2 + prior, `configs/config_train_SD21.py:49`). On
TPU that batch is the throughput problem: the 512² VAE/UNet convs run at
~25% MFU at the reference op point vs ~55% when the same programs see
batch 8 (STATUS.md train roofline) — the MXU is starved, not the kernels.

The TPU-native fix is to train K identities SIMULTANEOUSLY: `jax.vmap` the
per-identity train step over stacked LoRA + optimizer-state pytrees with
the frozen base weights broadcast (`in_axes=(0, 0, None, 0, 0)`). XLA turns
the vmapped convs/matmuls into single ops over an effective batch of
K×(inst+prior) — MXU utilization of the big-batch program — while the
semantics stay EXACTLY K independent fine-tunes:

  - each identity has its own LoRA, its own AdamW/cosine-schedule state,
    its own global-norm gradient clip, and its own loss composition;
  - no gradient or statistic crosses the identity axis (vmap guarantees
    it structurally — there is no collective to forget);
  - per-identity checkpoints/exports keep the reference's directory and
    naming contract, so downstream sweep/eval tooling cannot tell the
    difference.

The stacked identity axis is also the natural multi-chip axis: sharding it
over the mesh "data" axis data-parallelizes the sweep with ZERO gradient
all-reduce (identities are independent), unlike batch-DP of one identity.
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.compile import jit as _options_jit
from ..core.precision import Policy, DEFAULT_POLICY
from ..core.rng import train_step_key
from ..diffusion.schedulers import DDPMSchedule, make_ddpm
from . import idbooth


def stack_pytrees(trees: Sequence):
    """Stack K same-structure pytrees leafwise into one pytree whose leaves
    carry a leading identity axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def shard_identity_axis(mesh, tree):
    """Place stacked per-identity pytrees with the leading identity axis
    sharded over the mesh "data" axis.

    Identities are INDEPENDENT programs, so this data-parallelizes the
    experiment sweep with ZERO gradient collectives — unlike batch-DP of a
    single identity, where every step all-reduces the grads. jit infers the
    sharded vmapped step from the input placement alone.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..core.mesh import DATA_AXIS

    s = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def unstack_pytree(tree, k: int) -> List:
    """Inverse of `stack_pytrees`: split the leading identity axis."""
    return [jax.tree.map(lambda x: x[i], tree) for i in range(k)]


def make_multi_train_step(
    cfg: idbooth.IDBoothConfig,
    models: idbooth.ModelBundle,
    optimizer,
    schedule: Optional[DDPMSchedule] = None,
    policy: Policy = DEFAULT_POLICY,
    detect_fn: Callable = idbooth.full_image_boxes,
    donate: bool = True,
):
    """Jitted `multi_step(trainables, opt_states, frozen, batches, keys) ->
    (trainables, opt_states, metrics)` over a leading identity axis K.

    trainables/opt_states: stacked per-identity pytrees (leading axis K);
    frozen: ONE set of base weights, broadcast (closed over by vmap);
    batches: per-identity batches stacked to (K, 2B, ...); keys: (K,) PRNG
    keys (per-identity noise/timestep streams). metrics leaves are (K,).
    """
    if schedule is None:
        schedule = make_ddpm()
    loss_fn = idbooth.make_loss_fn(cfg, models, schedule, policy, detect_fn)

    def one_step(trainable, opt_state, frozen, batch, key):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, metrics), grads = grad_fn(trainable, frozen, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return trainable, opt_state, metrics

    vstep = jax.vmap(one_step, in_axes=(0, 0, None, 0, 0))

    @functools.partial(_options_jit, donate_argnums=(0, 1) if donate else ())
    def multi_step(trainables, opt_states, frozen, batches, keys):
        return vstep(trainables, opt_states, frozen, batches, keys)

    return multi_step


def run_identities_vmapped(
    cfg: idbooth.IDBoothConfig,
    bundle: idbooth.ModelBundle,
    frozen: Dict,
    instance_dirs: Sequence[str],
    output_dirs: Sequence[str],
    tokenizer=None,
    embeds_dirs: Optional[Sequence[Optional[str]]] = None,
    class_dir: Optional[str] = None,
    policy: Policy = DEFAULT_POLICY,
    detect_fn: Callable = idbooth.full_image_boxes,
    resume: bool = True,
    instance_ids: Optional[np.ndarray] = None,
    class_ids: Optional[np.ndarray] = None,
    logger=None,
    mesh=None,
) -> Tuple[List[Dict], List[List[Dict]]]:
    """Fine-tune K identities concurrently; returns (trainables, histories).

    Drop-in replacement for K serial `idbooth_driver.run_identity` calls
    with identical per-identity semantics and on-disk artifacts
    (checkpoint-{epoch}-{step} dirs, final pytorch_lora_weights.safetensors
    per identity). All identities must yield the same number of steps per
    epoch (same image count quotient) so they share one LR schedule/compiled
    program — the driver-side `run_experiment_sweep(vmap_identities=…)`
    groups identities accordingly.

    `mesh`: optional `jax.sharding.Mesh` — the identity axis shards over
    "data" (`shard_identity_axis`), frozen base weights replicate once; K
    must divide the data-axis size. Zero collectives in the step.
    """
    from ..core.checkpointing import CheckpointManager
    from ..core.logging_utils import setup_logging, ThroughputLogger
    from ..data.dreambooth import DreamBoothDataset
    from ..diffusion.lora_io import save_lora_safetensors

    K = len(instance_dirs)
    assert len(output_dirs) == K
    if embeds_dirs is None:
        embeds_dirs = [None] * K
    logger = logger or setup_logging(output_dirs[0])
    if instance_ids is None:
        instance_ids = tokenizer([cfg.instance_prompt])[0]
    if class_ids is None and cfg.with_prior_preservation:
        class_ids = tokenizer([cfg.class_prompt])[0]

    datasets = [
        DreamBoothDataset(
            instance_dirs[i], instance_ids,
            class_dir=class_dir if cfg.with_prior_preservation else None,
            class_ids=class_ids,
            embeds_dir=embeds_dirs[i],
            resolution=cfg.resolution,
            seed=cfg.seed,
            embed_dim=bundle.arcface_cfg.num_features,
        )
        for i in range(K)
    ]
    spe = {len(ds) // cfg.train_batch_size for ds in datasets}
    if len(spe) != 1:
        raise ValueError(
            f"identities must share steps_per_epoch to share one compiled "
            f"program/LR schedule; got sizes {[len(d) for d in datasets]} at "
            f"batch {cfg.train_batch_size} — group identities by size"
        )
    steps_per_epoch = max(spe.pop(), 1)
    total_steps = steps_per_epoch * cfg.num_train_epochs

    # same init for every identity — matches serial runs, which all start
    # from jax.random.key(cfg.seed) (`train_ID-Booth.py` reseeds per run)
    one_trainable = idbooth.init_trainable(
        jax.random.key(cfg.seed), cfg, bundle, frozen["unet"],
        frozen.get("text_encoder"),
    )
    optimizer = idbooth.make_optimizer(cfg, total_steps)
    one_opt = optimizer.init(one_trainable)

    ckpts = [CheckpointManager(d, cfg.checkpoints_total_limit) for d in output_dirs]
    first_epoch, global_step = 0, 0
    per_id_trainables, per_id_opts, resumed = [], [], set()
    for i in range(K):
        t_i, o_i = one_trainable, one_opt
        if resume and ckpts[i].latest():
            t_i, o_i, ep, gs = ckpts[i].restore(ckpts[i].latest(), t_i, o_i)
            resumed.add((ep + 1, gs))
            first_epoch, global_step = ep + 1, gs
        per_id_trainables.append(t_i)
        per_id_opts.append(o_i)
    if resume and resumed and (len(resumed) != 1 or any(
        not c.latest() for c in ckpts
    )):
        raise ValueError(
            "identities in one vmapped group must resume from the same "
            "(epoch, step) — re-group, or finish the stragglers serially "
            f"(found {sorted(resumed)}, with "
            f"{sum(1 for c in ckpts if not c.latest())} unstarted)"
        )
    trainables = stack_pytrees(per_id_trainables)
    opt_states = stack_pytrees(per_id_opts)
    if mesh is not None:
        from ..core.mesh import DATA_AXIS, replicate

        n_data = mesh.shape[DATA_AXIS]
        if K % n_data != 0:
            raise ValueError(
                f"vmapped identity group K={K} must divide the mesh data "
                f"axis ({n_data}) — pad the group or change vmap_identities"
            )
        trainables = shard_identity_axis(mesh, trainables)
        opt_states = shard_identity_axis(mesh, opt_states)
        frozen = replicate(mesh, frozen)

    multi_step = make_multi_train_step(
        cfg, bundle, optimizer, make_ddpm(), policy=policy, detect_fn=detect_fn
    )

    # serial `run_identity` seeds EVERY identity's noise/timestep stream
    # from jax.random.key(cfg.seed); keep that stream per identity so the
    # vmapped run is a bit-for-bit drop-in for K serial runs (identities
    # are independent programs — sharing the stream couples nothing)
    base_keys = [jax.random.key(cfg.seed) for _ in range(K)]
    throughput = ThroughputLogger(
        frequency=50, total_steps=total_steps, logger=logger
    )
    histories: List[List[Dict]] = [[] for _ in range(K)]

    for epoch in range(first_epoch, cfg.num_train_epochs):
        iters = [ds.batches(cfg.train_batch_size) for ds in datasets]
        sums = None
        count = 0
        for batch_tuple in zip(*iters):
            batches = stack_pytrees([
                jax.tree.map(jnp.asarray, b) for b in batch_tuple
            ])
            keys = jnp.stack(
                [train_step_key(base_keys[i], global_step) for i in range(K)]
            )
            if mesh is not None:
                batches = shard_identity_axis(mesh, batches)
                keys = shard_identity_axis(mesh, keys)
            trainables, opt_states, metrics = multi_step(
                trainables, opt_states, frozen, batches, keys
            )
            global_step += 1
            count += 1
            vals = {k: np.asarray(v) for k, v in metrics.items()}
            sums = vals if sums is None else {
                k: sums[k] + vals[k] for k in sums
            }
            throughput(global_step, cfg.train_batch_size * K, None)
        if count:
            for i in range(K):
                stats = {k: float(v[i]) / count for k, v in sums.items()}
                stats["epoch"] = epoch
                histories[i].append(stats)
            logger.info(
                f"epoch {epoch}: loss="
                + "/".join(f"{h[-1]['loss']:.4f}" for h in histories)
            )

        last = epoch == cfg.num_train_epochs - 1
        if (epoch + 1) % cfg.checkpointing_epochs == 0 or last:
            t_list = unstack_pytree(trainables, K)
            o_list = unstack_pytree(opt_states, K)
            for i in range(K):
                lora_export = {
                    "unet": t_list[i]["unet_lora"],
                    "text_encoder": t_list[i].get("text_lora"),
                }
                ckpts[i].save(epoch, global_step, t_list[i], o_list[i], lora_export)

    t_list = unstack_pytree(trainables, K)
    for i in range(K):
        save_lora_safetensors(
            {"unet": t_list[i]["unet_lora"], "text_encoder": t_list[i].get("text_lora")},
            os.path.join(output_dirs[i], "pytorch_lora_weights.safetensors"),
        )
    return t_list, histories
