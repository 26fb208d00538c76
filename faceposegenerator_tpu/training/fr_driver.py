"""FR training / testing drivers.

Behavioral rebuild of `FR_training/train_FR.py` / `test_FR.py`:
  - loops `cfg.models` generator variants (DreamBooth / PortraitBooth /
    ID-Booth), seeding each run with its index (`train_FR.py:68-71`);
  - skip-if-done markers: a run whose `best_backbone.npz` exists is skipped
    (`:107-111`), matching the reference's guard rails (SURVEY.md §5);
  - per-epoch verification callback on the configured benchmark bins with
    highest-accuracy tracking (`CallBackVerification`,
    `utils_callbacks.py:13`), plateau or step LR schedule, early stop after
    `early_stop_patience` stagnant epochs (`:344-358`);
  - `test_fr_run`: load best backbone, evaluate every benchmark, dump
    per-benchmark + average accuracy JSON (`test_FR.py:52-201`).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from ..core.checkpointing import load_pytree, save_pytree
from ..core.config import snapshot_config
from ..core.logging_utils import ThroughputLogger, setup_logging
from ..core.precision import Policy, DEFAULT_POLICY
from ..core.rng import train_step_key
from ..data.fr_dataset import FlatDirDataset, prefetch
from ..evaluation import verification
from . import fr


def train_fr_run(
    cfg: fr.FRConfig,
    dataset: FlatDirDataset,
    output_dir: str,
    val_bins: Optional[Dict[str, Tuple[np.ndarray, np.ndarray]]] = None,
    policy: Policy = DEFAULT_POLICY,
    seed: int = 0,
    logger=None,
    max_steps_per_epoch: Optional[int] = None,
    checkpoint_every_epoch: bool = False,
    mesh=None,
    num_hosts: int = 1,
    host_id: int = 0,
) -> Dict:
    """One FR training run. val_bins: {benchmark: (images, issame)}.

    `checkpoint_every_epoch` saves backbone+header each epoch alongside the
    best-model file (`CallBackModelCheckpointOld`,
    `FR_training/utils/utils_callbacks.py:209-239`).

    `mesh`: optional DP mesh — params replicated, batches sharded over
    "data" (`core.mesh.form_global_batch`); with `num_hosts`/`host_id` each
    host loads only its row slice of every global batch (the reference gets
    this from Accelerate, `train_FR.py:227-229`). `cfg.batch_size` is the
    PER-HOST batch."""
    logger = logger or setup_logging(output_dir)
    best_path = os.path.join(output_dir, "best_backbone.npz")
    if os.path.exists(best_path):
        logger.info(f"skip: {best_path} exists (reference skip-if-done)")
        return {"skipped": True}

    os.makedirs(output_dir, exist_ok=True)
    cfg = cfg.replace(num_classes=dataset.num_classes)
    snapshot_config(cfg, output_dir, "fr_config.json")

    params, state = fr.init_train_state(jax.random.key(seed), cfg)
    global_batch = cfg.batch_size * max(num_hosts, 1)
    steps_per_epoch = max(len(dataset) // global_batch, 1)
    optimizer = fr.make_optimizer(cfg, steps_per_epoch)
    opt_state = optimizer.init(params)
    step_fn = fr.make_train_step(cfg, optimizer, policy=policy, donate=False)
    plateau = fr.PlateauScheduler(cfg) if cfg.lr_schedule == "plateau" else None
    if mesh is not None:
        from ..core.mesh import replicate as _replicate

        params = _replicate(mesh, params)
        state = _replicate(mesh, state)
        opt_state = _replicate(mesh, opt_state)

    base_key = jax.random.key(seed)
    throughput = ThroughputLogger(frequency=100, logger=logger)
    best_acc, stagnant, global_step = -1.0, 0, 0
    history: List[Dict] = []

    for epoch in range(cfg.num_epochs):
        batch_iter = dataset.batches(
            cfg.batch_size, num_shards=max(num_hosts, 1), shard_index=host_id,
            epoch=epoch, order_seed=seed,
        ) if (mesh is not None or num_hosts > 1) else dataset.batches(cfg.batch_size)
        for i, batch in enumerate(prefetch(batch_iter)):
            if max_steps_per_epoch and i >= max_steps_per_epoch:
                break
            if mesh is not None:
                from ..core.mesh import form_global_batch

                batch = form_global_batch(mesh, batch)
            params, state, opt_state, metrics = step_fn(
                params, state, opt_state, batch, train_step_key(base_key, global_step)
            )
            global_step += 1
            throughput(global_step, cfg.batch_size, {"loss": float(metrics["loss"])})

        if checkpoint_every_epoch:
            save_pytree(
                {"params": params, "state": state},
                os.path.join(output_dir, f"epoch_{epoch}_backbone.npz"),
            )

        # verification callback (rank-0 semantics are implicit single-ctrl)
        epoch_acc = None
        if val_bins:
            embed = fr.make_embed_fn(cfg, params, state, policy)
            accs = {}
            for name, data in val_bins.items():
                acc, acc_std, xnorm, *_ = verification.test(data, embed)
                accs[name] = acc
                logger.info(f"epoch {epoch} [{name}] acc={acc:.4f}±{acc_std:.4f} xnorm={xnorm:.2f}")
            epoch_acc = float(np.mean(list(accs.values())))
            history.append({"epoch": epoch, "acc": epoch_acc, **accs})
            if plateau is not None:
                plateau.update(epoch_acc)
                opt_state = plateau.set_lr(opt_state, cfg.lr)
            if epoch_acc > best_acc:
                best_acc = epoch_acc
                stagnant = 0
                save_pytree({"params": params, "state": state}, best_path)
            else:
                stagnant += 1
                if stagnant >= cfg.early_stop_patience:
                    logger.info(f"early stop at epoch {epoch} (best {best_acc:.4f})")
                    break
        else:
            save_pytree({"params": params, "state": state}, best_path)

    with open(os.path.join(output_dir, "history.json"), "w") as f:
        json.dump(history, f, indent=2)
    return {"best_acc": best_acc, "history": history, "skipped": False}


def train_fr_sweep(
    cfg: fr.FRConfig,
    dataset_roots: Dict[str, str],
    output_root: str,
    val_bins=None,
    augment=None,
    output_prefix: str = "REC_",
    **kw,
):
    """Loop over generator variants (`cfg.models`), one run each, seed = run
    index (`train_FR.py:68-71`). The augmented (real+synth) variant uses
    `output_prefix="REC_TFD+Synth_"` (`train_FR_Augmented.py`,
    `test_FR_Augmented.py:33,91`)."""
    results = {}
    for run_idx, model_name in enumerate(cfg.models):
        root = dataset_roots.get(model_name)
        if root is None or not os.path.isdir(root):
            continue
        dataset = FlatDirDataset(root, augment=augment, seed=run_idx)
        out = os.path.join(output_root, f"{output_prefix}{model_name}")
        results[model_name] = train_fr_run(
            cfg, dataset, out, val_bins=val_bins, seed=run_idx, **kw
        )
    return results


def test_fr_run(
    cfg: fr.FRConfig,
    backbone_path: str,
    benchmarks: Dict[str, Tuple[np.ndarray, np.ndarray]],
    output_json: Optional[str] = None,
    policy: Policy = DEFAULT_POLICY,
) -> Dict:
    """Load `best_backbone.npz`, run every benchmark, dump per-benchmark +
    average accuracy JSON (`test_FR.py:52-201`)."""
    params, state = fr.init_train_state(jax.random.key(0), cfg)
    restored = load_pytree({"params": params, "state": state}, backbone_path)
    embed = fr.make_embed_fn(cfg, restored["params"], restored["state"], policy)

    results: Dict = {}
    for name, data in benchmarks.items():
        acc, acc_std, xnorm, val, val_std, far = verification.test(data, embed)
        results[name] = {
            "accuracy": acc, "accuracy_std": acc_std, "xnorm": xnorm,
            "val": val, "val_std": val_std, "far": far,
        }
    results["average_accuracy"] = float(
        np.mean([v["accuracy"] for v in results.values() if isinstance(v, dict)])
    )
    if output_json:
        os.makedirs(os.path.dirname(output_json) or ".", exist_ok=True)
        with open(output_json, "w") as f:
            json.dump(results, f, indent=2)
    return results
