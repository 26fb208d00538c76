"""Checkpoint / resume.

Reference behavior (`train_ID-Booth.py:696-766,928-956,1181-1206`):
  - `checkpoint-{epoch}-{global_step}` directories every
    `checkpointing_epochs`, pruned to `checkpoints_total_limit` oldest-first;
  - LoRA-only state saved as diffusers-format
    `pytorch_lora_weights.safetensors` (via the save hooks);
  - resume "latest" picks the highest step by parsing directory names.

Here each checkpoint directory holds:
  - `state.ckpt/` — orbax tree of {trainable, opt_state, epoch, global_step}
  - `pytorch_lora_weights.safetensors` — the interchange artifact the
    reference's `pipe.load_lora_weights` consumes (`inference_ID-Booth.py:107`)
"""

from __future__ import annotations

import os
import re
import shutil
from typing import List, Optional, Tuple

import jax
import numpy as np

_CKPT_RE = re.compile(r"^checkpoint-(\d+)-(\d+)$")


def _path_key(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    if hasattr(p, "name"):
        return str(p.name)
    return str(p)


def _flatten_with_paths(tree) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        flat["/".join(_path_key(p) for p in path)] = np.asarray(leaf)
    return flat


def save_pytree(tree, path: str):
    """Save a pytree as a flat .npz keyed by tree path (portable, no orbax
    directory-layout lock-in; loads with the tree itself as template)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **_flatten_with_paths(tree))


def load_pytree(template, path: str):
    import jax.numpy as jnp

    data = np.load(path)
    leaves_paths = jax.tree_util.tree_flatten_with_path(template)
    leaves = [
        jnp.asarray(data["/".join(_path_key(q) for q in p)]) for p, _ in leaves_paths[0]
    ]
    return jax.tree_util.tree_unflatten(leaves_paths[1], leaves)


class CheckpointManager:
    def __init__(self, output_dir: str, total_limit: Optional[int] = None):
        self.output_dir = output_dir
        self.total_limit = total_limit
        os.makedirs(output_dir, exist_ok=True)

    def list_checkpoints(self) -> List[Tuple[int, int, str]]:
        """[(epoch, step, path)] sorted by step ascending."""
        out = []
        for name in os.listdir(self.output_dir):
            m = _CKPT_RE.match(name)
            if m:
                out.append((int(m.group(1)), int(m.group(2)), os.path.join(self.output_dir, name)))
        return sorted(out, key=lambda x: x[1])

    def save(self, epoch: int, global_step: int, trainable, opt_state, lora_for_export=None):
        path = os.path.join(self.output_dir, f"checkpoint-{epoch}-{global_step}")
        os.makedirs(path, exist_ok=True)
        save_pytree({"trainable": trainable, "opt_state": opt_state}, os.path.join(path, "state.npz"))
        with open(os.path.join(path, "META"), "w") as f:
            f.write(f"{epoch} {global_step}\n")
        if lora_for_export is not None:
            from ..diffusion.lora_io import save_lora_safetensors

            save_lora_safetensors(
                lora_for_export, os.path.join(path, "pytorch_lora_weights.safetensors")
            )
        self._prune()
        return path

    def _prune(self):
        if self.total_limit is None:
            return
        ckpts = self.list_checkpoints()
        while len(ckpts) > self.total_limit:
            _, _, path = ckpts.pop(0)
            shutil.rmtree(path, ignore_errors=True)

    def latest(self) -> Optional[str]:
        ckpts = self.list_checkpoints()
        return ckpts[-1][2] if ckpts else None

    def restore(self, path: str, trainable_template, opt_state_template):
        state = load_pytree(
            {"trainable": trainable_template, "opt_state": opt_state_template},
            os.path.join(path, "state.npz"),
        )
        m = _CKPT_RE.match(os.path.basename(path))
        epoch, step = int(m.group(1)), int(m.group(2))
        return state["trainable"], state["opt_state"], epoch, step
