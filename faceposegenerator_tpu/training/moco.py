"""MoCo momentum-contrast builder (legacy-parity component).

Behavioral rebuild of `FR_training/moco/builder.py` (SURVEY.md §2.3 —
legacy in the reference; only its GaussianBlur transform touches the live
path): query/key encoders with EMA momentum update, a FIFO negative queue,
InfoNCE logits with temperature, and the DDP batch-shuffle trick
(`builder.py:212-256`) expressed TPU-natively — `jax.lax.all_gather` +
permutation over the mesh "data" axis instead of torch.distributed
broadcast/all_gather (`:356-366`).

Functional surface:
    state = init_moco(key, encoder_init, dim, queue_size)
    loss, new_state, metrics = moco_step(state, encoder_apply, q_imgs, k_imgs, ...)
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MoCoConfig:
    dim: int = 128
    queue_size: int = 65536
    momentum: float = 0.999
    temperature: float = 0.07


def init_moco(key: jax.Array, encoder_init: Callable, cfg: MoCoConfig = MoCoConfig()):
    """encoder_init(key) -> encoder params (query encoder). The key encoder
    starts as a copy (`builder.py` param copy + requires_grad=False)."""
    kq, kqueue = jax.random.split(key)
    params_q = encoder_init(kq)
    params_k = jax.tree.map(jnp.copy, params_q)
    queue = jax.random.normal(kqueue, (cfg.dim, cfg.queue_size))
    queue = queue / jnp.linalg.norm(queue, axis=0, keepdims=True)
    return {
        "params_q": params_q,
        "params_k": params_k,
        "queue": queue,
        "queue_ptr": jnp.zeros((), jnp.int32),
    }


def momentum_update(params_q, params_k, momentum: float):
    return jax.tree.map(lambda k, q: momentum * k + (1 - momentum) * q, params_k, params_q)


def shuffle_bn(x: jax.Array, key: jax.Array, axis_name: Optional[str] = None):
    """Batch-shuffle for BN (`builder.py:212-239`): across the data axis when
    inside shard_map/pmap, otherwise within the local batch. Returns
    (shuffled, unshuffle_indices)."""
    n = x.shape[0]
    perm = jax.random.permutation(key, n)
    inv = jnp.argsort(perm)
    if axis_name is not None:
        # gather the global batch, permute globally, take back our shard
        world = jax.lax.psum(1, axis_name)
        rank = jax.lax.axis_index(axis_name)
        gathered = jax.lax.all_gather(x, axis_name).reshape((-1,) + x.shape[1:])
        gperm = jax.random.permutation(key, gathered.shape[0])
        ginv = jnp.argsort(gperm)
        shard = jax.lax.dynamic_slice_in_dim(gathered[gperm], rank * n, n)
        return shard, (gperm, ginv)
    return x[perm], (perm, inv)


def moco_loss(
    state: dict,
    encoder_apply: Callable,
    q_images: jax.Array,
    k_images: jax.Array,
    cfg: MoCoConfig = MoCoConfig(),
) -> Tuple[jax.Array, dict]:
    """InfoNCE with queue negatives; returns (loss, aux) where aux carries
    the key embeddings for the queue update."""
    q = encoder_apply(state["params_q"], q_images)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    k = jax.lax.stop_gradient(encoder_apply(state["params_k"], k_images))
    k = k / jnp.maximum(jnp.linalg.norm(k, axis=1, keepdims=True), 1e-12)

    l_pos = jnp.sum(q * k, axis=1, keepdims=True)  # (B, 1)
    l_neg = q @ state["queue"]  # (B, K)
    logits = jnp.concatenate([l_pos, l_neg], axis=1) / cfg.temperature
    labels = jnp.zeros(q.shape[0], jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=1)
    loss = -jnp.mean(logp[:, 0])
    acc = jnp.mean((jnp.argmax(logits, axis=1) == labels).astype(jnp.float32))
    return loss, {"keys": k, "acc": acc}


def dequeue_and_enqueue(state: dict, keys: jax.Array, cfg: MoCoConfig = MoCoConfig(), axis_name: Optional[str] = None):
    """FIFO queue update (`builder.py:160-176`); keys are all-gathered
    across the data axis first when running sharded (`concat_all_gather`)."""
    if axis_name is not None:
        keys = jax.lax.all_gather(keys, axis_name).reshape(-1, keys.shape[-1])
    b = keys.shape[0]
    ptr = state["queue_ptr"]
    idx = (ptr + jnp.arange(b)) % cfg.queue_size
    queue = state["queue"].at[:, idx].set(keys.T)
    return {**state, "queue": queue, "queue_ptr": (ptr + b) % cfg.queue_size}


def moco_step(
    state: dict,
    encoder_apply: Callable,
    optimizer,
    opt_state,
    q_images: jax.Array,
    k_images: jax.Array,
    cfg: MoCoConfig = MoCoConfig(),
    axis_name: Optional[str] = None,
):
    def loss_fn(params_q):
        return moco_loss({**state, "params_q": params_q}, encoder_apply, q_images, k_images, cfg)

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state["params_q"])
    if axis_name is not None:
        grads = jax.lax.pmean(grads, axis_name)
    import optax

    updates, opt_state = optimizer.update(grads, opt_state, state["params_q"])
    params_q = optax.apply_updates(state["params_q"], updates)
    params_k = momentum_update(params_q, state["params_k"], cfg.momentum)
    state = dequeue_and_enqueue(
        {**state, "params_q": params_q, "params_k": params_k}, aux["keys"], cfg, axis_name
    )
    return loss, state, opt_state, {"acc": aux["acc"]}
