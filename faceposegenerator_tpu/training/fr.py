"""Face-recognition (FR) trainer: IResNet backbone + margin head.

Behavioral rebuild of `FR_training/train_FR.py:61-377`: trains
iresnet18/50(+dropout) with an ArcFace/CosFace/ElasticCosFace/AdaFace head
on flat-directory synthetic face datasets (label = filename prefix before
"_", `FR_training/utils/dataset.py:241-279`), dual SGD with lr
0.1/512·batch, momentum 0.9, weight decay 5e-4, grad-clip 5, step or
plateau LR schedule, per-epoch LFW-bin verification callback with
best-model tracking and early stop after `early_stop_patience` stagnant
epochs (`train_FR.py:197-223,267-318,344-358`).

TPU design: the whole step (backbone fwd/bwd incl. BN state, head, CE, SGD)
is ONE jitted function; under a mesh the batch shards over "data" and BN
statistics psum-sync across replicas (`axis_name` in
`ops.norms.batch_norm_train`) — strictly stronger than the reference's
unsynced per-GPU BN.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.config import ConfigBase
from ..core.compile import jit as _options_jit
from ..core.precision import Policy, DEFAULT_POLICY
from ..models import iresnet
from . import losses as L


@dataclasses.dataclass
class FRConfig(ConfigBase):
    """Parameter surface of `FR_training/config/FR_config.py`."""

    network: str = "iresnet50"
    embedding_size: int = 512
    dropout: float = 0.4
    batch_size: int = 128
    num_classes: int = 100
    loss: str = "AdaFace"  # ArcFace | CosFace | ElasticCosFace | AdaFace
    s: float = 64.0
    m: float = 0.35
    # NOTE the reference instantiates AdaFace with its *defaults* (m=0.4,
    # h=0.333, s=64) despite cfg.s/m — `train_FR.py:176`, SURVEY.md appendix.
    momentum: float = 0.9
    weight_decay: float = 5e-4
    base_lr: float = 0.1  # lr = base_lr / 512 * batch_size (train_FR.py:199)
    max_grad_norm: float = 5.0
    num_epochs: int = 200
    lr_steps: Tuple[int, ...] = (22, 30, 35)  # epoch milestones, ×0.1
    lr_schedule: str = "plateau"  # "step" | "plateau" (ReduceLROnPlateau(max))
    plateau_patience: int = 2
    plateau_factor: float = 0.1
    early_stop_patience: int = 6
    val_targets: Tuple[str, ...] = ("lfw",)
    seed: int = 0
    models: Tuple[str, ...] = ("DreamBooth", "PortraitBooth", "ID-Booth")

    @property
    def lr(self) -> float:
        return self.base_lr / 512.0 * self.batch_size


def backbone_config(cfg: FRConfig) -> iresnet.IResNetConfig:
    name = {"iresnet18": "r18", "iresnet34": "r34", "iresnet50": "r50", "iresnet100": "r100"}[
        cfg.network
    ]
    return iresnet.config_for(name, num_features=cfg.embedding_size, dropout=cfg.dropout)


def init_train_state(key: jax.Array, cfg: FRConfig):
    """Returns (params, state). params = {backbone, kernel}; state = {bn,
    adaface} (adaface EMA present only for the AdaFace head)."""
    kb, kk = jax.random.split(key)
    bcfg = backbone_config(cfg)
    bparams, bstate = iresnet.init(kb, bcfg)
    kernel = L.init_kernel(
        kk, cfg.embedding_size, cfg.num_classes,
        kind="uniform" if cfg.loss == "AdaFace" else "normal",
    )
    params = {"backbone": bparams, "kernel": kernel}
    state = {"bn": bstate}
    if cfg.loss == "AdaFace":
        state["adaface"] = L.adaface_init_state()
    return params, state


def make_optimizer(cfg: FRConfig, steps_per_epoch: int = 1):
    """Dual-group SGD (backbone+header share hyperparams in the reference).
    `inject_hyperparams` exposes the LR so the host-side plateau scheduler
    can scale it without recompiling."""
    if cfg.lr_schedule == "step":
        boundaries = {e * steps_per_epoch: cfg.plateau_factor for e in cfg.lr_steps}
        schedule = optax.piecewise_constant_schedule(cfg.lr, boundaries)
        return optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(schedule, momentum=cfg.momentum),
        )
    return optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(learning_rate, momentum=cfg.momentum),
        )
    )(learning_rate=cfg.lr)


class PlateauScheduler:
    """ReduceLROnPlateau(mode="max") equivalent (`train_FR.py:208-214`)."""

    def __init__(self, cfg: FRConfig):
        self.best = -float("inf")
        self.bad_epochs = 0
        self.cfg = cfg
        self.scale = 1.0

    def update(self, metric: float) -> float:
        if metric > self.best:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.cfg.plateau_patience:
                self.scale *= self.cfg.plateau_factor
                self.bad_epochs = 0
        return self.scale

    def set_lr(self, opt_state, base_lr: float):
        opt_state.hyperparams["learning_rate"] = jnp.asarray(base_lr * self.scale)
        return opt_state


def make_train_step(
    cfg: FRConfig,
    optimizer,
    policy: Policy = DEFAULT_POLICY,
    axis_name: Optional[str] = None,
    donate: bool = True,
):
    bcfg = backbone_config(cfg)

    def loss_fn(params, state, batch, key):
        emb_raw, new_bn = iresnet.apply(
            params["backbone"], state["bn"], batch["images"], bcfg,
            policy=policy, train=True, dropout_key=key, axis_name=axis_name,
        )
        labels = batch["labels"]
        new_state = {"bn": new_bn}
        if cfg.loss == "AdaFace":
            norms = jnp.linalg.norm(emb_raw, axis=1)
            emb = emb_raw / jnp.maximum(norms[:, None], 1e-12)
            logits, new_ada = L.adaface_logits(
                params["kernel"], emb, norms, labels, state["adaface"],
                L.AdaFaceConfig(),  # reference uses AdaFace defaults
            )
            new_state["adaface"] = new_ada
        elif cfg.loss == "ArcFace":
            logits = L.arcface_logits(params["kernel"], emb_raw, labels, cfg.s, cfg.m)
        elif cfg.loss == "CosFace":
            logits = L.cosface_logits(params["kernel"], emb_raw, labels, cfg.s, cfg.m)
        elif cfg.loss == "ElasticCosFace":
            logits = L.elastic_cosface_logits(
                params["kernel"], emb_raw, labels, jax.random.fold_in(key, 1),
                cfg.s, cfg.m,
            )
        else:
            raise ValueError(cfg.loss)
        loss = L.cross_entropy(logits, labels)
        acc = jnp.mean((jnp.argmax(logits, axis=1) == labels).astype(jnp.float32))
        return loss, (new_state, {"loss": loss, "train_acc": acc})

    @functools.partial(_options_jit, donate_argnums=(0, 2) if donate else ())
    def train_step(params, state, opt_state, batch, key):
        (loss, (new_state, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, state, batch, key
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, metrics

    return train_step


_EMBED_CACHE: dict = {}


def make_embed_fn(cfg: FRConfig, params, state, policy: Policy = DEFAULT_POLICY):
    """Inference embed function for the verification callback
    (`CallBackVerification`, `FR_training/utils/utils_callbacks.py:13`).

    Params/state are jit *arguments* (not baked-in constants) and the jitted
    function is cached per (network, policy) — per-epoch callbacks reuse one
    compiled program instead of recompiling with each new weight snapshot."""
    bcfg = backbone_config(cfg)
    cache_key = (bcfg, policy)
    if cache_key not in _EMBED_CACHE:

        @jax.jit
        def embed_impl(params, state, images):
            emb, _ = iresnet.apply(
                params["backbone"], state["bn"], images, bcfg, policy=policy, train=False
            )
            return emb

        _EMBED_CACHE[cache_key] = embed_impl
    embed_impl = _EMBED_CACHE[cache_key]

    def embed(images):
        return embed_impl(params, state, images)

    return embed
