"""IResNet (insightface-style ArcFace backbone) in functional JAX, NHWC.

Reference behavior: `ArcFace_files/backbones/iresnet.py:1-195` — stem
conv3x3→BN→PReLU, four stages of IBasicBlocks (BN→conv3x3→BN→PReLU→
conv3x3(stride)→BN with 1x1-conv+BN downsample), head BN2d→flatten→dropout→
fc(512·7·7→512)→BN1d whose affine weight is frozen at 1. Depths: r18
[2,2,2,2], r34 [3,4,6,3], r50 [3,4,14,3], r100 [3,13,30,3], r200 [6,26,60,3]
(registry `ArcFace_files/backbones/__init__.py:5-85`). The reference's fp16
autocast with fp32 head (`iresnet.py:149-160`) maps to bf16 compute with an
fp32 head under our precision policy.

Two run modes:
  - frozen (the locked ArcFace embedder, `prepare_locked_ArcFace_model`,
    `ArcFace_files/ArcFace_functions.py:27-36`): BN uses running stats,
    folded to scale+shift.
  - training (FR trainer `FR_training/train_FR.py:159-166` trains
    iresnet18/50 from scratch): batch statistics + running-stat state
    threading, optionally psum-synced over the mesh data axis.

Input: (B, 112, 112, 3) in [-1, 1]; output: (B, 512) embedding.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.precision import Policy, DEFAULT_POLICY
from ..ops.norms import batch_norm_inference, batch_norm_train
from .unet2d import conv2d


DEPTHS = {
    "r18": (2, 2, 2, 2),
    "r34": (3, 4, 6, 3),
    "r50": (3, 4, 14, 3),
    "r100": (3, 13, 30, 3),
    "r200": (6, 26, 60, 3),
    # deep variant trained with per-block activation checkpointing
    # (`ArcFace_files/backbones/iresnet2060.py:175`: layers [3,128,896,3])
    "r2060": (3, 128, 896, 3),
}
STAGE_PLANES = (64, 128, 256, 512)


@dataclasses.dataclass(frozen=True)
class IResNetConfig:
    depths: Sequence[int] = DEPTHS["r100"]
    num_features: int = 512
    dropout: float = 0.0
    fc_scale: int = 7 * 7
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1
    # SE attention in blocks — the FR-training backbone variant
    # (`FR_training/backbones/iresnet.py:27-90`: SEModule(planes, 16))
    use_se: bool = False
    se_reduction: int = 16
    # 4 for the VIS+NIR RGBN pipeline (`FR_training/utils/
    # verification_4channel.py`, `dataset.py` ArcBiFaceGANDataset_VISNIR)
    in_channels: int = 3
    # per-block rematerialisation (TPU equivalent of the reference's
    # `checkpoint_sequential` in iresnet2060)
    remat: bool = False


def config_for(name: str, **kw) -> IResNetConfig:
    return IResNetConfig(depths=DEPTHS[name], **kw)


def _conv_init(key, kh, kw, cin, cout, dtype):
    fan = kh * kw * cin
    w = jax.random.normal(key, (kh, kw, cin, cout), dtype) * (2.0 / fan) ** 0.5
    return {"w": w, "b": jnp.zeros((cout,), dtype)}


def _bn_init(c, dtype):
    return (
        {"g": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)},
        {"mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)},
    )


def init(key: jax.Array, cfg: IResNetConfig = IResNetConfig(), dtype=jnp.float32):
    """Returns (params, state) where state holds BN running stats."""
    keys = iter(jax.random.split(key, 4096))
    nk = lambda: next(keys)
    params, state = {}, {}

    params["conv1"] = _conv_init(nk(), 3, 3, cfg.in_channels, 64, dtype)
    params["bn1"], state["bn1"] = _bn_init(64, dtype)
    params["prelu1"] = jnp.full((64,), 0.25, dtype)

    cin = 64
    for s, (planes, depth) in enumerate(zip(STAGE_PLANES, cfg.depths)):
        blocks_p, blocks_s = [], []
        for b in range(depth):
            stride = 2 if b == 0 else 1
            bp, bs = {}, {}
            bp["bn1"], bs["bn1"] = _bn_init(cin, dtype)
            bp["conv1"] = _conv_init(nk(), 3, 3, cin, planes, dtype)
            bp["bn2"], bs["bn2"] = _bn_init(planes, dtype)
            bp["prelu"] = jnp.full((planes,), 0.25, dtype)
            bp["conv2"] = _conv_init(nk(), 3, 3, planes, planes, dtype)
            bp["bn3"], bs["bn3"] = _bn_init(planes, dtype)
            if stride != 1 or cin != planes:
                bp["down_conv"] = _conv_init(nk(), 1, 1, cin, planes, dtype)
                bp["down_bn"], bs["down_bn"] = _bn_init(planes, dtype)
            if cfg.use_se:
                r = max(planes // cfg.se_reduction, 1)
                bp["se_fc1"] = _conv_init(nk(), 1, 1, planes, r, dtype)
                bp["se_fc2"] = _conv_init(nk(), 1, 1, r, planes, dtype)
            blocks_p.append(bp)
            blocks_s.append(bs)
            cin = planes
        params[f"layer{s + 1}"] = blocks_p
        state[f"layer{s + 1}"] = blocks_s

    params["bn2"], state["bn2"] = _bn_init(512, dtype)
    fc_in = 512 * cfg.fc_scale
    params["fc"] = {
        "w": jax.random.normal(nk(), (cfg.num_features, fc_in), dtype) * (1.0 / fc_in) ** 0.5,
        "b": jnp.zeros((cfg.num_features,), dtype),
    }
    # features BN1d: affine weight frozen at 1 (reference iresnet.py:85-87)
    params["features_bn"], state["features_bn"] = _bn_init(cfg.num_features, dtype)
    return params, state


def _prelu(x, a):
    a = a.astype(x.dtype)
    return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


def _bn(x, p, s, train, cfg, axis_name):
    if train:
        out, nm, nv = batch_norm_train(
            x, p["g"], p["b"], s["mean"], s["var"],
            momentum=cfg.bn_momentum, eps=cfg.bn_eps, axis_name=axis_name,
        )
        return out, {"mean": nm, "var": nv}
    return batch_norm_inference(x, p["g"], p["b"], s["mean"], s["var"], cfg.bn_eps), s


def apply(
    params,
    state,
    images: jax.Array,
    cfg: IResNetConfig = IResNetConfig(),
    policy: Policy = DEFAULT_POLICY,
    train: bool = False,
    dropout_key: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
    return_features: bool = False,
) -> Tuple[jax.Array, dict]:
    """(B, 112, 112, 3) -> ((B, 512) fp32 embedding, new_state).

    With `return_features=True` also returns the flattened post-bn2 feature
    map (B, 512·7·7) — the input of both the embedding fc and CR-FIQA's
    quality head (`Evaluation/CR-FIQA/iresnet.py:123`)."""
    new_state = {}
    x = images.astype(policy.compute_dtype)
    x = conv2d(x, params["conv1"])
    x, new_state["bn1"] = _bn(x, params["bn1"], state["bn1"], train, cfg, axis_name)
    x = _prelu(x, params["prelu1"])

    for s in range(4):
        blocks_p = params[f"layer{s + 1}"]
        blocks_s = state[f"layer{s + 1}"]
        new_blocks = []
        for b, (bp, bs) in enumerate(zip(blocks_p, blocks_s)):
            stride = 2 if b == 0 else 1

            def block_fn(x, bp=bp, bs=bs, stride=stride):
                nbs = {}
                identity = x
                h, nbs["bn1"] = _bn(x, bp["bn1"], bs["bn1"], train, cfg, axis_name)
                h = conv2d(h, bp["conv1"])
                h, nbs["bn2"] = _bn(h, bp["bn2"], bs["bn2"], train, cfg, axis_name)
                h = _prelu(h, bp["prelu"])
                h = conv2d(h, bp["conv2"], stride=stride)
                h, nbs["bn3"] = _bn(h, bp["bn3"], bs["bn3"], train, cfg, axis_name)
                if "se_fc1" in bp:
                    # SE attention (`FR_training/backbones/iresnet.py:27-45`)
                    pooled = jnp.mean(h, axis=(1, 2), keepdims=True)
                    a = jax.nn.relu(conv2d(pooled, bp["se_fc1"], padding=0))
                    a = jax.nn.sigmoid(conv2d(a, bp["se_fc2"], padding=0))
                    h = h * a
                if "down_conv" in bp:
                    identity = conv2d(identity, bp["down_conv"], stride=stride, padding=0)
                    identity, nbs["down_bn"] = _bn(identity, bp["down_bn"], bs["down_bn"], train, cfg, axis_name)
                return h + identity, nbs

            if cfg.remat:
                block_fn = jax.checkpoint(block_fn)
            x, nbs = block_fn(x)
            new_blocks.append(nbs)
        new_state[f"layer{s + 1}"] = new_blocks

    x, new_state["bn2"] = _bn(x, params["bn2"], state["bn2"], train, cfg, axis_name)
    # head in fp32 (reference keeps fc out of autocast, iresnet.py:156-158)
    x = x.astype(jnp.float32)
    b = x.shape[0]
    x = x.reshape(b, -1)
    features = x
    if train and cfg.dropout > 0 and dropout_key is not None:
        keep = 1.0 - cfg.dropout
        mask = jax.random.bernoulli(dropout_key, keep, x.shape)
        x = jnp.where(mask, x / keep, 0.0)
    x = x @ params["fc"]["w"].astype(jnp.float32).T + params["fc"]["b"].astype(jnp.float32)
    # final BN1d ("features"): weight frozen at 1
    p = params["features_bn"]
    s = state["features_bn"]
    if train:
        out, nm, nv = batch_norm_train(
            x, jnp.ones_like(p["g"]), p["b"], s["mean"], s["var"],
            momentum=cfg.bn_momentum, eps=cfg.bn_eps, axis_name=axis_name,
        )
        new_state["features_bn"] = {"mean": nm, "var": nv}
    else:
        out = batch_norm_inference(x, jnp.ones_like(p["g"]), p["b"], s["mean"], s["var"], cfg.bn_eps)
        new_state["features_bn"] = s
    if return_features:
        return out, new_state, features
    return out, new_state
