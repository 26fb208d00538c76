"""ID-Booth train-step tests: all three loss modes run, LoRA updates, frozen
base stays frozen, and the step executes sharded on an 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceposegenerator_tpu.core.mesh import make_mesh, shard_batch, replicate
from faceposegenerator_tpu.core.precision import PARITY_POLICY
from faceposegenerator_tpu.diffusion import make_ddpm
from faceposegenerator_tpu.models import clip_text, unet2d, vae, iresnet
from faceposegenerator_tpu.training import idbooth


TINY = idbooth.ModelBundle(
    text_cfg=clip_text.CLIPTextConfig(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64
    ),
    unet_cfg=unet2d.UNetConfig(
        block_out_channels=(32, 64, 64, 64), cross_attention_dim=32, head_dim=8
    ),
    vae_cfg=vae.VAEConfig(block_out_channels=(32, 32, 32, 32)),
    arcface_cfg=iresnet.config_for("r18", num_features=64),
)


def _frozen_params():
    ap, ast = iresnet.init(jax.random.key(3), TINY.arcface_cfg)
    return {
        "text_encoder": clip_text.init(jax.random.key(0), TINY.text_cfg),
        "unet": unet2d.init(jax.random.key(1), TINY.unet_cfg),
        "vae": vae.init(jax.random.key(2), TINY.vae_cfg),
        "arcface": {"params": ap, "state": ast},
    }


def _batch(n=2, res=64):
    k = jax.random.key(10)
    return {
        "pixel_values": jax.random.uniform(k, (n, res, res, 3), minval=-1, maxval=1),
        "input_ids": jax.random.randint(jax.random.key(11), (n, 77), 0, 64),
        "gt_embeds": jax.random.normal(jax.random.key(12), (n, 64)),
    }


@pytest.mark.parametrize("which_loss", ["", "identity", "triplet_prior"])
def test_train_step_runs_and_updates_lora(which_loss):
    cfg = idbooth.IDBoothConfig(which_loss=which_loss, resolution=64)
    frozen = _frozen_params()
    trainable = idbooth.init_trainable(jax.random.key(4), cfg, TINY, frozen["unet"])
    opt = idbooth.make_optimizer(cfg, total_steps=10)
    opt_state = opt.init(trainable)
    step = idbooth.make_train_step(cfg, TINY, opt, policy=PARITY_POLICY, donate=False)

    t2, o2, metrics = step(trainable, opt_state, frozen, _batch(), jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["instance_loss"]))
    if which_loss:
        assert "id_loss" in metrics and np.isfinite(float(metrics["id_loss"]))
    # LoRA B moved off zero (use a down-block projection: at tiny test
    # resolution the mid block is 1x1 spatial, where single-token softmax
    # makes q/k gradients legitimately zero)
    b0 = t2["unet_lora"]["down_blocks"][0]["attentions"][0]["blocks"][0]["attn1"]["v"]["b"]
    assert float(jnp.abs(b0).max()) > 0


def test_loss_modes_differ():
    frozen = _frozen_params()
    batch = _batch()
    key = jax.random.key(0)
    losses = {}
    for wl in ["", "identity", "triplet_prior"]:
        cfg = idbooth.IDBoothConfig(which_loss=wl, resolution=64)
        trainable = idbooth.init_trainable(jax.random.key(4), cfg, TINY, frozen["unet"])
        sched = make_ddpm()
        loss_fn = idbooth.make_loss_fn(cfg, TINY, sched, policy=PARITY_POLICY)
        loss, m = loss_fn(trainable, frozen, batch, key)
        losses[wl] = float(loss)
    # identity/triplet add a nonnegative extra term on top of the base loss
    assert losses["identity"] >= losses[""] - 1e-5
    assert losses["triplet_prior"] != losses["identity"]


def test_timestep_weight_semantics():
    """(1 - t/T)² weighting: t=0 → weight 1, t=T → weight 0."""
    T = 1000
    w = lambda t: (1 - t / T) ** 2
    assert w(0) == 1.0 and w(T) == 0.0 and 0 < w(500) < 1


def test_train_step_sharded_8dev():
    cfg = idbooth.IDBoothConfig(which_loss="triplet_prior", resolution=64)
    frozen = _frozen_params()
    trainable = idbooth.init_trainable(jax.random.key(4), cfg, TINY, frozen["unet"])
    opt = idbooth.make_optimizer(cfg, total_steps=10)
    opt_state = opt.init(trainable)
    step = idbooth.make_train_step(cfg, TINY, opt, policy=PARITY_POLICY, donate=False)

    mesh = make_mesh()  # 8 virtual CPU devices
    assert mesh.shape["data"] == 8
    # global batch 16 = [8 instance; 8 prior] sharded over data axis
    batch = shard_batch(mesh, _batch(n=16))
    trainable_r = replicate(mesh, trainable)
    opt_r = replicate(mesh, opt_state)
    frozen_r = replicate(mesh, frozen)
    t2, o2, metrics = step(trainable_r, opt_r, frozen_r, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))


def test_gradient_accumulation_steps():
    """grad-accum k: params update only every k micro-steps, and the applied
    update equals one step on the averaged gradients (the reference's
    accelerator.accumulate semantics, train_ID-Booth.py:995)."""
    import optax

    cfg = idbooth.IDBoothConfig(
        which_loss="", resolution=64, gradient_accumulation_steps=2,
        lr_scheduler="constant",
    )
    bundle = TINY
    frozen = _frozen_params()
    trainable = idbooth.init_trainable(jax.random.key(4), cfg, bundle, frozen["unet"])
    opt = idbooth.make_optimizer(cfg, total_steps=8)
    opt_state = opt.init(trainable)
    step = idbooth.make_train_step(cfg, bundle, opt, policy=PARITY_POLICY, donate=False)
    batch = _batch(2)

    t1, o1, _ = step(trainable, opt_state, frozen, batch, jax.random.key(0))
    # after micro-step 1 of 2: no parameter change yet
    leaves0 = jax.tree.leaves(trainable)
    leaves1 = jax.tree.leaves(t1)
    assert all(np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(leaves0, leaves1))

    t2, o2, _ = step(t1, o1, frozen, batch, jax.random.key(1))
    # after micro-step 2: the optimizer applied an update
    leaves2 = jax.tree.leaves(t2)
    assert any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(leaves0, leaves2))


def test_text_lora_init_uses_seed_key():
    """Text-encoder LoRA init must thread the split key: different seeds give
    different A matrices, and distinct layers draw independent streams."""
    cfg = idbooth.IDBoothConfig(which_loss="", resolution=64, train_text_encoder=True)
    bundle = TINY
    frozen = _frozen_params()
    text_params = frozen["text_encoder"]
    t_a = idbooth.init_trainable(jax.random.key(1), cfg, bundle, frozen["unet"], text_params)
    t_b = idbooth.init_trainable(jax.random.key(2), cfg, bundle, frozen["unet"], text_params)
    a1 = np.asarray(t_a["text_lora"]["layer_0"]["q"]["a"])
    b1 = np.asarray(t_b["text_lora"]["layer_0"]["q"]["a"])
    assert not np.allclose(a1, b1), "cfg seed must affect text-LoRA init"
    l0 = np.asarray(t_a["text_lora"]["layer_0"]["q"]["a"])
    l1 = np.asarray(t_a["text_lora"]["layer_1"]["q"]["a"])
    assert not np.allclose(l0, l1)


def test_remat_identity_matches_no_remat():
    """remat_identity and identity_chunk must be memory-only knobs:
    identical loss and matching grads. Chunking changes the branch's batch
    shape, so XLA's conv-backward reduction order shifts — grads agree to
    fp32-reassociation tolerance, not bitwise (loss itself matches tighter
    because the chunked masked sums add in the same order)."""
    sched = make_ddpm()
    frozen = _frozen_params()
    batch = _batch(4)
    key = jax.random.key(42)
    outs = []
    for remat, chunk in ((False, None), (True, None), (True, 1), (False, 2)):
        cfg = idbooth.IDBoothConfig(
            which_loss="triplet_prior", remat_identity=remat, train_batch_size=2,
            identity_chunk=chunk,
        )
        loss_fn = idbooth.make_loss_fn(cfg, TINY, sched, policy=PARITY_POLICY)
        trainable = idbooth.init_trainable(jax.random.key(4), cfg, TINY, frozen["unet"])
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, frozen, batch, key
        )
        outs.append((loss, metrics["id_loss"], grads))
    base = outs[0]
    for other in outs[1:]:
        np.testing.assert_allclose(base[0], other[0], rtol=1e-6)
        np.testing.assert_allclose(base[1], other[1], rtol=1e-6)
        a = jax.tree_util.tree_leaves(base[2])
        b = jax.tree_util.tree_leaves(other[2])
        for x, y in zip(a, b):
            # per-leaf relative L2: the right metric for "same gradient up to
            # fp32 reassociation" (per-element rtol trips on near-zero entries
            # of an otherwise-agreeing leaf)
            x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
            denom = max(np.linalg.norm(x), 1e-12)
            assert np.linalg.norm(x - y) / denom < 1e-3


def test_identity_chunk_nondivisible_raises():
    """identity_chunk that can't apply must RAISE, not silently fall through
    to the whole-batch branch (which would OOM anyway — VERDICT r2 #7)."""
    sched = make_ddpm()
    frozen = _frozen_params()
    batch = _batch(6)  # b_inst = 3 with prior preservation
    for bad in (2, 4, 0, -1):
        cfg = idbooth.IDBoothConfig(
            which_loss="triplet_prior", train_batch_size=3, identity_chunk=bad
        )
        loss_fn = idbooth.make_loss_fn(cfg, TINY, sched, policy=PARITY_POLICY)
        trainable = idbooth.init_trainable(jax.random.key(4), cfg, TINY, frozen["unet"])
        with pytest.raises(ValueError, match="identity_chunk"):
            loss_fn(trainable, frozen, batch, jax.random.key(0))
    # divisor (and the degenerate full-batch chunk) still work
    for ok in (1, 3):
        cfg = idbooth.IDBoothConfig(
            which_loss="triplet_prior", train_batch_size=3, identity_chunk=ok
        )
        loss_fn = idbooth.make_loss_fn(cfg, TINY, sched, policy=PARITY_POLICY)
        trainable = idbooth.init_trainable(jax.random.key(4), cfg, TINY, frozen["unet"])
        loss, _ = loss_fn(trainable, frozen, batch, jax.random.key(0))
        assert np.isfinite(float(loss))
