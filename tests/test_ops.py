"""Kernel/ops unit tests: flash attention vs jnp reference einsum, norms vs
torch oracles, LoRA algebra (SURVEY.md §4 implication)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceposegenerator_tpu.ops.attention import dot_product_attention, _reference_attention
from faceposegenerator_tpu.ops.flash_attention import flash_attention
from faceposegenerator_tpu.ops.norms import (
    batch_norm_train,
    batch_norm_inference,
    group_norm,
    layer_norm,
)
from faceposegenerator_tpu.ops.lora import lora_dense, init_lora_pair


def _qkv(key, b, sq, skv, h, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(jax.random.key(key), 3)
    return (
        jax.random.normal(kq, (b, sq, h, d), dtype),
        jax.random.normal(kk, (b, skv, h, d), dtype),
        jax.random.normal(kv, (b, skv, h, d), dtype),
    )


@pytest.mark.parametrize("sq,skv", [(256, 256), (512, 512), (512, 77)])
def test_flash_vs_reference(sq, skv):
    q, k, v = _qkv(0, 2, sq, skv, 3, 64)
    ref = _reference_attention(q, k, v, 64**-0.5, None)
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_kv_mask_matches_truncated():
    """Padded+masked KV must equal attention over the unpadded KV."""
    q, k, v = _qkv(1, 1, 128, 128, 2, 64)
    kv_len = 77
    ref = _reference_attention(q, k[:, :kv_len], v[:, :kv_len], 64**-0.5, None)
    out = flash_attention(q, k, v, kv_len=kv_len, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_unaligned_seq_padding():
    q, k, v = _qkv(2, 1, 200, 200, 1, 64)
    ref = _reference_attention(q, k, v, 64**-0.5, None)
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_gradients_match_reference():
    q, k, v = _qkv(3, 1, 128, 128, 2, 64)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=128, block_k=128, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_attention(q, k, v, 64**-0.5, None) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize(
    "sq,skv,h,kv_len",
    [(256, 256, 2, None), (200, 200, 5, None), (128, 128, 2, 77), (256, 77, 3, None)],
)
def test_flash_pallas_backward_matches_reference(sq, skv, h, kv_len):
    """The fused Pallas backward (dq/dkv kernels recomputing p from the saved
    lse) must match the reference einsum VJP — incl. odd head counts (zero-pad
    head), unaligned sequence padding, and masked KV columns."""
    q, k, v = _qkv(7, 2, sq, skv, h, 64)
    if kv_len is not None:
        ref_in = (q, k[:, :kv_len], v[:, :kv_len])
    else:
        ref_in = (q, k, v)

    def loss_flash(q, k, v):
        out = flash_attention(
            q, k, v, kv_len=kv_len, block_q=128, block_k=128, interpret=True
        )
        return jnp.sum(out ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_attention(q, k, v, 64**-0.5, None) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(*ref_in)
    for a, b in zip(gf, gr):
        if kv_len is not None and a.shape[1] != b.shape[1]:
            np.testing.assert_allclose(  # padded KV rows get zero grads
                np.asarray(a[:, kv_len:]), 0.0, atol=1e-6
            )
            a = a[:, :kv_len]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4)


def test_flash_pallas_backward_plain_d128():
    """The plain-path (d % 128 == 0) Pallas backward — serving the VAE's
    wide single head — must match the reference VJP."""
    q, k, v = _qkv(8, 1, 256, 256, 1, 128)

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
        return jnp.sum(out ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_attention(q, k, v, 128**-0.5, None) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4)


def test_flash_packed_mxu_sum_matches_vpu_sum():
    """The MXU row-sum trick (l from the PV matmul's dead packed lanes) must
    agree with the VPU-reduction path: exactly in fp32 (p is not rounded
    before the dot), and to bf16 tolerance for bf16 inputs."""
    from faceposegenerator_tpu.ops.flash_attention import _flash_fwd_3d_packed

    kq, kk, kv = jax.random.split(jax.random.key(9), 3)
    for dtype, atol in ((jnp.float32, 1e-6), (jnp.bfloat16, 2e-2)):
        q = jax.random.normal(kq, (2, 256, 128), dtype)  # 2 packed d=64 heads
        k = jax.random.normal(kk, (2, 256, 128), dtype)
        v = jax.random.normal(kv, (2, 256, 128), dtype)
        a = _flash_fwd_3d_packed(q, k, v, 0.125, None, 128, 128, True, 64, mxu_sum=True)
        b = _flash_fwd_3d_packed(q, k, v, 0.125, None, 128, 128, True, 64, mxu_sum=False)
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=atol, rtol=atol
        )
    # masked KV: padded rows must contribute nothing through the ones-column
    q, k, v = _qkv(10, 1, 128, 128, 2, 64)
    ref = _reference_attention(q, k[:, :77], v[:, :77], 64**-0.5, None)
    out = flash_attention(q, k, v, kv_len=77, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_dispatch_reference_on_cpu():
    q, k, v = _qkv(4, 1, 64, 64, 1, 32)
    out = dot_product_attention(q, k, v)  # auto → reference on CPU
    ref = _reference_attention(q, k, v, 32**-0.5, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_group_norm_vs_torch():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).standard_normal((2, 8, 8, 32)).astype(np.float32)
    gamma = np.random.default_rng(1).standard_normal(32).astype(np.float32)
    beta = np.random.default_rng(2).standard_normal(32).astype(np.float32)
    out = group_norm(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta), num_groups=8, eps=1e-6)
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW for torch
    tout = torch.nn.functional.group_norm(
        tx, 8, torch.from_numpy(gamma), torch.from_numpy(beta), eps=1e-6
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), tout, atol=1e-5)


def test_layer_norm_vs_torch():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(3).standard_normal((2, 7, 48)).astype(np.float32)
    g = np.random.default_rng(4).standard_normal(48).astype(np.float32)
    b = np.random.default_rng(5).standard_normal(48).astype(np.float32)
    out = layer_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b))
    tout = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (48,), torch.from_numpy(g), torch.from_numpy(b)
    ).numpy()
    np.testing.assert_allclose(np.asarray(out), tout, atol=1e-5)


def test_batch_norm_train_vs_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(6)
    x = rng.standard_normal((4, 5, 5, 16)).astype(np.float32)
    g = rng.standard_normal(16).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)
    rm = np.zeros(16, np.float32)
    rv = np.ones(16, np.float32)
    out, nm, nv = batch_norm_train(
        jnp.asarray(x), jnp.asarray(g), jnp.asarray(b), jnp.asarray(rm), jnp.asarray(rv)
    )
    bn = torch.nn.BatchNorm2d(16)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(g))
        bn.bias.copy_(torch.from_numpy(b))
    bn.train()
    tout = bn(torch.from_numpy(x).permute(0, 3, 1, 2)).detach().permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), tout, atol=1e-4)
    np.testing.assert_allclose(np.asarray(nm), bn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(nv), bn.running_var.numpy(), atol=1e-4)
    # inference mode folds to scale+shift
    out_inf = batch_norm_inference(
        jnp.asarray(x), jnp.asarray(g), jnp.asarray(b), nm, nv
    )
    bn.eval()
    tinf = bn(torch.from_numpy(x).permute(0, 3, 1, 2)).detach().permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out_inf), tinf, atol=1e-4)


def test_lora_dense_zero_b_is_identity():
    key = jax.random.key(0)
    x = jax.random.normal(key, (3, 16))
    w = jax.random.normal(jax.random.key(1), (8, 16))
    a, b = init_lora_pair(jax.random.key(2), 8, 16, rank=4)
    base = lora_dense(x, w)
    with_zero = lora_dense(x, w, lora_a=a, lora_b=b)
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_zero), atol=1e-6)


def test_lora_dense_matches_merged_weight():
    x = jax.random.normal(jax.random.key(3), (5, 16))
    w = jax.random.normal(jax.random.key(4), (8, 16))
    a = jax.random.normal(jax.random.key(5), (4, 16))
    b = jax.random.normal(jax.random.key(6), (8, 4))
    scale = 0.5
    factored = lora_dense(x, w, lora_a=a, lora_b=b, scale=scale)
    merged = x @ (w + scale * b @ a).T
    np.testing.assert_allclose(np.asarray(factored), np.asarray(merged), atol=1e-4)


def test_flash_packed_even_heads_and_plain_d128():
    """d=64 routes to the packed two-heads-per-lane-block kernel (odd head
    counts pad a ghost head); d=128 keeps the plain kernel. Both must match
    the reference einsum."""
    # even head count → no ghost pad
    q, k, v = _qkv(5, 2, 256, 256, 4, 64)
    ref = _reference_attention(q, k, v, 64**-0.5, None)
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)

    # plain kernel at d=128
    q, k, v = _qkv(6, 2, 256, 256, 2, 128)
    ref = _reference_attention(q, k, v, 128**-0.5, None)
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)

    # packed + kv_len mask (77-token cross-attention shape)
    q, k, v = _qkv(7, 2, 256, 128, 5, 64)
    ref = _reference_attention(q, k, v, 64**-0.5, 77)
    out = flash_attention(q, k, v, kv_len=77, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize(
    "shape,groups,act",
    [
        ((2, 16, 16, 320), 32, "silu"),  # SD level-0 channel count
        ((2, 8, 8, 64), 8, None),
        ((1, 24, 8, 96), 16, "silu"),    # S=192 < chunk, C%128 != 0
    ],
)
def test_fused_gn_slab_matches_xla(shape, groups, act):
    """The single-read Pallas GN slab kernel (interpret mode) must match the
    XLA formulation bit-for-bit-ish in fp32 and to bf16 tolerance in bf16."""
    from faceposegenerator_tpu.ops.fused_gn import fused_group_norm, slab_supported

    n, h, w, c = shape
    assert slab_supported(n, h * w, c, groups)
    rng = np.random.default_rng(3)
    gamma = jnp.asarray(rng.standard_normal(c), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(c), jnp.float32)
    for dtype, atol in ((jnp.float32, 1e-5), (jnp.bfloat16, 2e-2)):
        x = jnp.asarray(rng.standard_normal(shape) * 3 + 1).astype(dtype)
        got = fused_group_norm(x, gamma, beta, groups, 1e-6, act, True)
        ref = group_norm(x, gamma, beta, num_groups=groups, eps=1e-6, act=act)
        assert got.dtype == ref.dtype
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=atol, rtol=atol
        )


def test_fused_gn_gradients_match_xla():
    """custom_vjp backward (XLA recompute) must match grads of the XLA GN."""
    from faceposegenerator_tpu.ops.fused_gn import fused_group_norm

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 64)), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(64), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(64), jnp.float32)

    def loss_fused(x, g, b):
        return jnp.sum(fused_group_norm(x, g, b, 8, 1e-6, "silu", True) ** 2)

    def loss_xla(x, g, b):
        return jnp.sum(group_norm(x, g, b, num_groups=8, eps=1e-6, act="silu") ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, gamma, beta)
    gr = jax.grad(loss_xla, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_gn_slab_eligibility():
    from faceposegenerator_tpu.ops.fused_gn import slab_supported

    assert slab_supported(2, 64 * 64, 320, 32)        # level-0 UNet slab
    assert not slab_supported(2, 512 * 512, 128, 32)  # VAE decode: too big
    assert not slab_supported(2, 64 * 64, 330, 32)    # C % groups
    assert not slab_supported(2, 100, 64, 8)          # S % 8


def test_flash_split_kv_matches_reference(monkeypatch):
    """FLASH_SPLIT_KV (combined-max sub-block kernel) must be numerically a
    flash forward: exact softmax attention incl. masked KV and odd heads."""
    import faceposegenerator_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "_SPLIT_KV", 2)
    for (sq, skv, h, kv_len) in [(512, 512, 2, None), (512, 512, 3, None), (256, 256, 2, 200)]:
        q, k, v = _qkv(11, 2, sq, skv, h, 64)
        out = flash_attention(
            q, k, v, kv_len=kv_len, block_q=256, block_k=256, interpret=True
        )
        kk = k[:, :kv_len] if kv_len else k
        vv = v[:, :kv_len] if kv_len else v
        ref = _reference_attention(q, kk, vv, 64**-0.5, None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize(
    "shape,cout,groups",
    [
        ((2, 16, 16, 320), 320, 32),  # SD level-0 shapes (reduced spatial)
        ((1, 8, 8, 64), 96, 8),       # cin != cout
        ((1, 24, 16, 96), 64, 16),    # non-square, h % chunk != 0 fallback rows
    ],
)
def test_fused_gn_silu_conv3x3_matches_reference(shape, cout, groups):
    """conv-prologue fusion (interpret mode): gn_silu_conv3x3 must match
    conv2d(silu(group_norm(x))) — the resblock's first two ops."""
    from faceposegenerator_tpu.models.unet2d import conv2d
    from faceposegenerator_tpu.ops.fused_gn_conv import gn_silu_conv3x3, supported

    n, h, w, cin = shape
    assert supported(n, h, w, cin, cout, groups)
    rng = np.random.default_rng(7)
    gamma = jnp.asarray(rng.standard_normal(cin), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(cin), jnp.float32)
    cw = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, jnp.float32)
    cb = jnp.asarray(rng.standard_normal(cout), jnp.float32)
    for dtype, atol in ((jnp.float32, 5e-4), (jnp.bfloat16, 1e-1)):
        x = jnp.asarray(rng.standard_normal(shape) * 2 + 0.5).astype(dtype)
        got = gn_silu_conv3x3(x, gamma, beta, cw, cb, groups, 1e-5, True)
        href = group_norm(x, gamma, beta, num_groups=groups, eps=1e-5, act="silu")
        ref = conv2d(href, {"w": cw, "b": cb})
        assert got.shape == ref.shape and got.dtype == ref.dtype
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=atol, rtol=atol,
        )


def test_fused_gn_silu_conv3x3_gradients_match_reference():
    from faceposegenerator_tpu.models.unet2d import conv2d
    from faceposegenerator_tpu.ops.fused_gn_conv import gn_silu_conv3x3

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 64)), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(64), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(64), jnp.float32)
    cw = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.05, jnp.float32)
    cb = jnp.asarray(rng.standard_normal(64), jnp.float32)

    def loss_fused(x, g, b, w_, cb_):
        return jnp.sum(gn_silu_conv3x3(x, g, b, w_, cb_, 8, 1e-5, True) ** 2)

    def loss_ref(x, g, b, w_, cb_):
        h = group_norm(x, g, b, num_groups=8, eps=1e-5, act="silu")
        return jnp.sum(conv2d(h, {"w": w_, "b": cb_}) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, cw, cb)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, cw, cb)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# int8 flash attention (opt-in inference mode, impl="flash_int8")
# ---------------------------------------------------------------------------


def test_flash_int8_close_to_reference():
    """Packed d=64 int8 attention: per-tensor int8 q/k + 1/127-grid p give
    ~1% relative error on random inputs — an approximation mode (like
    w8a8), bounded, not exact."""
    from faceposegenerator_tpu.ops.attention import _reference_attention
    from faceposegenerator_tpu.ops.flash_attention import flash_attention_int8

    k1, k2, k3 = jax.random.split(jax.random.key(30), 3)
    q = jax.random.normal(k1, (2, 256, 4, 64), jnp.float32) * 0.5
    k = jax.random.normal(k2, (2, 256, 4, 64), jnp.float32) * 0.5
    v = jax.random.normal(k3, (2, 256, 4, 64), jnp.float32)
    ref = _reference_attention(q, k, v, 64**-0.5)
    got = flash_attention_int8(q, k, v, block_q=128, block_k=128, interpret=True)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.03, rel


def test_flash_int8_kv_mask_and_fallback():
    from faceposegenerator_tpu.ops.attention import _reference_attention
    from faceposegenerator_tpu.ops.flash_attention import flash_attention_int8

    k1, k2, k3 = jax.random.split(jax.random.key(31), 3)
    q = jax.random.normal(k1, (1, 128, 2, 64), jnp.float32)
    k = jax.random.normal(k2, (1, 128, 2, 64), jnp.float32)
    v = jax.random.normal(k3, (1, 128, 2, 64), jnp.float32)
    # padded-KV cross-attention: masked columns contribute exactly nothing
    ref = _reference_attention(q, k, v, 64**-0.5, kv_len=77)
    got = flash_attention_int8(q, k, v, kv_len=77, block_q=128, block_k=128,
                               interpret=True)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.03, rel
    # non-packable head dim falls back to the EXACT bf16 flash kernel
    q32 = jax.random.normal(k1, (1, 128, 2, 32), jnp.float32)
    ref32 = _reference_attention(q32, q32, q32, 32**-0.5)
    got32 = flash_attention_int8(q32, q32, q32, block_q=128, block_k=128,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got32), np.asarray(ref32), atol=2e-5)


def test_flash_int8_through_unet_apply():
    """attn_impl="flash_int8" threads through the UNet transformer blocks
    (uses interpret mode off-TPU automatically) and stays close to exact."""
    from faceposegenerator_tpu.models import unet2d
    from faceposegenerator_tpu.core.precision import PARITY_POLICY

    cfg = unet2d.UNetConfig(
        block_out_channels=(128, 128, 128, 128), cross_attention_dim=64,
        head_dim=64,
    )
    params = unet2d.init(jax.random.key(32), cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(33), (1, 16, 16, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.key(34), (1, 7, 64), jnp.float32)
    t = jnp.array([7], jnp.int32)
    exact = unet2d.apply(params, x, t, ctx, cfg, policy=PARITY_POLICY,
                         attn_impl="reference")
    got = unet2d.apply(params, x, t, ctx, cfg, policy=PARITY_POLICY,
                       attn_impl="flash_int8")
    rel = float(jnp.linalg.norm(got - exact) / jnp.linalg.norm(exact))
    assert rel < 0.05, rel
