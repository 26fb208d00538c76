"""Opt-in w8a8 int8 quantization (`ops/quant.py`).

The quantized path is an approximation by design; what must be EXACT is the
quantization arithmetic itself (int8 quantize → int32 accumulate → fp32
rescale, verified against a numpy oracle), the tree transform (skip lists
respected, biases/norms untouched), and the composition rules (LoRA deltas
ride bf16 on the int8 base; the fused-qkv path equals per-projection;
init_lora/lora_io still read shapes off a quantized tree). Accuracy is
bounded, not exact: random-weight relative-error / cosine thresholds.

The reference stack has no quantized path (fp16 autocast only,
`train_ID-Booth.py:60`); this is a TPU-native serving lever.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceposegenerator_tpu.core.precision import PARITY_POLICY
from faceposegenerator_tpu.diffusion import make_ddpm
from faceposegenerator_tpu.diffusion.sampler import SamplerModels, sample
from faceposegenerator_tpu.models import clip_text, unet2d, vae
from faceposegenerator_tpu.ops import quant
from faceposegenerator_tpu.ops.lora import lora_dense

CFG = unet2d.UNetConfig(
    block_out_channels=(32, 64, 64, 64), cross_attention_dim=48, head_dim=8
)
TINY = SamplerModels(
    text_cfg=clip_text.CLIPTextConfig(
        vocab_size=512, hidden_size=48, num_layers=2, num_heads=4, intermediate_size=96
    ),
    unet_cfg=CFG,
    vae_cfg=vae.VAEConfig(block_out_channels=(32, 32, 32, 32)),
)
KW = dict(models=TINY, height=64, width=64, policy=PARITY_POLICY)


def _np_qdense(x, w):
    """Numpy oracle for qdense: per-token dynamic int8 × per-channel int8."""
    xf = np.asarray(x, np.float64)
    sx = np.maximum(np.abs(xf).max(axis=-1, keepdims=True), 1e-8) / 127.0
    xq = np.clip(np.rint(xf / sx), -127, 127).astype(np.int32)
    wf = np.asarray(w, np.float64)
    sw = np.maximum(np.abs(wf).max(axis=1), 1e-8) / 127.0
    wq = np.clip(np.rint(wf / sw[:, None]), -127, 127).astype(np.int32)
    return (xq @ wq.T) * sx * sw


def test_qdense_matches_numpy_oracle():
    k1, k2 = jax.random.split(jax.random.key(0))
    x = jax.random.normal(k1, (16, 24), jnp.float32)
    w = jax.random.normal(k2, (12, 24), jnp.float32)
    got = quant.qdense(x, quant.quantize_weight(w, channel_axis=0))
    want = _np_qdense(np.asarray(x), np.asarray(w))
    # identical integers; rescale is the only float math (fp32 vs fp64)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_qdense_accuracy():
    k1, k2 = jax.random.split(jax.random.key(1))
    x = jax.random.normal(k1, (64, 128), jnp.float32)
    w = jax.random.normal(k2, (96, 128), jnp.float32) / 128**0.5
    exact = x @ w.T
    q = quant.qdense(x, quant.quantize_weight(w, channel_axis=0))
    rel = jnp.linalg.norm(q - exact) / jnp.linalg.norm(exact)
    assert rel < 0.02, rel


def test_qconv_accuracy_and_dtype():
    k1, k2 = jax.random.split(jax.random.key(2))
    x = jax.random.normal(k1, (2, 16, 16, 8), jnp.bfloat16)
    p = {
        "w": jax.random.normal(k2, (3, 3, 8, 12), jnp.float32) / 72**0.5,
        "b": jnp.zeros((12,), jnp.float32),
    }
    exact = unet2d.conv2d(x.astype(jnp.float32), {"w": p["w"], "b": p["b"]})
    qp = {"w": quant.quantize_weight(p["w"], channel_axis=-1), "b": p["b"]}
    got = unet2d.conv2d(x, qp)
    assert got.dtype == jnp.bfloat16
    rel = np.linalg.norm(np.asarray(got, np.float32) - np.asarray(exact)) / np.linalg.norm(np.asarray(exact))
    assert rel < 0.03, rel


def test_qconv_1x1_dot_routing(monkeypatch):
    """QUANT_CONV1X1=dot runs 1×1 quantized convs as per-pixel denses with
    exact per-pixel activation scales; stride slices before the dot (UNet
    conv_shortcut is stride 1, IResNet down_conv stride 2). Off by default
    (measured −2.4% in-program, perf/r3al_queue.jsonl) but kept correct."""
    monkeypatch.setattr(quant, "_CONV1X1", "dot")
    k1, k2 = jax.random.split(jax.random.key(3))
    x = jax.random.normal(k1, (2, 8, 8, 16), jnp.float32)
    wf = jax.random.normal(k2, (1, 1, 16, 12), jnp.float32) / 16**0.5
    p = {"w": quant.quantize_weight(wf, channel_axis=-1), "b": jnp.zeros((12,), jnp.float32)}
    for stride in (1, 2):
        exact = unet2d.conv2d(x, {"w": wf, "b": p["b"]}, stride=stride, padding=0)
        got = quant.qconv2d(x, p, stride=stride, padding=0)
        assert got.shape == exact.shape
        rel = np.linalg.norm(np.asarray(got - exact)) / np.linalg.norm(np.asarray(exact))
        assert rel < 0.02, (stride, rel)
        # numpy oracle: the dot form IS per-pixel qdense over the channel axis
        want = _np_qdense(
            np.asarray(x[:, ::stride, ::stride, :]), np.asarray(wf[0, 0]).T
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)
    # the default conv routing agrees with the exact conv within quant error
    monkeypatch.setattr(quant, "_CONV1X1", "conv")
    exact = unet2d.conv2d(x, {"w": wf, "b": p["b"]}, stride=2, padding=0)
    got = quant.qconv2d(x, p, stride=2, padding=0)
    rel = np.linalg.norm(np.asarray(got - exact)) / np.linalg.norm(np.asarray(exact))
    assert rel < 0.03, rel


def test_quantize_tree_skips_and_structure():
    params = unet2d.init(jax.random.key(0), CFG)
    q = quant.quantize_unet(params)
    # skip list: first/last conv and the time path stay plain arrays
    assert not quant.is_quantized(q["conv_in"]["w"])
    assert not quant.is_quantized(q["conv_out"]["w"])
    assert not quant.is_quantized(q["time_embedding"]["linear_1"]["w"])
    assert not quant.is_quantized(q["down_blocks"][0]["resnets"][0]["time_emb_proj"]["w"])
    # body weights quantized, int8, same shape; biases/norms untouched
    rb = q["down_blocks"][0]["resnets"][0]
    assert quant.is_quantized(rb["conv1"]["w"])
    assert rb["conv1"]["w"]["q"].dtype == jnp.int8
    assert rb["conv1"]["w"]["q"].shape == params["down_blocks"][0]["resnets"][0]["conv1"]["w"].shape
    assert rb["norm1"]["g"].dtype == params["down_blocks"][0]["resnets"][0]["norm1"]["g"].dtype
    at = q["down_blocks"][0]["attentions"][0]["blocks"][0]
    assert quant.is_quantized(at["attn1"]["q"]["w"])
    assert quant.is_quantized(at["ff_in"]["w"])


def test_fused_qkv_matches_per_projection():
    k = jax.random.key(3)
    ks = jax.random.split(k, 4)
    x = jax.random.normal(ks[0], (2, 32, 24), jnp.float32)
    ws = [
        quant.quantize_weight(jax.random.normal(ks[i + 1], (24, 24), jnp.float32), 0)
        for i in range(3)
    ]
    fused = quant.qdense_fused(x, ws)
    per = jnp.concatenate([quant.qdense(x, w) for w in ws], axis=-1)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(per), rtol=1e-6, atol=1e-6)


def test_lora_delta_rides_quantized_base():
    """lora_dense(quantized w, A, B) == lora_dense(quantized w) + bf16 delta:
    the adapter contribution is bit-identical with and without quantization
    of the base (the delta never touches the int8 path)."""
    ks = jax.random.split(jax.random.key(4), 4)
    x = jax.random.normal(ks[0], (8, 32), jnp.float32)
    w = jax.random.normal(ks[1], (16, 32), jnp.float32)
    a = jax.random.normal(ks[2], (4, 32), jnp.float32)
    b = jax.random.normal(ks[3], (16, 4), jnp.float32)
    qw = quant.quantize_weight(w, 0)
    with_lora = lora_dense(x, qw, lora_a=a, lora_b=b, scale=0.7)
    base = lora_dense(x, qw)
    delta_q = with_lora - base
    delta_exact = lora_dense(x, w, lora_a=a, lora_b=b, scale=0.7) - lora_dense(x, w)
    np.testing.assert_allclose(np.asarray(delta_q), np.asarray(delta_exact), rtol=1e-5, atol=1e-5)


def test_init_lora_on_quantized_tree():
    params = unet2d.init(jax.random.key(0), CFG)
    q = quant.quantize_unet(params)
    l_plain = unet2d.init_lora(jax.random.key(1), params, rank=4)
    l_quant = unet2d.init_lora(jax.random.key(1), q, rank=4)
    assert jax.tree.structure(l_plain) == jax.tree.structure(l_quant)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(l_plain)[0]), np.asarray(jax.tree.leaves(l_quant)[0])
    )


def test_unet_apply_quantized_close_to_exact():
    params = unet2d.init(jax.random.key(0), CFG)
    q = quant.quantize_unet(params)
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 4), jnp.float32)
    t = jnp.array([3, 7], jnp.int32)
    ctx = jax.random.normal(jax.random.key(2), (2, 77, 48), jnp.float32)
    exact = unet2d.apply(params, x, t, ctx, CFG, policy=PARITY_POLICY)
    got = unet2d.apply(q, x, t, ctx, CFG, policy=PARITY_POLICY)
    assert np.isfinite(np.asarray(got)).all()
    rel = np.linalg.norm(np.asarray(got - exact)) / np.linalg.norm(np.asarray(exact))
    assert rel < 0.15, rel  # random weights are the worst case for int8


def test_sampler_end_to_end_quantized():
    params = {
        "text_encoder": clip_text.init(jax.random.key(4), TINY.text_cfg),
        "unet": unet2d.init(jax.random.key(0), CFG),
        "vae": vae.init(jax.random.key(5), TINY.vae_cfg),
    }
    qparams = dict(params, unet=quant.quantize_unet(params["unet"]))
    ids = jax.random.randint(jax.random.key(6), (2, 77), 0, 512)
    neg = jnp.zeros_like(ids)
    sched = make_ddpm(num_inference_steps=4)
    img_q = sample(qparams, sched, ids, neg, jax.random.key(0), **KW)
    img_q2 = sample(qparams, sched, ids, neg, jax.random.key(0), **KW)
    np.testing.assert_array_equal(np.asarray(img_q), np.asarray(img_q2))
    assert np.isfinite(np.asarray(img_q)).all()
    exact = sample(params, sched, ids, neg, jax.random.key(0), **KW)
    # same ballpark as the exact image (uint8-scale [0,1] outputs)
    assert np.abs(np.asarray(img_q) - np.asarray(exact)).mean() < 0.25


def test_iresnet_quantized_embedding_cosine():
    from faceposegenerator_tpu.models import iresnet

    cfg = iresnet.IResNetConfig(depths=(2, 2, 2, 2))
    params, state = iresnet.init(jax.random.key(0), cfg)
    qparams = quant.quantize_iresnet(params)
    assert not quant.is_quantized(qparams["conv1"]["w"])
    assert not quant.is_quantized(qparams["fc"]["w"])
    assert quant.is_quantized(qparams["layer1"][0]["conv1"]["w"])
    x = jax.random.normal(jax.random.key(1), (4, 112, 112, 3), jnp.float32)
    e_exact, _ = iresnet.apply(params, state, x, cfg)
    e_q, _ = iresnet.apply(qparams, state, x, cfg)
    cos = np.sum(
        np.asarray(e_exact) * np.asarray(e_q), axis=-1
    ) / (
        np.linalg.norm(np.asarray(e_exact), axis=-1)
        * np.linalg.norm(np.asarray(e_q), axis=-1)
    )
    assert (cos > 0.98).all(), cos


def test_pipeline_quantize_method():
    from faceposegenerator_tpu.pipelines.txt2img import StableDiffusionPipeline

    pipe = StableDiffusionPipeline.from_random(
        jax.random.key(0), models=TINY, policy=PARITY_POLICY
    )
    exact = pipe(input_ids=jnp.zeros((1, 77), jnp.int32), num_inference_steps=2,
                 height=64, width=64, seed=0)
    pipe.quantize("w8a8")
    assert quant.is_quantized(pipe.params["unet"]["down_blocks"][0]["resnets"][0]["conv1"]["w"])
    out = pipe(input_ids=jnp.zeros((1, 77), jnp.int32), num_inference_steps=2,
               height=64, width=64, seed=0)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    assert np.asarray(out).shape == np.asarray(exact).shape
    with pytest.raises(ValueError):
        pipe.quantize("w4a4")


def test_serving_on_quantized_pipeline():
    """The claimed use case: a quantized pipe behind SamplerServer — one
    compiled program, per-request determinism, LoRA hot-swap biting (deltas
    in bf16 over the int8 base)."""
    from faceposegenerator_tpu.data.tokenizer import CLIPTokenizer, bytes_to_unicode
    from faceposegenerator_tpu.serving import GenerationRequest, SamplerServer
    from faceposegenerator_tpu.pipelines.txt2img import StableDiffusionPipeline

    units = list(bytes_to_unicode().values())
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for u in units:
        vocab.setdefault(u, len(vocab))
        vocab.setdefault(u + "</w>", len(vocab))
    tok = CLIPTokenizer(vocab, [], model_max_length=77)
    pipe = StableDiffusionPipeline.from_random(jax.random.key(0), models=TINY,
                                               tokenizer=tok)
    pipe.quantize("w8a8")
    srv = SamplerServer(pipe, batch_size=2, max_wait_s=0.0,
                        num_inference_steps=2, height=64, width=64)
    try:
        zero = srv._loras[None][0]
        leaves, treedef = jax.tree_util.tree_flatten(zero)
        keys = jax.random.split(jax.random.key(10), len(leaves))
        srv.register_lora("idA", jax.tree_util.tree_unflatten(
            treedef,
            [0.3 * jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)],
        ))
        a = srv.generate([GenerationRequest(prompt="a face", seed=1)])[0]
        a2 = srv.generate([GenerationRequest(prompt="a face", seed=1)])[0]
        c = srv.generate([GenerationRequest(prompt="a face", seed=1, lora_id="idA")])[0]
        np.testing.assert_array_equal(a.image, a2.image)
        assert np.abs(a.image.astype(int) - c.image.astype(int)).max() >= 1
    finally:
        srv.shutdown()


def test_quantized_pipeline_to_mesh_matches_single_device():
    """Composition with data-parallel generation (`cli generate
    --data_parallel` on a quantized pipe): quantize-then-to_mesh AND
    to_mesh-then-quantize both reproduce the single-device quantized
    pipeline — per-token/per-sample activation scales are row-local, so
    sharding the batch over "data" does not change the math."""
    from faceposegenerator_tpu.core.mesh import make_mesh
    from faceposegenerator_tpu.pipelines.txt2img import StableDiffusionPipeline

    params = {
        "text_encoder": clip_text.init(jax.random.key(0), TINY.text_cfg),
        "unet": unet2d.init(jax.random.key(1), TINY.unet_cfg),
        "vae": vae.init(jax.random.key(2), TINY.vae_cfg),
    }
    ids = jax.random.randint(jax.random.key(3), (8, 77), 0, 512)
    run = dict(input_ids=ids, num_inference_steps=2, height=64, width=64,
               seed=7, output_type="np")

    single = StableDiffusionPipeline(dict(params), models=TINY, policy=PARITY_POLICY)
    single.quantize("w8a8")
    ref = single(**run)

    qm = StableDiffusionPipeline(dict(params), models=TINY, policy=PARITY_POLICY)
    qm.quantize("w8a8")
    qm.to_mesh(make_mesh())
    np.testing.assert_allclose(qm(**run), ref, atol=5e-4)

    mq = StableDiffusionPipeline(dict(params), models=TINY, policy=PARITY_POLICY)
    mq.to_mesh(make_mesh())
    mq.quantize("w8a8")  # must re-replicate the quantized tree onto the mesh
    np.testing.assert_allclose(mq(**run), ref, atol=5e-4)


def test_quant_composes_with_cfg_interval():
    """cfg_interval over a quantized tree: the (0, S) anchor is the same
    program as the quantized default (allclose at fp32), and a mid interval
    is finite and genuinely different — the cond-only half-batch rows hit
    the same int8 kernels."""
    params = {
        "text_encoder": clip_text.init(jax.random.key(4), TINY.text_cfg),
        "unet": quant.quantize_unet(unet2d.init(jax.random.key(0), CFG)),
        "vae": vae.init(jax.random.key(5), TINY.vae_cfg),
    }
    ids = jax.random.randint(jax.random.key(6), (2, 77), 0, 512)
    neg = jnp.zeros_like(ids)
    sched = make_ddpm(num_inference_steps=5)
    ref = sample(params, sched, ids, neg, jax.random.key(0), **KW)
    full = sample(params, sched, ids, neg, jax.random.key(0),
                  cfg_interval=(0, 5), **KW)
    np.testing.assert_allclose(np.asarray(full, np.float32),
                               np.asarray(ref, np.float32), atol=1e-5)
    mid = sample(params, sched, ids, neg, jax.random.key(0),
                 cfg_interval=(2, 4), **KW)
    m = np.asarray(mid, np.float32)
    assert np.isfinite(m).all()
    assert np.abs(m - np.asarray(ref, np.float32)).max() > 1e-4


def test_qdense_dequant_impl(monkeypatch):
    """QUANT_DENSE_IMPL=dequant (w8 weight-only): activations exact, error
    comes from weight quantization alone — matches x @ (q·s) to fp32
    precision and is strictly closer to the bf16 base than int8 mode."""
    monkeypatch.setattr(quant, "_DENSE_IMPL", "dequant")
    x = jax.random.normal(jax.random.key(0), (6, 32), jnp.float32)
    w = jax.random.normal(jax.random.key(1), (16, 32), jnp.float32) * 0.2
    qw = quant.quantize_weight(w, channel_axis=0)
    got = quant.qdense(x, qw)
    want = x @ (qw["q"].astype(jnp.float32) * qw["s"][:, None]).T
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
    # fused-qkv path shares the impl switch
    got3 = quant.qdense_fused(x, [qw, qw, qw])
    np.testing.assert_allclose(
        np.asarray(got3), np.concatenate([np.asarray(want)] * 3, axis=-1),
        rtol=1e-5, atol=1e-5,
    )


def test_qdense_pallas_matches_int8_impl(monkeypatch):
    """QUANT_DENSE_IMPL=pallas (fused quantize+int8-dot kernel, interpret
    mode here): same quantization arithmetic as the XLA int8 body — fp32
    inputs match it bitwise (the in-kernel output cast is the identity at
    fp32); bf16 inputs match up to that single output rounding. Exercises
    the M/N padding paths and >2-D leading dims."""
    from faceposegenerator_tpu.ops import quant_pallas

    k1, k2 = jax.random.split(jax.random.key(7))
    w = jax.random.normal(k2, (24, 40), jnp.float32) * 0.3
    qw = quant.quantize_weight(w, channel_axis=0)
    for shape in ((6, 40), (37, 40), (2, 3, 40)):
        x = jax.random.normal(k1, shape, jnp.float32)
        monkeypatch.setattr(quant, "_DENSE_IMPL", "int8")
        want = quant.qdense(x, qw)
        got = quant_pallas.qdense_pallas(
            x, qw["q"], qw["s"], block_m=16, block_n=128, interpret=True
        )
        assert got.shape == want.shape
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        # the impl switch routes through the same kernel
        monkeypatch.setattr(quant, "_DENSE_IMPL", "pallas")
        via_switch = quant.qdense(x, qw)
        np.testing.assert_array_equal(np.asarray(via_switch), np.asarray(want))
    # bf16 activations: one extra output rounding vs the fp32 return
    xb = jax.random.normal(k1, (6, 40), jnp.bfloat16)
    monkeypatch.setattr(quant, "_DENSE_IMPL", "int8")
    want = quant.qdense(xb, qw)
    got = quant_pallas.qdense_pallas(xb, qw["q"], qw["s"], interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=1e-2, atol=1e-2,
    )


def test_qdense_mixed_impl(monkeypatch):
    """QUANT_DENSE_IMPL=mixed routes on the contraction width: K below
    QUANT_MIXED_K runs dequant (exact activations), K at/above runs the
    dynamic-int8 body — each equal to forcing that impl directly."""
    x32 = jax.random.normal(jax.random.key(2), (6, 32), jnp.float32)
    x64 = jax.random.normal(jax.random.key(3), (6, 64), jnp.float32)
    w32 = quant.quantize_weight(
        jax.random.normal(jax.random.key(4), (16, 32), jnp.float32) * 0.2, 0
    )
    w64 = quant.quantize_weight(
        jax.random.normal(jax.random.key(5), (16, 64), jnp.float32) * 0.2, 0
    )
    monkeypatch.setattr(quant, "_DENSE_IMPL", "dequant")
    want_deq = quant.qdense(x32, w32)
    monkeypatch.setattr(quant, "_DENSE_IMPL", "int8")
    want_int8 = quant.qdense(x64, w64)
    monkeypatch.setattr(quant, "_DENSE_IMPL", "mixed")
    monkeypatch.setattr(quant, "_MIXED_K", 64)
    np.testing.assert_array_equal(np.asarray(quant.qdense(x32, w32)), np.asarray(want_deq))
    np.testing.assert_array_equal(np.asarray(quant.qdense(x64, w64)), np.asarray(want_int8))


# ---------------------------------------------------------------------------
# static (calibrated) activation scales
# ---------------------------------------------------------------------------


def test_static_act_scale_matches_numpy_oracle():
    """A leaf carrying "a" quantizes activations against that per-tensor
    scale with NO amax reduce — verify exact integer arithmetic."""
    k1, k2 = jax.random.split(jax.random.key(10))
    x = jax.random.normal(k1, (16, 24), jnp.float32)
    w = jax.random.normal(k2, (12, 24), jnp.float32)
    a = 0.031
    qw = quant.quantize_weight(w, channel_axis=0, act_scale=a)
    assert float(qw["a"]) == pytest.approx(a)
    got = quant.qdense(x, qw)
    xf = np.asarray(x, np.float64)
    xq = np.clip(np.rint(xf / a), -127, 127).astype(np.int32)
    wf = np.asarray(w, np.float64)
    sw = np.maximum(np.abs(wf).max(axis=1), 1e-8) / 127.0
    wq = np.clip(np.rint(wf / sw[:, None]), -127, 127).astype(np.int32)
    want = (xq @ wq.T) * a * sw
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_static_conv_matches_dynamic_when_scale_agrees():
    """When the static scale equals the batch's dynamic per-sample scale,
    the conv path produces identical integers."""
    k1, k2 = jax.random.split(jax.random.key(11))
    x = jax.random.normal(k1, (1, 8, 8, 8), jnp.float32)
    w = jax.random.normal(k2, (3, 3, 8, 12), jnp.float32) * 0.1
    amax = float(jnp.max(jnp.abs(x)))
    p_dyn = {"w": quant.quantize_weight(w, channel_axis=-1), "b": jnp.zeros((12,))}
    p_sta = {
        "w": quant.quantize_weight(w, channel_axis=-1, act_scale=amax / 127.0),
        "b": jnp.zeros((12,)),
    }
    np.testing.assert_allclose(
        np.asarray(quant.qconv2d(x, p_sta)),
        np.asarray(quant.qconv2d(x, p_dyn)),
        rtol=1e-6, atol=1e-6,
    )


def test_observe_freeze_roundtrip():
    """Eager calibration records per-site absmax keyed by weight identity;
    freeze stamps amax/127 as "a"; untouched sites stay dynamic."""
    k1, k2, k3, k4 = jax.random.split(jax.random.key(12), 4)
    x = jax.random.normal(k1, (6, 32), jnp.float32) * 3.0
    tree = {
        "seen": {"w": quant.quantize_weight(
            jax.random.normal(k2, (16, 32), jnp.float32) * 0.2, 0)},
        "unseen": {"w": quant.quantize_weight(
            jax.random.normal(k3, (16, 32), jnp.float32) * 0.2, 0)},
        "conv": {"w": quant.quantize_weight(
            jax.random.normal(k4, (3, 3, 8, 8), jnp.float32) * 0.2, -1),
            "b": jnp.zeros((8,))},
    }
    xc = jax.random.normal(k1, (2, 6, 6, 8), jnp.float32)
    with quant.observe_act_scales() as calib:
        quant.qdense(x, tree["seen"]["w"])
        quant.qdense(0.5 * x, tree["seen"]["w"])  # running max over batches
        quant.qconv2d(xc, tree["conv"])
    assert calib[id(tree["seen"]["w"]["q"])] == pytest.approx(float(jnp.max(jnp.abs(x))), rel=1e-6)
    frozen = quant.freeze_act_scales(tree, calib)
    assert float(frozen["seen"]["w"]["a"]) == pytest.approx(
        float(jnp.max(jnp.abs(x))) / 127.0, rel=1e-6
    )
    assert "a" not in frozen["unseen"]["w"]          # stays dynamic
    assert "a" in frozen["conv"]["w"]
    assert "a" not in tree["seen"]["w"]              # original untouched
    # frozen static output close to dynamic (same data as calibration)
    dyn = quant.qdense(x, tree["seen"]["w"])
    sta = quant.qdense(x, frozen["seen"]["w"])
    rel = float(jnp.linalg.norm(sta - dyn) / jnp.linalg.norm(dyn))
    assert rel < 0.02, rel


def test_observe_rejects_jit():
    """Observation requires eager execution — under jit the host fetch in
    _observe must raise, not silently record garbage."""
    x = jnp.ones((4, 16), jnp.float32)
    qw = quant.quantize_weight(jnp.ones((8, 16), jnp.float32), 0)
    with quant.observe_act_scales():
        with pytest.raises(Exception):
            jax.jit(lambda t: quant.qdense(t, qw))(x)


def test_fused_qkv_observation_and_static():
    """The fused path observes each MEMBER leaf (the concatenated q is a
    temporary) and runs static with the members' max scale."""
    k = jax.random.key(13)
    x = jax.random.normal(k, (5, 24), jnp.float32)
    ws = [
        quant.quantize_weight(
            jax.random.normal(jax.random.fold_in(k, i), (8, 24), jnp.float32) * 0.2, 0
        )
        for i in range(3)
    ]
    with quant.observe_act_scales() as calib:
        quant.qdense_fused(x, ws)
    for w in ws:
        assert id(w["q"]) in calib
    frozen = [quant.freeze_act_scales(w, calib) for w in ws]
    out = quant.qdense_fused(x, frozen)
    exact = jnp.concatenate(
        [x @ (w["q"].astype(jnp.float32) * w["s"][:, None]).T for w in ws], axis=-1
    )
    rel = float(jnp.linalg.norm(out - exact) / jnp.linalg.norm(exact))
    assert rel < 0.03, rel


def test_quantize_tree_stamps_act_scale():
    """quantize_unet(act_scale=c) stamps "a" on every quantized leaf and the
    tiny sampler still runs end-to-end on the static-quant program."""
    params = unet2d.init(jax.random.key(3), CFG, dtype=jnp.float32)
    qp = quant.quantize_unet(params, act_scale=0.05)

    leaves = []

    def walk(t):
        if isinstance(t, dict):
            if quant.is_quantized(t):
                leaves.append(t)
            else:
                for v in t.values():
                    walk(v)
        elif isinstance(t, (list, tuple)):
            for v in t:
                walk(v)

    walk(qp)
    assert leaves and all("a" in l for l in leaves)
    x = jax.random.normal(jax.random.key(4), (1, 8, 8, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.key(5), (1, 7, CFG.cross_attention_dim), jnp.float32)
    t = jnp.array([5], jnp.int32)
    out = unet2d.apply(qp, x, t, ctx, CFG, policy=PARITY_POLICY)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_pipeline_calibrate_quant():
    """quantize → calibrate_quant (eager observe) freezes "a" on every site
    reached by the calibration denoise; the compiled static program still
    samples and stays close to the dynamic-quant output."""
    from faceposegenerator_tpu.pipelines.txt2img import StableDiffusionPipeline

    pipe = StableDiffusionPipeline.from_random(
        jax.random.key(0), models=TINY, policy=PARITY_POLICY
    )
    ids = jnp.zeros((1, 77), jnp.int32)
    with pytest.raises(ValueError):
        pipe.calibrate_quant(input_ids=ids, steps=1, height=64, width=64)
    pipe.quantize("w8a8")
    dyn = pipe(input_ids=ids, num_inference_steps=2, height=64, width=64, seed=0)
    calib = pipe.calibrate_quant(input_ids=ids, steps=2, height=64, width=64)
    assert calib and all(v > 0 for v in calib.values())

    leaves = []

    def walk(t):
        if isinstance(t, dict):
            if quant.is_quantized(t):
                leaves.append(t)
            else:
                for v in t.values():
                    walk(v)
        elif isinstance(t, (list, tuple)):
            for v in t:
                walk(v)

    walk(pipe.params["unet"])
    assert leaves and all("a" in l for l in leaves)
    sta = pipe(input_ids=ids, num_inference_steps=2, height=64, width=64, seed=0)
    assert np.isfinite(np.asarray(sta, np.float32)).all()
    # images live in [0,1]; static-vs-dynamic act quantization is a small
    # perturbation when scales come from the same inputs
    assert float(jnp.max(jnp.abs(sta - dyn))) < 0.35


def test_quantize_vae_skips_and_decode():
    """quantize_vae: decoder resnet/upsample convs int8; encoder, 4-channel
    quant convs, decoder first/last convs, and mid attention stay exact.
    Quantized decode stays close to the exact decode."""
    cfg = TINY.vae_cfg
    params = vae.init(jax.random.key(7), cfg)
    q = quant.quantize_vae(params)
    assert not quant.is_quantized(q["quant_conv"]["w"])
    assert not quant.is_quantized(q["post_quant_conv"]["w"])
    assert not quant.is_quantized(q["decoder"]["conv_in"]["w"])
    assert not quant.is_quantized(q["decoder"]["conv_out"]["w"])
    assert not quant.is_quantized(q["decoder"]["mid"]["attn"]["q"]["w"])
    assert not quant.is_quantized(q["encoder"]["down_blocks"][0]["resnets"][0]["conv1"]["w"])
    assert quant.is_quantized(q["decoder"]["mid"]["res1"]["conv1"]["w"])
    assert quant.is_quantized(q["decoder"]["up_blocks"][0]["resnets"][0]["conv2"]["w"])
    z = jax.random.normal(jax.random.key(8), (1, 8, 8, 4), jnp.float32) * 0.2
    exact = vae.decode(params, z, cfg, policy=PARITY_POLICY)
    got = vae.decode(q, z, cfg, policy=PARITY_POLICY)
    rel = float(jnp.linalg.norm(got - exact) / jnp.linalg.norm(exact))
    # random 32-channel weights give no trained smoothness — per-conv int8
    # noise compounds over the ~12-deep decoder; real-weight quality is
    # measured by accel-report (quantize=w8a8,vae)
    assert rel < 0.15, rel


def test_pipeline_w8a8_vae_mode_and_calibration():
    """"w8a8+vae" quantizes both trees; calibrate_quant's trailing eager
    decode freezes static scales onto the VAE decoder sites too."""
    from faceposegenerator_tpu.pipelines.txt2img import StableDiffusionPipeline

    pipe = StableDiffusionPipeline.from_random(
        jax.random.key(0), models=TINY, policy=PARITY_POLICY
    )
    pipe.quantize("w8a8+vae")
    assert quant.is_quantized(pipe.params["vae"]["decoder"]["mid"]["res1"]["conv1"]["w"])
    ids = jnp.zeros((1, 77), jnp.int32)
    out = pipe(input_ids=ids, num_inference_steps=2, height=64, width=64, seed=0)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    pipe.calibrate_quant(input_ids=ids, steps=1, height=64, width=64)
    leaf = pipe.params["vae"]["decoder"]["mid"]["res1"]["conv1"]["w"]
    assert "a" in leaf and float(leaf["a"]) > 0
    out2 = pipe(input_ids=ids, num_inference_steps=2, height=64, width=64, seed=0)
    assert np.isfinite(np.asarray(out2, np.float32)).all()


def test_calibrate_embed_quant():
    """Eager IResNet calibration freezes static scales on every body site;
    the jitted static program stays close to dynamic quant."""
    from faceposegenerator_tpu.models import iresnet
    from faceposegenerator_tpu.pipelines.embed_extract import calibrate_embed_quant

    cfg = iresnet.IResNetConfig(depths=(1, 1, 1, 1), num_features=64)
    params, state = iresnet.init(jax.random.key(20), cfg)
    with pytest.raises(ValueError):
        calibrate_embed_quant(params, state, jnp.zeros((2, 112, 112, 3)), cfg=cfg)
    qp = quant.quantize_iresnet(params)
    x = jax.random.uniform(jax.random.key(21), (2, 112, 112, 3), minval=-1.0, maxval=1.0)
    sp = calibrate_embed_quant(qp, state, [x], cfg=cfg, policy=PARITY_POLICY)

    n_static, n_dyn = [0], [0]

    def walk(t):
        if isinstance(t, dict):
            if quant.is_quantized(t):
                (n_static if "a" in t else n_dyn)[0] += 1
            else:
                for v in t.values():
                    walk(v)
        elif isinstance(t, (list, tuple)):
            for v in t:
                walk(v)

    walk(sp)
    assert n_static[0] > 0 and n_dyn[0] == 0, (n_static, n_dyn)
    e_dyn, _ = iresnet.apply(qp, state, x, cfg, policy=PARITY_POLICY, train=False)
    e_sta, _ = iresnet.apply(sp, state, x, cfg, policy=PARITY_POLICY, train=False)
    cos = float(
        jnp.sum(e_dyn * e_sta)
        / (jnp.linalg.norm(e_dyn) * jnp.linalg.norm(e_sta))
    )
    assert cos > 0.99, cos


def test_save_load_act_scales(tmp_path):
    """Scale serialization round-trip: save from a calibrated tree, load
    onto a fresh dynamic quantization of the SAME weights → identical
    static programs; layout drift raises."""
    from faceposegenerator_tpu.pipelines.txt2img import StableDiffusionPipeline

    pipe = StableDiffusionPipeline.from_random(
        jax.random.key(0), models=TINY, policy=PARITY_POLICY
    )
    ids = jnp.zeros((1, 77), jnp.int32)
    pipe.quantize("w8a8+vae")
    pipe.calibrate_quant(input_ids=ids, steps=1, height=64, width=64)
    path = str(tmp_path / "scales.json")
    n = pipe.save_quant_scales(path)
    assert n > 0
    ref = pipe(input_ids=ids, num_inference_steps=2, height=64, width=64, seed=0)

    pipe2 = StableDiffusionPipeline.from_random(
        jax.random.key(0), models=TINY, policy=PARITY_POLICY
    )
    pipe2.quantize("w8a8+vae")
    pipe2.load_quant_scales(path)
    got = pipe2(input_ids=ids, num_inference_steps=2, height=64, width=64, seed=0)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    # drift: a tree quantized WITHOUT vae is missing saved sites -> loud
    pipe3 = StableDiffusionPipeline.from_random(
        jax.random.key(0), models=TINY, policy=PARITY_POLICY
    )
    pipe3.quantize("w8a8")
    with pytest.raises(ValueError):
        pipe3.load_quant_scales(path)
