"""Weights-bridge and LoRA-IO tests: structure round-trips, torch conv
orientation, diffusers/peft key compatibility."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceposegenerator_tpu.bridge.torch_weights import (
    convert_unet_state_dict,
    convert_clip_text_state_dict,
    convert_vae_state_dict,
)
from faceposegenerator_tpu.diffusion.lora_io import (
    lora_from_state_dict,
    lora_to_state_dict,
    save_lora_safetensors,
    load_lora_safetensors,
)
from faceposegenerator_tpu.models import clip_text, unet2d, vae


TINY_UNET = unet2d.UNetConfig(
    block_out_channels=(32, 64, 96, 96), cross_attention_dim=48, head_dim=8
)
TINY_TEXT = clip_text.CLIPTextConfig(
    vocab_size=64, hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64
)
TINY_VAE = vae.VAEConfig(block_out_channels=(32, 32, 64, 64))


def _conv_sd(p):
    return {"weight": np.asarray(p["w"]).transpose(3, 2, 0, 1), "bias": np.asarray(p["b"])}


def _dense_sd(p):
    d = {"weight": np.asarray(p["w"])}
    if "b" in p:
        d["bias"] = np.asarray(p["b"])
    return d


def _norm_sd(p):
    return {"weight": np.asarray(p["g"]), "bias": np.asarray(p["b"])}


def _flatten(prefix, d, out):
    for k, v in d.items():
        out[f"{prefix}.{k}" if prefix else k] = v


def _emit_resblock(sd, prefix, p, temb=True):
    _flatten(f"{prefix}.norm1", _norm_sd(p["norm1"]), sd)
    _flatten(f"{prefix}.conv1", _conv_sd(p["conv1"]), sd)
    _flatten(f"{prefix}.norm2", _norm_sd(p["norm2"]), sd)
    _flatten(f"{prefix}.conv2", _conv_sd(p["conv2"]), sd)
    if temb:
        _flatten(f"{prefix}.time_emb_proj", _dense_sd(p["time_emb_proj"]), sd)
    if "conv_shortcut" in p:
        _flatten(f"{prefix}.conv_shortcut", _conv_sd(p["conv_shortcut"]), sd)


def _emit_attn(sd, prefix, p):
    _flatten(f"{prefix}.to_q", _dense_sd(p["q"]), sd)
    _flatten(f"{prefix}.to_k", _dense_sd(p["k"]), sd)
    _flatten(f"{prefix}.to_v", _dense_sd(p["v"]), sd)
    _flatten(f"{prefix}.to_out.0", _dense_sd(p["out"]), sd)


def _emit_transformer(sd, prefix, p):
    _flatten(f"{prefix}.norm", _norm_sd(p["norm"]), sd)
    _flatten(f"{prefix}.proj_in", _dense_sd(p["proj_in"]), sd)
    _flatten(f"{prefix}.proj_out", _dense_sd(p["proj_out"]), sd)
    for k, blk in enumerate(p["blocks"]):
        b = f"{prefix}.transformer_blocks.{k}"
        _flatten(f"{b}.norm1", _norm_sd(blk["ln1"]), sd)
        _emit_attn(sd, f"{b}.attn1", blk["attn1"])
        _flatten(f"{b}.norm2", _norm_sd(blk["ln2"]), sd)
        _emit_attn(sd, f"{b}.attn2", blk["attn2"])
        _flatten(f"{b}.norm3", _norm_sd(blk["ln3"]), sd)
        _flatten(f"{b}.ff.net.0.proj", _dense_sd(blk["ff_in"]), sd)
        _flatten(f"{b}.ff.net.2", _dense_sd(blk["ff_out"]), sd)


def _unet_params_to_diffusers_sd(params):
    sd = {}
    _flatten("conv_in", _conv_sd(params["conv_in"]), sd)
    _flatten("time_embedding.linear_1", _dense_sd(params["time_embedding"]["linear_1"]), sd)
    _flatten("time_embedding.linear_2", _dense_sd(params["time_embedding"]["linear_2"]), sd)
    for i, block in enumerate(params["down_blocks"]):
        for j, rp in enumerate(block["resnets"]):
            _emit_resblock(sd, f"down_blocks.{i}.resnets.{j}", rp)
        if block["attentions"] is not None:
            for j, tr in enumerate(block["attentions"]):
                _emit_transformer(sd, f"down_blocks.{i}.attentions.{j}", tr)
        if block["downsample"] is not None:
            _flatten(f"down_blocks.{i}.downsamplers.0.conv", _conv_sd(block["downsample"]), sd)
    for j, rp in enumerate(params["mid_block"]["resnets"]):
        _emit_resblock(sd, f"mid_block.resnets.{j}", rp)
    _emit_transformer(sd, "mid_block.attentions.0", params["mid_block"]["attentions"][0])
    for i, block in enumerate(params["up_blocks"]):
        for j, rp in enumerate(block["resnets"]):
            _emit_resblock(sd, f"up_blocks.{i}.resnets.{j}", rp)
        if block["attentions"] is not None:
            for j, tr in enumerate(block["attentions"]):
                _emit_transformer(sd, f"up_blocks.{i}.attentions.{j}", tr)
        if block["upsample"] is not None:
            _flatten(f"up_blocks.{i}.upsamplers.0.conv", _conv_sd(block["upsample"]), sd)
    _flatten("conv_norm_out", _norm_sd(params["conv_norm_out"]), sd)
    _flatten("conv_out", _conv_sd(params["conv_out"]), sd)
    return sd


def test_unet_state_dict_roundtrip():
    params = unet2d.init(jax.random.key(0), TINY_UNET)
    sd = _unet_params_to_diffusers_sd(params)
    restored = convert_unet_state_dict(sd, TINY_UNET)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0),
        params,
        restored,
    )


def test_clip_state_dict_roundtrip():
    params = clip_text.init(jax.random.key(0), TINY_TEXT)
    sd = {
        "text_model.embeddings.token_embedding.weight": np.asarray(params["token_embedding"]),
        "text_model.embeddings.position_embedding.weight": np.asarray(params["position_embedding"]),
    }
    _flatten("text_model.final_layer_norm", _norm_sd(params["final_ln"]), sd)
    for i, layer in enumerate(params["layers"]):
        p = f"text_model.encoder.layers.{i}"
        _flatten(f"{p}.layer_norm1", _norm_sd(layer["ln1"]), sd)
        _flatten(f"{p}.self_attn.q_proj", _dense_sd(layer["q"]), sd)
        _flatten(f"{p}.self_attn.k_proj", _dense_sd(layer["k"]), sd)
        _flatten(f"{p}.self_attn.v_proj", _dense_sd(layer["v"]), sd)
        _flatten(f"{p}.self_attn.out_proj", _dense_sd(layer["out"]), sd)
        _flatten(f"{p}.layer_norm2", _norm_sd(layer["ln2"]), sd)
        _flatten(f"{p}.mlp.fc1", _dense_sd(layer["fc1"]), sd)
        _flatten(f"{p}.mlp.fc2", _dense_sd(layer["fc2"]), sd)
    restored = convert_clip_text_state_dict(sd, TINY_TEXT)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0),
        params,
        restored,
    )


def test_vae_state_dict_roundtrip():
    params = vae.init(jax.random.key(0), TINY_VAE)
    sd = {}
    enc, dec = params["encoder"], params["decoder"]
    _flatten("encoder.conv_in", _conv_sd(enc["conv_in"]), sd)
    for i, block in enumerate(enc["down_blocks"]):
        for j, rp in enumerate(block["resnets"]):
            _emit_resblock(sd, f"encoder.down_blocks.{i}.resnets.{j}", rp, temb=False)
        if block["downsample"] is not None:
            _flatten(f"encoder.down_blocks.{i}.downsamplers.0.conv", _conv_sd(block["downsample"]), sd)

    def emit_mid(prefix, mid):
        _emit_resblock(sd, f"{prefix}.resnets.0", mid["res1"], temb=False)
        _emit_resblock(sd, f"{prefix}.resnets.1", mid["res2"], temb=False)
        a = mid["attn"]
        _flatten(f"{prefix}.attentions.0.group_norm", _norm_sd(a["norm"]), sd)
        _flatten(f"{prefix}.attentions.0.to_q", _dense_sd(a["q"]), sd)
        _flatten(f"{prefix}.attentions.0.to_k", _dense_sd(a["k"]), sd)
        _flatten(f"{prefix}.attentions.0.to_v", _dense_sd(a["v"]), sd)
        _flatten(f"{prefix}.attentions.0.to_out.0", _dense_sd(a["out"]), sd)

    emit_mid("encoder.mid_block", enc["mid"])
    _flatten("encoder.conv_norm_out", _norm_sd(enc["norm_out"]), sd)
    _flatten("encoder.conv_out", _conv_sd(enc["conv_out"]), sd)
    _flatten("decoder.conv_in", _conv_sd(dec["conv_in"]), sd)
    emit_mid("decoder.mid_block", dec["mid"])
    for i, block in enumerate(dec["up_blocks"]):
        for j, rp in enumerate(block["resnets"]):
            _emit_resblock(sd, f"decoder.up_blocks.{i}.resnets.{j}", rp, temb=False)
        if block["upsample"] is not None:
            _flatten(f"decoder.up_blocks.{i}.upsamplers.0.conv", _conv_sd(block["upsample"]), sd)
    _flatten("decoder.conv_norm_out", _norm_sd(dec["norm_out"]), sd)
    _flatten("decoder.conv_out", _conv_sd(dec["conv_out"]), sd)
    _flatten("quant_conv", _conv_sd(params["quant_conv"]), sd)
    _flatten("post_quant_conv", _conv_sd(params["post_quant_conv"]), sd)
    restored = convert_vae_state_dict(sd, TINY_VAE)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0),
        params,
        restored,
    )


def test_conv_orientation_vs_torch():
    """OIHW→HWIO conversion gives identical conv outputs."""
    torch = pytest.importorskip("torch")
    conv = torch.nn.Conv2d(3, 8, 3, stride=2, padding=1)
    x = np.random.default_rng(0).standard_normal((1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = conv(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)
    p = {
        "w": jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 1, 0)),
        "b": jnp.asarray(conv.bias.detach().numpy()),
    }
    out = unet2d.conv2d(jnp.asarray(x.transpose(0, 2, 3, 1)), p, stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_lora_roundtrip_and_peft_keys(tmp_path):
    params = unet2d.init(jax.random.key(0), TINY_UNET)
    lora = unet2d.init_lora(jax.random.key(1), params, rank=4)
    # randomize B so the roundtrip is nontrivial
    lora = jax.tree.map(lambda x: x + 0.1, lora)
    sd = lora_to_state_dict({"unet": lora})
    # spot-check peft-style key naming
    assert "unet.mid_block.attentions.0.transformer_blocks.0.attn1.to_q.lora_A.weight" in sd
    assert "unet.down_blocks.0.attentions.1.transformer_blocks.0.attn2.to_out.0.lora_B.weight" in sd

    path = str(tmp_path / "ckpt" / "pytorch_lora_weights.safetensors")
    save_lora_safetensors({"unet": lora}, path)
    restored = load_lora_safetensors(str(tmp_path / "ckpt"), params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0),
        lora,
        restored["unet"],
    )


def test_lora_from_partial_state_dict_zero_fills():
    params = unet2d.init(jax.random.key(0), TINY_UNET)
    sd = {
        "unet.mid_block.attentions.0.transformer_blocks.0.attn1.to_q.lora_A.weight": np.ones(
            (4, 96), np.float32
        ),
        "unet.mid_block.attentions.0.transformer_blocks.0.attn1.to_q.lora_B.weight": np.ones(
            (96, 4), np.float32
        ),
    }
    lora = lora_from_state_dict(sd, params)
    target = lora["unet"]["mid_block"]["attentions"][0]["blocks"][0]["attn1"]["q"]
    np.testing.assert_allclose(np.asarray(target["a"]), 1.0)
    # everything else is zero → identity
    other = lora["unet"]["down_blocks"][0]["attentions"][0]["blocks"][0]["attn1"]["q"]
    np.testing.assert_allclose(np.asarray(other["b"]), 0.0)


def test_lora_alpha_scaling_and_mixed_rank_guard():
    """network_alpha != rank must fold alpha/rank into B (peft applies
    alpha/rank as the adapter scale; silently assuming alpha == rank loads
    wrong effective weights). Mixed ranks raise instead of max()-guessing."""
    import pytest

    params = unet2d.init(jax.random.key(0), TINY_UNET)
    base = "unet.mid_block.attentions.0.transformer_blocks.0.attn1.to_q"
    sd = {
        f"{base}.lora_A.weight": np.ones((4, 96), np.float32),
        f"{base}.lora_B.weight": np.full((96, 4), 2.0, np.float32),
        f"{base}.alpha": np.asarray(2.0, np.float32),  # alpha 2, rank 4 → scale 0.5
    }
    lora = lora_from_state_dict(sd, params)
    target = lora["unet"]["mid_block"]["attentions"][0]["blocks"][0]["attn1"]["q"]
    np.testing.assert_allclose(np.asarray(target["b"]), 1.0)  # 2.0 * (2/4)
    np.testing.assert_allclose(np.asarray(target["a"]), 1.0)  # A untouched

    # alpha == rank → no rescale
    sd[f"{base}.alpha"] = np.asarray(4.0, np.float32)
    lora = lora_from_state_dict(sd, params)
    target = lora["unet"]["mid_block"]["attentions"][0]["blocks"][0]["attn1"]["q"]
    np.testing.assert_allclose(np.asarray(target["b"]), 2.0)

    # mixed ranks: refuse rather than silently taking max
    base2 = "unet.mid_block.attentions.0.transformer_blocks.0.attn1.to_k"
    sd2 = {
        f"{base}.lora_A.weight": np.ones((4, 96), np.float32),
        f"{base}.lora_B.weight": np.ones((96, 4), np.float32),
        f"{base2}.lora_A.weight": np.ones((8, 96), np.float32),
        f"{base2}.lora_B.weight": np.ones((96, 8), np.float32),
    }
    with pytest.raises(ValueError, match="mixed LoRA ranks"):
        lora_from_state_dict(sd2, params)
