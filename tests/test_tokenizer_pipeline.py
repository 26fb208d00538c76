"""CLIP BPE tokenizer unit tests + pipeline API tests."""

import jax
import jax.numpy as jnp
import numpy as np

from faceposegenerator_tpu.data.tokenizer import CLIPTokenizer, bytes_to_unicode
from faceposegenerator_tpu.diffusion.sampler import SamplerModels
from faceposegenerator_tpu.models import clip_text, unet2d, vae
from faceposegenerator_tpu.pipelines import StableDiffusionPipeline


def _tiny_tokenizer():
    # chars a..z as both mid-word and end-of-word tokens + one merge
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for i, c in enumerate("abcdefghijklmnopqrstuvwxyz"):
        vocab[c] = 2 + 2 * i
        vocab[c + "</w>"] = 3 + 2 * i
    vocab["ab</w>"] = 100
    vocab["ph"] = 101
    vocab["ph" + "oto</w>"] = None  # unused
    del vocab["photo</w>"]
    merges = [("a", "b</w>"), ("p", "h")]
    return CLIPTokenizer(vocab, merges, model_max_length=16)


def test_bytes_to_unicode_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256


def test_tokenizer_merge_and_padding():
    tok = _tiny_tokenizer()
    ids = tok("ab")
    assert ids.shape == (1, 16)
    assert ids[0, 0] == 0  # bos
    assert ids[0, 1] == 100  # merged "ab</w>"
    assert ids[0, 2] == 1  # eos
    assert (ids[0, 3:] == 1).all()  # eos padding (SD1.x default, no pad_token)

    ids2 = tok("ba")
    # no merge for "ba": b then a</w>
    assert ids2[0, 1] == tok.vocab["b"]
    assert ids2[0, 2] == tok.vocab["a</w>"]


def test_tokenizer_cleanup_and_batching():
    tok = _tiny_tokenizer()
    batch = tok(["AB", "  a   b "])  # lowercased, whitespace collapsed
    assert batch.shape == (2, 16)
    assert batch[0, 1] == 100
    assert batch[1, 1] == tok.vocab["a</w>"]
    assert batch[1, 2] == tok.vocab["b</w>"]


def test_tokenizer_sd2_pad_token(tmp_path):
    """SD2.x tokenizer_config.json sets pad_token '!' (id 0); the reference
    runs CLIP without an attention mask, so padding must use that id — not
    EOS — for conditioning parity (sd21 tokenizer_config.json semantics)."""
    import json

    vocab = {"<|startoftext|>": 49406, "<|endoftext|>": 49407, "!": 0}
    for i, c in enumerate("abcdefghijklmnopqrstuvwxyz"):
        vocab[c] = 2 + 2 * i
        vocab[c + "</w>"] = 3 + 2 * i
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n")
    (tmp_path / "tokenizer_config.json").write_text(
        json.dumps({"pad_token": "!", "model_max_length": 77})
    )
    tok = CLIPTokenizer.from_pretrained(str(tmp_path), model_max_length=8)
    ids = tok("ab")
    assert ids[0, 0] == 49406  # bos
    assert ids[0, 3] == 49407  # eos after a, b
    assert (ids[0, 4:] == 0).all()  # '!' padding, not eos

    # AddedToken dict form also parses
    (tmp_path / "tokenizer_config.json").write_text(
        json.dumps({"pad_token": {"content": "!", "lstrip": False}})
    )
    tok2 = CLIPTokenizer.from_pretrained(str(tmp_path), model_max_length=8)
    assert tok2.pad_token_id == 0

    # no tokenizer_config.json → SD1.x EOS padding
    (tmp_path / "tokenizer_config.json").unlink()
    tok3 = CLIPTokenizer.from_pretrained(str(tmp_path), model_max_length=8)
    assert tok3.pad_token_id == tok3.eos_token_id


def test_tokenizer_truncation():
    tok = _tiny_tokenizer()
    ids = tok("c " * 40)  # 40 tokens > max 16
    assert ids.shape == (1, 16)
    assert ids[0, -1] == 1  # ends with eos


TINY = SamplerModels(
    text_cfg=clip_text.CLIPTextConfig(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64
    ),
    unet_cfg=unet2d.UNetConfig(
        block_out_channels=(32, 32, 32, 32), cross_attention_dim=32, head_dim=8
    ),
    vae_cfg=vae.VAEConfig(block_out_channels=(32, 32, 32, 32)),
)


def test_pipeline_generate_and_lora_swap(tmp_path):
    from faceposegenerator_tpu.diffusion.lora_io import save_lora_safetensors

    pipe = StableDiffusionPipeline.from_random(models=TINY)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, (1, 77)), jnp.int32)

    img = pipe(input_ids=ids, num_inference_steps=2, width=64, height=64, seed=3)
    assert img.shape == (1, 64, 64, 3)

    # same seed → same image; different seed → different
    img2 = pipe(input_ids=ids, num_inference_steps=2, width=64, height=64, seed=3)
    np.testing.assert_array_equal(img, img2)
    img3 = pipe(input_ids=ids, num_inference_steps=2, width=64, height=64, seed=4)
    assert not np.allclose(img, img3)

    # zero-B LoRA checkpoint loads and is an exact no-op
    lora_u = unet2d.init_lora(jax.random.key(5), pipe.params["unet"], rank=4)
    path = str(tmp_path / "ck")
    save_lora_safetensors({"unet": lora_u}, path + "/pytorch_lora_weights.safetensors")
    pipe.load_lora_weights(path)
    img4 = pipe(input_ids=ids, num_inference_steps=2, width=64, height=64, seed=3)
    np.testing.assert_allclose(img4, img, atol=1e-5)

    # nonzero LoRA changes the output
    lora_u = jax.tree.map(lambda x: x + 0.05, lora_u)
    save_lora_safetensors({"unet": lora_u}, path + "/pytorch_lora_weights.safetensors")
    pipe.load_lora_weights(path)
    img5 = pipe(input_ids=ids, num_inference_steps=2, width=64, height=64, seed=3)
    assert not np.allclose(img5, img)

    # dpm scheduler path
    pipe.set_scheduler("dpm")
    img6 = pipe(input_ids=ids, num_inference_steps=2, width=64, height=64, seed=3)
    assert img6.shape == (1, 64, 64, 3)
