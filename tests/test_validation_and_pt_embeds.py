"""Validation-sampling path in the driver + torch .pt embed interop."""

import os

import jax
import numpy as np
import pytest

from faceposegenerator_tpu.core.precision import PARITY_POLICY
from faceposegenerator_tpu.data.dreambooth import DreamBoothDataset
from faceposegenerator_tpu.data.tokenizer import CLIPTokenizer
from faceposegenerator_tpu.models import clip_text, unet2d, vae, iresnet
from faceposegenerator_tpu.training import idbooth, idbooth_driver


def test_pt_embed_interop(tmp_path):
    torch = pytest.importorskip("torch")
    from PIL import Image

    inst = tmp_path / "img"
    emb = tmp_path / "emb"
    inst.mkdir()
    emb.mkdir()
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(inst / "a.jpg")
    vec = rng.standard_normal(32).astype(np.float32)
    torch.save(torch.from_numpy(vec), emb / "a.pt")  # reference's format

    ds = DreamBoothDataset(
        str(inst), np.arange(77, dtype=np.int32), embeds_dir=str(emb),
        resolution=64, embed_dim=32,
    )
    item = ds[0]
    np.testing.assert_allclose(item["instance_embed"], vec, atol=1e-6)


def test_driver_validation_sampling(tmp_path):
    from PIL import Image

    TINY = idbooth.ModelBundle(
        text_cfg=clip_text.CLIPTextConfig(
            vocab_size=512, hidden_size=32, num_layers=1, num_heads=4, intermediate_size=64
        ),
        unet_cfg=unet2d.UNetConfig(
            block_out_channels=(32, 32, 32, 32), cross_attention_dim=32, head_dim=8
        ),
        vae_cfg=vae.VAEConfig(block_out_channels=(32, 32, 32, 32)),
        arcface_cfg=iresnet.config_for("r18", num_features=32),
    )
    ap, ast = iresnet.init(jax.random.key(3), TINY.arcface_cfg)
    frozen = {
        "text_encoder": clip_text.init(jax.random.key(0), TINY.text_cfg),
        "unet": unet2d.init(jax.random.key(1), TINY.unet_cfg),
        "vae": vae.init(jax.random.key(2), TINY.vae_cfg),
        "arcface": {"params": ap, "state": ast},
    }
    inst = tmp_path / "img"
    inst.mkdir()
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(inst / "a.jpg")

    # tiny real tokenizer so validation prompts tokenize
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for i, c in enumerate("abcdefghijklmnopqrstuvwxyz"):
        vocab[c] = 2 + 2 * i
        vocab[c + "</w>"] = 3 + 2 * i
    tok = CLIPTokenizer(vocab, [], model_max_length=77)

    cfg = idbooth.IDBoothConfig(
        which_loss="", with_prior_preservation=False, resolution=64,
        num_train_epochs=1, checkpointing_epochs=1, validation_epochs=1,
        num_validation_images=2, validation_prompt="a b c",
    )
    out = str(tmp_path / "run")
    _, history = idbooth_driver.run_identity(
        cfg, TINY, frozen, str(inst), out, tokenizer=tok, policy=PARITY_POLICY
    )
    val = os.path.join(out, "validation", "epoch_0.png")
    assert os.path.exists(val), "validation grid missing (sampling path failed)"
    # tracker artifacts
    assert os.path.exists(os.path.join(out, "logs", "scalars.jsonl"))
