"""Smoke test for the real-checkpoint parity runbook (`cli.py parity`):
builds a tiny random diffusers-layout model directory (unet/vae/text_encoder
safetensors + config.json files), runs the command, and asserts the verdict
passes — so the runbook is executable code, not prose, the day real SD2.1
weights appear (VERDICT r1 #10; docs/PARITY.md)."""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
from safetensors.numpy import save_file

from faceposegenerator_tpu.bridge.torch_mirror import TUNet, TVAE
from faceposegenerator_tpu.cli import main
from faceposegenerator_tpu.models import unet2d, vae


def _write_tiny_model_dir(root):
    torch.manual_seed(0)
    unet_cfg = unet2d.UNetConfig(
        block_out_channels=(32, 64, 64, 64), cross_attention_dim=32, head_dim=8
    )
    vae_cfg = vae.VAEConfig(block_out_channels=(32, 32, 32, 32))

    os.makedirs(os.path.join(root, "unet"))
    os.makedirs(os.path.join(root, "vae"))
    os.makedirs(os.path.join(root, "text_encoder"))

    tm = TUNet(unet_cfg)
    save_file(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()},
        os.path.join(root, "unet", "diffusion_pytorch_model.safetensors"),
    )
    with open(os.path.join(root, "unet", "config.json"), "w") as f:
        json.dump(
            {
                "block_out_channels": list(unet_cfg.block_out_channels),
                "cross_attention_dim": 32,
                # diffusers stores per-level HEAD COUNTS here for SD2.x
                "attention_head_dim": [c // 8 for c in unet_cfg.block_out_channels],
                "layers_per_block": 2,
                "in_channels": 4,
                "out_channels": 4,
                "norm_num_groups": 32,
                "down_block_types": [
                    "CrossAttnDownBlock2D",
                    "CrossAttnDownBlock2D",
                    "CrossAttnDownBlock2D",
                    "DownBlock2D",
                ],
            },
            f,
        )

    tv = TVAE(vae_cfg)
    save_file(
        {k: v.detach().numpy() for k, v in tv.state_dict().items()},
        os.path.join(root, "vae", "diffusion_pytorch_model.safetensors"),
    )
    with open(os.path.join(root, "vae", "config.json"), "w") as f:
        json.dump(
            {
                "block_out_channels": list(vae_cfg.block_out_channels),
                "latent_channels": 4,
                "layers_per_block": 2,
                "scaling_factor": 0.18215,
            },
            f,
        )

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=128,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=77,
        hidden_act="gelu",
    )
    te = transformers.CLIPTextModel(hf_cfg).eval()
    save_file(
        {k: v.detach().numpy() for k, v in te.state_dict().items()},
        os.path.join(root, "text_encoder", "model.safetensors"),
    )
    with open(os.path.join(root, "text_encoder", "config.json"), "w") as f:
        json.dump(
            {
                "vocab_size": 128,
                "hidden_size": 32,
                "num_hidden_layers": 2,
                "num_attention_heads": 4,
                "intermediate_size": 64,
                "max_position_embeddings": 77,
                "hidden_act": "gelu",
            },
            f,
        )


def test_parity_command_passes_on_tiny_random_checkpoint(tmp_path):
    model_dir = str(tmp_path / "sd")
    _write_tiny_model_dir(model_dir)
    out = str(tmp_path / "verdict.json")
    rc = main(
        [
            "parity",
            "--model_dir", model_dir,
            "--steps", "3",
            "--resolution", "64",
            "--output", out,
        ]
    )
    assert rc == 0
    verdict = json.load(open(out))
    assert verdict["pass"] is True, verdict
    assert len(verdict["eps_max_abs_per_step"]) == 3
    assert max(verdict["eps_max_abs_per_step"]) < 5e-4
    assert verdict["image_max_abs"] < 5e-4
    assert verdict["unet_missing_keys"] == 0 and verdict["vae_missing_keys"] == 0


def test_parity_arcface_leg(tmp_path):
    """Identity-stack leg (VERDICT r2 #8): a random torch iresnet18 .pth is
    converted, embedded in JAX, and compared against the reference torch
    implementation loading the SAME file."""
    import sys

    sys.path.insert(0, "/root/reference")
    from ArcFace_files.backbones import iresnet as torch_iresnet

    torch.manual_seed(1)
    tm = torch_iresnet.iresnet18(num_features=512)
    pth = str(tmp_path / "arcface_r18.pth")
    torch.save(tm.state_dict(), pth)

    out = str(tmp_path / "verdict.json")
    rc = main([
        "parity", "--arcface_pth", pth, "--arcface_network", "r18",
        "--output", out,
    ])
    assert rc == 0
    verdict = json.load(open(out))
    assert verdict["pass"] is True, verdict
    assert verdict["arcface"]["embed_rel"] < 1e-3
    assert "eps_max_abs_per_step" not in verdict  # diffusion leg not run


def test_parity_mtcnn_leg(tmp_path):
    """MTCNN leg: random facenet-pytorch-layout pnet/rnet/onet .pt files —
    converted weights' net outputs must match the torch mirrors."""
    from faceposegenerator_tpu.bridge.torch_mirror import TONet, TPNet, TRNet

    torch.manual_seed(2)
    d = tmp_path / "mtcnn"
    d.mkdir()
    for name, cls in (("pnet", TPNet), ("rnet", TRNet), ("onet", TONet)):
        torch.save(cls().state_dict(), d / f"{name}.pt")

    out = str(tmp_path / "verdict.json")
    rc = main(["parity", "--mtcnn", str(d), "--output", out])
    assert rc == 0
    verdict = json.load(open(out))
    assert verdict["pass"] is True, verdict
    assert max(verdict["mtcnn"]["net_max_abs"].values()) < 5e-3


def test_generate_cli_streaming_eval(tmp_path):
    """`cli generate --eval`: the synthesis sweep with CR-FIQA + pose
    streamed from the in-memory device batches — writes the PNG tree AND
    eval artifacts without re-reading images from disk."""
    model_dir = str(tmp_path / "sd")
    _write_tiny_model_dir(model_dir)
    # byte-fallback tokenizer files so from_pretrained gets a tokenizer
    from faceposegenerator_tpu.data.tokenizer import bytes_to_unicode

    tok_dir = os.path.join(model_dir, "tokenizer")
    os.makedirs(tok_dir)
    units = list(bytes_to_unicode().values())
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for u in units:
        vocab.setdefault(u, len(vocab))
        vocab.setdefault(u + "</w>", len(vocab))
    with open(os.path.join(tok_dir, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(tok_dir, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")

    lora_root = str(tmp_path / "loras")
    # identities are discovered under the FIRST model variant's folder; no
    # checkpoint subdir → the sweep samples the base model (bench behavior)
    for variant in ("DreamBooth", "PortraitBooth", "ID-Booth"):
        os.makedirs(os.path.join(lora_root, variant, "0"))
    out = str(tmp_path / "gen")
    rc = main([
        "generate", "--model_dir", model_dir, "--lora_root", lora_root,
        "--output", out, "--num_prompts", "2", "--steps", "2",
        "--batch_size", "2", "--eval", "--fiqa_network", "r18",
    ])
    assert rc == 0
    import numpy as np_

    eval_dir = os.path.join(out, "eval")
    lines = open(os.path.join(eval_dir, "fiqa_scores.txt")).read().strip().split("\n")
    assert len(lines) == 6 and all(len(l.split()) == 2 for l in lines)  # 3 variants × 2
    stats = json.load(open(os.path.join(eval_dir, "pose_stats.json")))
    assert stats["global"]["count"] == 6
    assert set(stats["per_id"]) == {f"{v}/0" for v in ("DreamBooth", "PortraitBooth", "ID-Booth")}
    assert os.path.exists(os.path.join(out, "ID-Booth", "0", "0_000.png"))


def test_parity_full_chain_leg(tmp_path):
    """--full_chain (VERDICT r3 #2): the jitted sampler vs an all-torch
    CLIP→UNet→DDPM→VAE loop, per scheduler step, off the same tiny
    checkpoint directory — the leg the real-weights runbook executes."""
    model_dir = str(tmp_path / "sd")
    os.makedirs(model_dir)
    _write_tiny_model_dir(model_dir)
    out = str(tmp_path / "verdict.json")
    rc = main(
        [
            "parity",
            "--model_dir", model_dir,
            "--steps", "3",
            "--resolution", "64",
            "--full_chain",
            "--output", out,
        ]
    )
    assert rc == 0
    verdict = json.load(open(out))
    chain = verdict["full_chain"]
    assert chain["pass"] is True, chain
    assert len(chain["latent_max_abs_per_step"]) == 3
    assert chain["latent_max_abs"] < 5e-3
    assert chain["image_max_abs"] < 5e-3
    assert chain["text_missing_keys"] == 0
    assert verdict["pass"] is True, verdict


def test_parity_all_runbook(tmp_path):
    """`cli parity-all` (VERDICT r3 #9): ONE command off one weights root
    runs every available leg + the preset quality reports and emits one
    verdict JSON; absent pieces are listed as skipped, not errors."""
    root = tmp_path / "weights"
    sd = root / "sd"
    os.makedirs(sd)
    _write_tiny_model_dir(str(sd))
    # tokenizer so the report runs real prompts
    from faceposegenerator_tpu.data.tokenizer import bytes_to_unicode

    tok = sd / "tokenizer"
    os.makedirs(tok)
    units = list(bytes_to_unicode().values())
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for u in units:
        vocab.setdefault(u, len(vocab))
        vocab.setdefault(u + "</w>", len(vocab))
    with open(tok / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(tok / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")

    # a random iresnet18 .pth so the preset-quality identity-cosine rows
    # execute end to end BEFORE real weights land (VERDICT r4 #4)
    import sys

    sys.path.insert(0, "/root/reference")
    from ArcFace_files.backbones import iresnet as torch_iresnet

    torch.manual_seed(1)
    torch.save(torch_iresnet.iresnet18(num_features=512).state_dict(),
               str(root / "arcface.pth"))

    out = str(tmp_path / "verdict.json")
    rc = main([
        "parity-all", "--weights_root", str(root),
        "--steps", "3", "--report_steps", "21", "--resolution", "64",
        "--arcface_network", "r18",
        # PSNR gates stay at their shipped floor-relative defaults — the
        # presets must clear them even on random weights (VERDICT r4 #4);
        # identity-cos is overridden because a RANDOM ArcFace's cosine
        # between two renders is arbitrary (the rows still execute).
        "--min_identity_cos", "-1.0",
        "--output", out,
    ])
    assert rc == 0
    verdict = json.load(open(out))
    assert set(verdict["legs"]) == {"parity", "preset_quality"}
    assert verdict["legs"]["parity"]["full_chain"]["pass"] is True
    gates = verdict["legs"]["preset_quality"]["gates"]
    # EVERY shipped preset must appear in the runbook verdict — a preset
    # bump cannot silently detach the day-one gate (VERDICT r4 #7)
    from faceposegenerator_tpu.pipelines.presets import PRESETS

    assert set(gates) == set(PRESETS)
    for g in gates.values():
        assert g["psnr_mean"] is None or g["psnr_mean"] > 0
        # floor-relative gating: the floor was measured on these weights
        # and every shipped preset clears its margin even on random ones
        assert g["seed_floor_psnr"] is not None
        assert g["psnr_threshold"] == pytest.approx(
            g["seed_floor_psnr"], abs=10.0)  # floor + a few dB margin
        assert g["pass"] is True, g
        cos = g.get("identity_cos_mean")
        assert cos is not None and -1.0 <= cos <= 1.0 + 1e-6
    assert not any("arcface" in s for s in verdict["skipped"])
    assert any("mtcnn" in s for s in verdict["skipped"])
    assert isinstance(verdict["pass"], bool)
