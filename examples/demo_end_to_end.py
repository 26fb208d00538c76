"""End-to-end demo on random weights (no downloads needed).

Walks the full reference workflow on tiny models: fine-tune one identity
with the ID-Booth triplet loss, export the LoRA checkpoint, load it into
the pipeline, generate a prompt-grid sweep, and run the evaluation metrics
on the outputs. With real SD2.1/ArcFace checkpoints, swap `from_random` for
`from_pretrained` and the tiny configs for the defaults.

    JAX_PLATFORMS=cpu python examples/demo_end_to_end.py /tmp/fpg_demo
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", os.environ.get("DEMO_PLATFORM", "cpu"))

import numpy as np  # noqa: E402


def main(workdir: str):
    from PIL import Image

    from faceposegenerator_tpu.core.precision import PARITY_POLICY
    from faceposegenerator_tpu.diffusion.sampler import SamplerModels
    from faceposegenerator_tpu.evaluation import dgm
    from faceposegenerator_tpu.models import clip_text, unet2d, vae, iresnet
    from faceposegenerator_tpu.pipelines import StableDiffusionPipeline
    from faceposegenerator_tpu.training import idbooth, idbooth_driver

    os.makedirs(workdir, exist_ok=True)
    rng = np.random.default_rng(0)

    bundle = idbooth.ModelBundle(
        text_cfg=clip_text.CLIPTextConfig(
            vocab_size=64, hidden_size=32, num_layers=1, num_heads=4, intermediate_size=64
        ),
        unet_cfg=unet2d.UNetConfig(
            block_out_channels=(32, 32, 32, 32), cross_attention_dim=32, head_dim=8
        ),
        vae_cfg=vae.VAEConfig(block_out_channels=(32, 32, 32, 32)),
        arcface_cfg=iresnet.config_for("r18", num_features=32),
    )
    ap, ast = iresnet.init(jax.random.key(3), bundle.arcface_cfg)
    frozen = {
        "text_encoder": clip_text.init(jax.random.key(0), bundle.text_cfg),
        "unet": unet2d.init(jax.random.key(1), bundle.unet_cfg),
        "vae": vae.init(jax.random.key(2), bundle.vae_cfg),
        "arcface": {"params": ap, "state": ast},
    }

    # 1. a tiny "identity" dataset
    inst = os.path.join(workdir, "identity_1")
    os.makedirs(inst, exist_ok=True)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(
            os.path.join(inst, f"{i}.jpg")
        )

    # 2. ID-Booth fine-tune (triplet loss) + LoRA export
    cfg = idbooth.IDBoothConfig(
        which_loss="triplet_prior", with_prior_preservation=False, resolution=64,
        num_train_epochs=1, checkpointing_epochs=1, validation_epochs=99,
    )
    run_dir = os.path.join(workdir, "ID-Booth", "identity_1")
    ids = np.arange(77, dtype=np.int32)
    idbooth_driver.run_identity(
        cfg, bundle, frozen, inst, run_dir, policy=PARITY_POLICY, instance_ids=ids
    )
    print("LoRA checkpoint:", os.listdir(run_dir))

    # 3. load the LoRA into the pipeline and generate
    pipe = StableDiffusionPipeline.from_random(
        models=SamplerModels(
            text_cfg=bundle.text_cfg, unet_cfg=bundle.unet_cfg, vae_cfg=bundle.vae_cfg
        ),
        policy=PARITY_POLICY,
    )
    pipe.params = {k: frozen[k] for k in ("text_encoder", "unet", "vae")}
    pipe.load_lora_weights(run_dir)
    imgs = pipe(
        input_ids=np.tile(ids, (4, 1)), num_inference_steps=4,
        width=64, height=64, seed=1,
    )
    gen_dir = os.path.join(workdir, "generated", "1")
    os.makedirs(gen_dir, exist_ok=True)
    for i, img in enumerate(imgs):
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(gen_dir, f"1_{i}.png")
        )
    print("generated:", imgs.shape)

    # 4. evaluate generated vs "real"
    real_dir = os.path.join(workdir, "real", "1")
    os.makedirs(real_dir, exist_ok=True)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(
            os.path.join(real_dir, f"1_{i}.png")
        )
    scores = dgm.main(
        [os.path.dirname(real_dir), os.path.dirname(gen_dir),
         "--model", "pixel", "--metrics", "fd", "prdc", "--nsample", "50",
         "--output_dir", os.path.join(workdir, "eval")]
    )
    print("metrics:", scores)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/fpg_demo")
