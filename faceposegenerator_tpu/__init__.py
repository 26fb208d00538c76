"""faceposegenerator_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
identity-consistent face generation with diffusion models.

Ground-up rebuild of the capabilities of the ID-Booth reference stack
(`rangasaishreyas/FacePoseGenerator`, the official ID-Booth implementation):

- A single jit-compiled Stable Diffusion 2.1 txt2img sampler (CLIP text
  encoder, UNet2DCondition with Pallas flash attention, KL-VAE) with
  classifier-free guidance and DDPM / DPM-Solver++ schedulers
  (reference: `inference_ID-Booth.py`).
- LoRA checkpoints that load and merge into UNet/text-encoder parameters
  without recompilation (reference: `train_ID-Booth.py:671-766`).
- ID-Booth fine-tuning: DreamBooth prior preservation plus triplet identity
  loss against a frozen ArcFace IResNet-100 (reference:
  `train_ID-Booth.py:966-1140`).
- Batched face detect/align/crop and ArcFace embedding extraction
  (reference: `extract_ArcFace_embeds.py`, `utils/detect_align_crop_data.py`).
- Face-recognition training/verification and the synthetic-data evaluation
  suite — FD/KD/PRDC/Vendi/AuthPct, CR-FIQA, head pose, EER/FDR
  (reference: `FR_training/`, `Evaluation/`).

The design is layered (see SURVEY.md §7): `core` (mesh/precision/rng/
checkpoint/config) → `ops` (Pallas kernels + jnp fallbacks) → `models`
(CLIP text, UNet2D, VAE, IResNet, MTCNN) → `diffusion` (schedulers, sampler,
LoRA) → `pipelines` → `training` → `evaluation`.
"""

__version__ = "0.1.0"
