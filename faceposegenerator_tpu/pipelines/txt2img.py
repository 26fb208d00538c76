"""StableDiffusionPipeline-compatible txt2img API over the jitted sampler.

Mirrors the reference's pipeline surface (`inference_ID-Booth.py:103-144`):

    pipe = StableDiffusionPipeline.from_pretrained(model_dir)
    pipe.set_scheduler("ddpm")                  # DDPMScheduler swap (:104)
    pipe.load_lora_weights(ckpt_dir)            # LoRA merge, no recompile (:107)
    images = pipe(prompt, negative_prompt=...,  # (:138)
                  num_inference_steps=30, guidance_scale=5.0,
                  width=512, height=512, seed=identity_index)

Because LoRA stays factored with fixed structure, swapping checkpoints or
identities re-uses the same compiled XLA program — the reference reloads the
whole fp16 pipeline per (identity, model) pair (`inference_ID-Booth.py:103`),
which this design eliminates entirely.
"""

from __future__ import annotations

import os
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core.precision import Policy, DEFAULT_POLICY
from ..core.rng import sampler_key
from ..diffusion import make_ddpm, make_dpm_solver, SchedulerConfig
from ..diffusion.sampler import SamplerModels, sample
from ..diffusion.lora_io import load_lora_safetensors
from ..models import clip_text, unet2d, vae


class StableDiffusionPipeline:
    def __init__(
        self,
        params: dict,
        models: SamplerModels = SamplerModels(),
        tokenizer=None,
        policy: Policy = DEFAULT_POLICY,
        scheduler_config: SchedulerConfig = SchedulerConfig(),
        mesh=None,
    ):
        self.params = params
        self.models = models
        self.tokenizer = tokenizer
        self.policy = policy
        self.scheduler_config = scheduler_config
        self.scheduler_kind = "ddpm"
        self.lora = None
        self.lora_scale = 1.0
        self.mesh = None
        if mesh is not None:
            self.to_mesh(mesh)

    def to_mesh(self, mesh):
        """Serve the pipeline DATA-PARALLEL over a `jax.sharding.Mesh`: the
        prompt batch shards over the mesh "data" axis, params/LoRAs are
        replicated ONCE here (not per call — the reference parallelizes
        generation only by running whole processes per GPU,
        SURVEY.md §2.5). All pipeline invariants hold: one compiled program,
        LoRA swap without recompile, identity-index seeding. The per-call
        batch must divide the data-axis size."""
        from ..core.mesh import replicate

        self.mesh = mesh
        self.params = replicate(mesh, self.params)
        if self.lora is not None:
            self.lora = replicate(mesh, self.lora)

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_pretrained(
        cls,
        model_dir: str,
        dtype=jnp.bfloat16,
        models: Optional[SamplerModels] = None,
        policy: Optional[Policy] = None,
    ):
        from ..bridge.torch_weights import configs_from_model_dir, load_sd21_params
        from ..data.tokenizer import CLIPTokenizer

        if models is None:
            # derive model configs from the checkpoint's own config.json
            # files — a non-SD2.1-sized diffusers dir must not be forced
            # through the SD2.1 default shapes
            text_cfg, unet_cfg, vae_cfg = configs_from_model_dir(model_dir)
            models = SamplerModels(text_cfg=text_cfg, unet_cfg=unet_cfg, vae_cfg=vae_cfg)
        params = load_sd21_params(model_dir, dtype=dtype)
        tok_dir = os.path.join(model_dir, "tokenizer")
        tokenizer = CLIPTokenizer.from_pretrained(tok_dir) if os.path.isdir(tok_dir) else None
        if policy is None:
            policy = Policy(param_dtype=dtype, compute_dtype=dtype)
        return cls(params, models, tokenizer, policy)

    @classmethod
    def from_random(cls, key=None, models: SamplerModels = SamplerModels(), dtype=jnp.float32, **kw):
        """Random-weight pipeline (tests/benchmarks)."""
        key = key if key is not None else jax.random.key(0)
        k1, k2, k3 = jax.random.split(key, 3)
        params = {
            "text_encoder": clip_text.init(k1, models.text_cfg, dtype=dtype),
            "unet": unet2d.init(k2, models.unet_cfg, dtype=dtype),
            "vae": vae.init(k3, models.vae_cfg, dtype=dtype),
        }
        return cls(params, models, **kw)

    # -- reference API surface ---------------------------------------------

    def set_scheduler(self, kind: str):
        """Swap DDPM ↔ DPM-Solver++ (`pipe.scheduler = DDPMScheduler...`)."""
        if kind not in ("ddpm", "dpm"):
            raise ValueError(f"unknown scheduler {kind!r} (only 'ddpm'/'dpm')")
        self.scheduler_kind = kind

    def load_lora_weights(self, path_or_dir: str, scale: float = 1.0):
        """Load a diffusers-format LoRA checkpoint. No recompile: the LoRA
        pytree always has the same (fixed-rank) structure."""
        self.set_lora(
            load_lora_safetensors(
                path_or_dir, self.params["unet"], self.params["text_encoder"],
                dtype=self.policy.param_dtype,
            ),
            scale,
        )

    def set_lora(self, lora: Optional[dict], scale: float = 1.0):
        if lora is not None and self.mesh is not None:
            from ..core.mesh import replicate

            lora = replicate(self.mesh, lora)  # placed once, reused per call
        self.lora = lora
        self.lora_scale = scale

    def unload_lora_weights(self):
        self.lora = None

    def quantize(self, mode: str = "w8a8", act_scale=None):
        """OPT-IN int8 UNet weights (`ops/quant.py`): the UNet's matmuls and
        convs run int8×int8→int32 on the MXU (2× the bf16 rate on v5e) with
        dynamic activation scales; CLIP/VAE and the exact program stay
        untouched. LoRA checkpoints loaded before or after still apply —
        deltas stay factored bf16 over the int8 base. Irreversible on this
        pipeline instance (reload for the exact path).

        `mode="w8a8+vae"` additionally quantizes the VAE DECODER body
        (`ops/quant.quantize_vae`) — a small share of the exact sampler but
        a growing one under the turbo modes, which shrink only UNet work.

        `act_scale`: optional constant STATIC activation scale stamped on
        every site (perf probing); for real static scales calibrate with
        `calibrate_quant()` instead."""
        if mode not in ("w8a8", "w8a8+vae"):
            raise ValueError(
                f"unknown quantize mode {mode!r} (only 'w8a8'/'w8a8+vae')"
            )
        from ..ops.quant import quantize_unet, quantize_vae

        self.params = dict(
            self.params, unet=quantize_unet(self.params["unet"], act_scale=act_scale)
        )
        if mode.endswith("+vae"):
            self.params = dict(
                self.params,
                vae=quantize_vae(self.params["vae"], act_scale=act_scale),
            )
        if self.mesh is not None:
            from ..core.mesh import replicate

            self.params = replicate(self.mesh, self.params)

    def calibrate_quant(
        self,
        prompt: Union[str, List[str], None] = None,
        *,
        negative_prompt: Union[str, List[str], None] = None,
        input_ids: Optional[jax.Array] = None,
        negative_input_ids: Optional[jax.Array] = None,
        steps: int = 4,
        seed: int = 0,
        height: int = 512,
        width: int = 512,
        guidance_scale: float = 5.0,
        margin: float = 1.1,
    ):
        """Calibrate STATIC per-tensor activation scales for the quantized
        UNet (post-training static quantization — the TensorRT/ONNX-RT
        recipe, layered on `quantize()`'s dynamic default).

        Runs a short `steps`-step CFG denoise EAGERLY (op by op, so each
        quant site records its activation absmax on the host —
        `ops/quant.observe_act_scales`), then freezes `amax·margin/127`
        into each site's leaf. Every program compiled afterwards quantizes
        that site's activations ELEMENTWISE against the frozen constant:
        no per-token/per-sample amax reduce, no extra HBM pass over x (the
        measured cost that makes dynamic int8 wash at small contraction
        widths, perf/r3aj). Out-of-range activations at serve time clip to
        ±127 codes (saturation); `margin` buys headroom. Numerically
        coarser than dynamic scales — validate on real weights with
        `cli accel-report` before shipping.

        Call AFTER `quantize()` and BEFORE `to_mesh()` (the eager pass is
        single-device); LoRA deltas ride bf16 and need no calibration.
        """
        from ..ops import quant as quant_ops

        if self.mesh is not None:
            raise ValueError("calibrate_quant before to_mesh (eager pass is single-device)")
        if input_ids is None:
            input_ids = self.tokenize(prompt)
        if negative_input_ids is None:
            if negative_prompt is None and self.tokenizer is None:
                negative_input_ids = jnp.zeros_like(input_ids)
            else:
                if negative_prompt is None:
                    negative_prompt = [""] * input_ids.shape[0]
                negative_input_ids = self.tokenize(negative_prompt)
        if negative_input_ids.shape[0] == 1 and input_ids.shape[0] > 1:
            negative_input_ids = jnp.tile(negative_input_ids, (input_ids.shape[0], 1))

        B = input_ids.shape[0]
        h, w = height // 8, width // 8
        sched = make_ddpm(self.scheduler_config, steps)
        ids = jnp.concatenate([negative_input_ids, input_ids], axis=0)
        ctx = clip_text.apply(
            self.params["text_encoder"], ids, self.models.text_cfg, policy=self.policy
        )
        key = sampler_key(seed)
        key, sub = jax.random.split(key)
        x = jax.random.normal(sub, (B, h, w, 4), jnp.float32)
        with quant_ops.observe_act_scales() as calib:
            for i in range(steps):
                t = sched.timesteps[i]
                lat = jnp.concatenate([x, x], axis=0)
                eps = unet2d.apply(
                    self.params["unet"], lat, jnp.broadcast_to(t, (2 * B,)), ctx,
                    self.models.unet_cfg, policy=self.policy,
                    attn_impl=self.models.attn_impl,
                )
                eps_u, eps_c = jnp.split(eps, 2, axis=0)
                guided = eps_u + guidance_scale * (eps_c - eps_u)
                key, sub = jax.random.split(key)
                noise = jax.random.normal(sub, x.shape, jnp.float32)
                x, _ = sched.step(guided, jnp.asarray(i), x, noise)
            # one eager decode so a quantized VAE decoder ("w8a8+vae")
            # observes its sites too (no-op sites otherwise)
            vae.decode(self.params["vae"], x, self.models.vae_cfg, policy=self.policy)
        if not calib:
            raise ValueError("no quantized sites observed — call quantize() first")
        self.params = dict(
            self.params,
            unet=quant_ops.freeze_act_scales(self.params["unet"], calib, margin=margin),
            vae=quant_ops.freeze_act_scales(self.params["vae"], calib, margin=margin),
        )
        return calib

    def save_quant_scales(self, path: str) -> int:
        """Serialize calibrated static act scales (unet + vae sites) to
        JSON — calibrate once, ship the scales (`ops/quant.save_act_scales`).
        Returns the number of sites saved."""
        from ..ops.quant import save_act_scales

        return save_act_scales(
            {"unet": self.params["unet"], "vae": self.params["vae"]}, path
        )

    def load_quant_scales(self, path: str):
        """Attach saved static act scales to this (quantized) pipeline —
        the serving-process side of `save_quant_scales`. Call after
        `quantize()` and before `to_mesh()`."""
        from ..ops.quant import load_act_scales

        if self.mesh is not None:
            raise ValueError("load_quant_scales before to_mesh")
        loaded = load_act_scales(
            {"unet": self.params["unet"], "vae": self.params["vae"]}, path
        )
        self.params = dict(self.params, unet=loaded["unet"], vae=loaded["vae"])

    def tokenize(self, prompts: Union[str, List[str]]) -> jnp.ndarray:
        if self.tokenizer is None:
            raise ValueError("no tokenizer loaded; pass input_ids directly")
        return jnp.asarray(self.tokenizer(prompts))

    def __call__(
        self,
        prompt: Union[str, List[str], None] = None,
        negative_prompt: Union[str, List[str], None] = None,
        num_inference_steps: int = 30,
        guidance_scale: float = 5.0,
        width: int = 512,
        height: int = 512,
        seed: Optional[int] = None,
        key: Optional[jax.Array] = None,
        num_images_per_prompt: int = 1,
        input_ids: Optional[jax.Array] = None,
        negative_input_ids: Optional[jax.Array] = None,
        output_type: str = "np",
        lora: Optional[dict] = None,
        lora_scale=None,
        noise_override: Optional[jax.Array] = None,
        deepcache_interval: int = 1,
        deepcache_depth: int = 1,
        tome_ratio: float = 0.0,
        tome_min_tokens: int = 4096,
        tome_ops: str = "attn",
        parallel_window: int = 0,
        parallel_tolerance: float = 0.1,
        cfg_interval: Optional[tuple] = None,
    ):
        """Generate images. Returns (B, H, W, 3) in [0, 1] (np or jax).

        `parallel_window=W > 0` (DDPM only): parallel-in-time Picard sampling
        (`diffusion/parallel_sampler.py`) — the batch-1 latency lever. On a
        mesh pipeline the WINDOW shards over "data" instead of the prompt
        batch (more chips on one image).

        `lora`/`lora_scale`: per-call adapter override. Leaves may carry a
        leading request axis (B, r, in)/(B, out, r) with a (B,) scale —
        heterogeneous batches where slot b rides its own adapter (the packed
        sweep and the multi-tenant server use this). `noise_override`:
        (S+1, B, h/8, w/8, 4) pre-drawn noise (initial latent + per-step DDPM
        noise) replacing the PRNG stream — see `sampler.per_prompt_noise`.
        """
        if input_ids is None:
            input_ids = self.tokenize(prompt)
        if negative_input_ids is None:
            if negative_prompt is None and self.tokenizer is None:
                negative_input_ids = jnp.zeros_like(input_ids)
            else:
                if negative_prompt is None:
                    negative_prompt = [""] * input_ids.shape[0]
                negative_input_ids = self.tokenize(negative_prompt)
        if negative_input_ids.shape[0] == 1 and input_ids.shape[0] > 1:
            negative_input_ids = jnp.tile(negative_input_ids, (input_ids.shape[0], 1))
        if num_images_per_prompt > 1:
            input_ids = jnp.repeat(input_ids, num_images_per_prompt, axis=0)
            negative_input_ids = jnp.repeat(negative_input_ids, num_images_per_prompt, axis=0)

        if key is None:
            key = sampler_key(seed if seed is not None else 0)

        use_parallel = parallel_window > 0
        if use_parallel and self.scheduler_kind != "ddpm":
            raise ValueError("parallel_window requires the ddpm scheduler")
        if use_parallel and cfg_interval is not None:
            raise ValueError("cfg_interval is not composable with parallel_window yet")

        if self.mesh is not None and not use_parallel:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..core.mesh import DATA_AXIS, replicate, shard_batch

            n_data = self.mesh.shape[DATA_AXIS]
            if input_ids.shape[0] % n_data != 0:
                raise ValueError(
                    f"batch {input_ids.shape[0]} must divide the mesh data "
                    f"axis ({n_data}) for data-parallel sampling"
                )
            input_ids, negative_input_ids = shard_batch(
                self.mesh, (input_ids, negative_input_ids)
            )
            if lora is not None:
                # per-call adapters: stacked (B, ...) leaves shard over
                # "data" aligned with their prompt rows; shared adapters
                # replicate (same placement the serving engine uses)
                leaves = jax.tree.leaves(lora)
                if leaves and leaves[0].ndim == 3:
                    lora = jax.device_put(
                        lora, NamedSharding(self.mesh, P(DATA_AXIS))
                    )
                    if isinstance(lora_scale, jax.Array) and lora_scale.ndim == 1:
                        lora_scale = jax.device_put(
                            lora_scale, NamedSharding(self.mesh, P(DATA_AXIS))
                        )
                else:
                    lora = replicate(self.mesh, lora)
            if noise_override is not None:
                noise_override = jax.device_put(
                    noise_override, NamedSharding(self.mesh, P(None, DATA_AXIS))
                )

        if self.scheduler_kind == "ddpm":
            sched = make_ddpm(self.scheduler_config, num_inference_steps)
        else:
            sched = make_dpm_solver(self.scheduler_config, num_inference_steps)

        if lora is None:
            scale = self.lora_scale
            if self.lora is not None:
                lora = {"unet": self.lora.get("unet"), "text_encoder": self.lora.get("text_encoder")}
        else:
            lora = {"unet": lora.get("unet"), "text_encoder": lora.get("text_encoder")}
            scale = lora_scale if lora_scale is not None else 1.0

        if use_parallel:
            from ..diffusion.parallel_sampler import sample_parallel

            if self.mesh is not None and lora is not None:
                from ..core.mesh import replicate

                lora = replicate(self.mesh, lora)
            images = sample_parallel(
                self.params, sched, input_ids, negative_input_ids, key,
                models=self.models, guidance_scale=float(guidance_scale),
                height=height, width=width, policy=self.policy,
                lora=lora, lora_scale=scale, noise_override=noise_override,
                window=parallel_window, tolerance=parallel_tolerance,
                mesh=self.mesh,
                tome_ratio=tome_ratio, tome_min_tokens=tome_min_tokens,
                tome_ops=tome_ops,
            )
        else:
            images = sample(
                self.params, sched, input_ids, negative_input_ids, key,
                models=self.models, guidance_scale=float(guidance_scale),
                height=height, width=width, policy=self.policy,
                scheduler=self.scheduler_kind, lora=lora, lora_scale=scale,
                noise_override=noise_override,
                deepcache_interval=deepcache_interval,
                deepcache_depth=deepcache_depth,
                tome_ratio=tome_ratio, tome_min_tokens=tome_min_tokens,
                tome_ops=tome_ops,
                cfg_interval=None if cfg_interval is None else tuple(cfg_interval),
            )
        if output_type in ("u8", "jax_u8"):
            # device-side quantize: the sweep/serving consumers want uint8;
            # transferring fp32 is 4× the bytes for discarded precision.
            # "jax_u8" skips the host transfer entirely so callers can
            # pipeline host work for batch i against device work for i+1
            from ..ops.image import quantize_u8

            u8 = quantize_u8(images)
            return np.asarray(u8) if output_type == "u8" else u8
        if output_type == "np":
            return np.asarray(images)
        return images
