"""Single-jit txt2img sampler: CLIP → N×(UNet ×2 CFG → scheduler step) → VAE.

This is the TPU-native rebuild of the reference's hot loop — diffusers'
`StableDiffusionPipeline.__call__` with DDPM scheduler, 30 steps, CFG 5.0 at
512² (`inference_ID-Booth.py:48-50,138`) — as ONE compiled XLA program:
text encoding, the denoising `lax.fori_loop` (UNet batched over [uncond;
cond] for classifier-free guidance), and the VAE decode all fuse into a
single device program with zero host round-trips.

Noise handling: the initial latent and each step's DDPM noise come from a
single PRNG key (`fold_in` per step), or can be supplied pre-drawn
(`noise_override`) for bit-parity testing against the reference
(SURVEY.md §7 hard part (a)).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.compile import jit as _options_jit
from ..core.precision import Policy, DEFAULT_POLICY
from ..models import clip_text, unet2d, vae
from .schedulers import DDPMSchedule, DPMSolverSchedule


@dataclasses.dataclass(frozen=True)
class SamplerModels:
    """Static bundle: configs are hashable; params are passed separately."""

    text_cfg: clip_text.CLIPTextConfig = clip_text.SD21_TEXT_CONFIG
    unet_cfg: unet2d.UNetConfig = unet2d.SD21_UNET_CONFIG
    vae_cfg: vae.VAEConfig = vae.SD_VAE_CONFIG
    attn_impl: str = "auto"


@functools.partial(
    # core.compile.jit: forwards env-selected XLA compiler options through
    # the per-compile options proto (the only flag path that reaches the
    # remote TPU compiler). The experimental fusion cost model is a
    # measured sampler-specific win (+2%: 2.084 vs 2.043 img/s,
    # perf/r3p_options.jsonl) and is on by default on TPU only — it
    # REGRESSES the iresnet embed program 33%, so it must not leak into
    # other programs. Env XLA_COMPILER_OPTIONS overrides (set the key to
    # "false" to disable).
    _options_jit,
    tpu_default_options={"xla_tpu_enable_experimental_fusion_cost_model": "true"},
    static_argnames=(
        "models", "guidance_scale", "height", "width", "policy", "scheduler",
        "decode_chunk", "unroll", "deepcache_interval", "deepcache_depth",
        "tome_ratio", "tome_min_tokens", "tome_ops", "cfg_interval",
        "return_trajectory",
    ),
)
def sample(
    params: dict,
    schedule: DDPMSchedule | DPMSolverSchedule,
    input_ids: jax.Array,
    negative_input_ids: jax.Array,
    key: jax.Array,
    *,
    models: SamplerModels = SamplerModels(),
    guidance_scale: float = 5.0,
    height: int = 512,
    width: int = 512,
    policy: Policy = DEFAULT_POLICY,
    scheduler: str = "ddpm",
    lora: Optional[dict] = None,
    lora_scale: float | jax.Array = 1.0,
    noise_override: Optional[jax.Array] = None,
    decode_chunk: Optional[int] = None,
    unroll: int = 1,
    deepcache_interval: int = 1,
    deepcache_depth: int = 1,
    tome_ratio: float = 0.0,
    tome_min_tokens: int = 4096,
    tome_ops: str = "attn",
    cfg_interval: Optional[tuple] = None,
    return_trajectory: bool = False,
) -> jax.Array:
    """Generate images.

    params: {"text_encoder", "unet", "vae"} param pytrees.
    input_ids / negative_input_ids: (B, 77) tokenized prompts (the reference
    passes `prompt` + `negative_prompt` to the pipeline,
    `inference_ID-Booth.py:138`).
    Returns (B, H, W, 3) images in [0, 1] fp32.

    `noise_override`: optional (S+1, B, h, w, 4) — initial latent noise at
    index 0 then per-step DDPM noise; replaces the PRNG stream for parity
    testing.

    `deepcache_interval=k > 1` (OPT-IN approximation; default 1 = exact):
    run the full UNet only on steps i ≡ 0 (mod k), caching the deep
    feature at up_blocks[L-depth]; other steps recompute only the shallow
    `deepcache_depth` down blocks + last `deepcache_depth` up blocks and
    splice the cache (`unet2d.apply_cached` — DeepCache/Faster-Diffusion
    style, see PAPERS.md). Supported for both schedulers (ddpm + dpm).

    `tome_ratio > 0` (OPT-IN approximation, composable with DeepCache):
    ToMe token merging before every ≥4096-token UNet self-attention
    (`ops/tome.py`, arXiv:2303.17604); 0.0 = exact.

    `return_trajectory=True` (exact paths only — no deepcache/tome/
    cfg_interval/unroll): additionally return the latent x_i AFTER every
    scheduler step, shape (S, B, h, w, 4) — the probe surface for
    BASELINE.md's "fp32 bit-comparable PER DENOISING STEP" criterion
    (tests/test_full_chain_parity.py, `cli parity --full_chain`). The
    trajectory rides the same fori_loop as production (a dynamic-slice
    write per step), so the per-step math is the deployed program's, not
    a rewritten eager loop's.

    `cfg_interval=(i0, i1)` (OPT-IN approximation; default None = exact):
    guidance interval (Kynkäänniemi et al., arXiv:2404.07724) — CFG is
    applied only at step indices i0 <= i < i1 (index 0 = highest noise);
    outside the interval the UNet runs COND-ONLY at half batch, saving
    ~half the UNet cost on those steps. The step schedule is static, so
    the interval maps to static loop segments (three fori_loops, no
    lax.cond, no dynamic shapes). Composable with deepcache_interval
    (each segment carries its own cache — CFG and cond-only caches have
    different batch sizes — and seeds it with a full pass at the segment's
    first step); not composable with unroll.
    """
    B = input_ids.shape[0]
    h, w = height // 8, width // 8
    S = schedule.num_inference_steps

    # --- per-request adapters (heterogeneous-LoRA batching) ----------------
    # lora leaves may carry a leading request axis (B, r, in)/(B, out, r)
    # (multi-tenant serving: slot b rides adapter b; `ops.lora.lora_delta`).
    # The CFG batch is [uncond; cond], so adapters (and a per-request (B,)
    # lora_scale) tile ×2 to line up slot b with rows b and B+b.
    lora_leaves = [] if lora is None else jax.tree.leaves(lora)
    # pre-CFG-tiling adapter views for the cond-only (half-batch) guidance-
    # interval path: its rows are just the cond prompts, so per-request
    # adapters apply UNtiled
    unet_lora_cond = None if lora is None else lora.get("unet")
    lora_scale_cond = lora_scale
    if lora_leaves and lora_leaves[0].ndim == 3:
        lora = jax.tree.map(lambda l: jnp.concatenate([l, l], axis=0), lora)
        if isinstance(lora_scale, jax.Array) and lora_scale.ndim == 1:
            lora_scale = jnp.concatenate([lora_scale, lora_scale], axis=0)

    # --- text conditioning: [uncond; cond] in one batch (CFG pair) ---------
    ids = jnp.concatenate([negative_input_ids, input_ids], axis=0)
    ctx = clip_text.apply(
        params["text_encoder"], ids, models.text_cfg, policy=policy,
        lora=None if lora is None else lora.get("text_encoder"),
        lora_scale=lora_scale,
    )

    # --- initial latents ---------------------------------------------------
    if noise_override is not None:
        x = noise_override[0]
    else:
        key, sub = jax.random.split(key)
        x = jax.random.normal(sub, (B, h, w, 4), jnp.float32)
    # DDPM init: x_T ~ N(0, I) scaled by the scheduler's init sigma (=1)

    unet_lora = None if lora is None else lora.get("unet")

    def unet_eps(x, t):
        lat = jnp.concatenate([x, x], axis=0)
        eps = unet2d.apply(
            params["unet"], lat, jnp.broadcast_to(t, (2 * B,)), ctx,
            models.unet_cfg, policy=policy,
            lora=unet_lora, lora_scale=lora_scale,
            attn_impl=models.attn_impl, tome_ratio=tome_ratio,
            tome_min_tokens=tome_min_tokens, tome_ops=tome_ops,
        )
        eps_u, eps_c = jnp.split(eps, 2, axis=0)
        return eps_u + guidance_scale * (eps_c - eps_u)

    def unet_eps_cond_only(x, t):
        # guidance-interval out-of-interval step: cond prompts only, batch B
        return unet2d.apply(
            params["unet"], x, jnp.broadcast_to(t, (B,)), ctx[B:],
            models.unet_cfg, policy=policy,
            lora=unet_lora_cond, lora_scale=lora_scale_cond,
            attn_impl=models.attn_impl, tome_ratio=tome_ratio,
            tome_min_tokens=tome_min_tokens, tome_ops=tome_ops,
        )

    if cfg_interval is not None:
        i0, i1 = int(cfg_interval[0]), int(cfg_interval[1])
        if not (0 <= i0 <= i1 <= S):
            raise ValueError(f"cfg_interval {cfg_interval} not within [0, {S}]")
        if unroll > 1:
            raise ValueError("cfg_interval is not composable with unroll yet")

    traj = None
    if return_trajectory:
        if (deepcache_interval > 1 or tome_ratio > 0.0
                or cfg_interval is not None or unroll > 1):
            raise ValueError(
                "return_trajectory is a parity probe for the EXACT chain; "
                "it does not compose with deepcache/tome/cfg_interval/unroll"
            )
        traj = jnp.zeros((S, B, h, w, 4), jnp.float32)

    if deepcache_interval > 1:

        def unet_eps_dc(x, t, cache):
            lat = jnp.concatenate([x, x], axis=0)
            eps, cache = unet2d.apply_cached(
                params["unet"], lat, jnp.broadcast_to(t, (2 * B,)), ctx,
                models.unet_cfg, policy=policy,
                lora=unet_lora, lora_scale=lora_scale,
                attn_impl=models.attn_impl, tome_ratio=tome_ratio,
                tome_min_tokens=tome_min_tokens, tome_ops=tome_ops,
                depth=deepcache_depth, cached=cache,
            )
            eps_u, eps_c = jnp.split(eps, 2, axis=0)
            return eps_u + guidance_scale * (eps_c - eps_u), cache

        def unet_eps_dc_cond(x, t, cache):
            # guidance-interval out-of-interval step: cond-only half batch;
            # its cache pytree is B-sized, so each loop segment carries its
            # own cache (segments are static — see run_seg_*)
            return unet2d.apply_cached(
                params["unet"], x, jnp.broadcast_to(t, (B,)), ctx[B:],
                models.unet_cfg, policy=policy,
                lora=unet_lora_cond, lora_scale=lora_scale_cond,
                attn_impl=models.attn_impl, tome_ratio=tome_ratio,
                tome_min_tokens=tome_min_tokens, tome_ops=tome_ops,
                depth=deepcache_depth, cached=cache,
            )

    if scheduler == "ddpm" and deepcache_interval > 1:

        def step_noise(i):
            if noise_override is not None:
                return noise_override[i + 1]
            return jax.random.normal(
                jax.random.fold_in(key, i), x.shape, jnp.float32
            )

        def run_seg_ddpm(x, lo, hi, eps_dc, unroll=1):
            """One static [lo, hi) segment. The first step runs FULL (its
            cache fixes the fori carry structure — and CFG/cond-only caches
            have different batch sizes, so a cache never crosses segments)."""
            if lo >= hi:
                return x
            eps0, cache = eps_dc(x, schedule.timesteps[lo], None)
            x, _ = schedule.step(eps0, lo, x, step_noise(lo))

            def body_dc(i, carry):
                x, cache = carry
                t = schedule.timesteps[i]
                eps, cache = jax.lax.cond(
                    i % deepcache_interval == 0,
                    lambda x_, c_: eps_dc(x_, t, None),
                    lambda x_, c_: eps_dc(x_, t, c_),
                    x, cache,
                )
                x2, _ = schedule.step(eps, i, x, step_noise(i))
                return (x2, cache)

            if unroll > 1:
                (x, _), _ = jax.lax.scan(
                    lambda c, i: (body_dc(i, c), None), (x, cache),
                    jnp.arange(lo + 1, hi), unroll=unroll,
                )
            else:
                x, _ = jax.lax.fori_loop(lo + 1, hi, body_dc, (x, cache))
            return x

        if cfg_interval is None:
            x = run_seg_ddpm(x, 0, S, unet_eps_dc, unroll=unroll)
        else:
            x = run_seg_ddpm(x, 0, i0, unet_eps_dc_cond)
            x = run_seg_ddpm(x, i0, i1, unet_eps_dc)
            x = run_seg_ddpm(x, i1, S, unet_eps_dc_cond)

    elif scheduler == "ddpm":

        def _ddpm_body(eps_fn):
            def body(i, x):
                t = schedule.timesteps[i]
                eps = eps_fn(x, t)
                if noise_override is not None:
                    noise = noise_override[i + 1]
                else:
                    noise = jax.random.normal(
                        jax.random.fold_in(key, i), x.shape, jnp.float32
                    )
                x, _ = schedule.step(eps, i, x, noise)
                return x
            return body

        body = _ddpm_body(unet_eps)

        if return_trajectory:

            def body_traj(i, carry):
                x, traj = carry
                x2 = body(i, x)
                return x2, jax.lax.dynamic_update_index_in_dim(traj, x2, i, 0)

            x, traj = jax.lax.fori_loop(0, S, body_traj, (x, traj))
        elif cfg_interval is not None:
            # static segments: [0,i0) and [i1,S) run cond-only at half batch
            body_c = _ddpm_body(unet_eps_cond_only)
            x = jax.lax.fori_loop(0, i0, body_c, x)
            x = jax.lax.fori_loop(i0, i1, body, x)
            x = jax.lax.fori_loop(i1, S, body_c, x)
        elif unroll > 1:
            # scan with unroll>1 exposes `unroll` consecutive denoise steps
            # to the scheduler at once (cross-step overlap of the step's
            # elementwise math with the next UNet's first DMAs) at the cost
            # of an `unroll`× larger loop body to compile
            x, _ = jax.lax.scan(
                lambda c, i: (body(i, c), None), x, jnp.arange(S),
                unroll=unroll,
            )
        else:
            x = jax.lax.fori_loop(0, S, body, x)

    elif scheduler == "dpm":
        state = (x, jnp.zeros_like(x), jnp.zeros_like(x), jnp.int32(0))

        if deepcache_interval > 1:
            # segment runner (same pattern as the ddpm branch): the first
            # step of each static segment runs FULL to fix the cache carry.
            # DPM-Solver++ is deterministic (no per-step noise), so the
            # cached-eps approximation composes with the multistep history
            # (m1/m2) exactly as with diffusers' DeepCache on DPM schedulers.
            def run_seg_dpm(state, lo, hi, eps_dc):
                if lo >= hi:
                    return state
                eps0, cache = eps_dc(state[0], schedule.timesteps[lo], None)
                state, _ = schedule.step(eps0, lo, state)

                def body_dc(i, carry):
                    state, cache = carry
                    t = schedule.timesteps[i]
                    eps, cache = jax.lax.cond(
                        i % deepcache_interval == 0,
                        lambda x_, c_: eps_dc(x_, t, None),
                        lambda x_, c_: eps_dc(x_, t, c_),
                        state[0], cache,
                    )
                    state2, _ = schedule.step(eps, i, state)
                    return (state2, cache)

                state, _ = jax.lax.fori_loop(lo + 1, hi, body_dc, (state, cache))
                return state

            if cfg_interval is None:
                state = run_seg_dpm(state, 0, S, unet_eps_dc)
            else:
                state = run_seg_dpm(state, 0, i0, unet_eps_dc_cond)
                state = run_seg_dpm(state, i0, i1, unet_eps_dc)
                state = run_seg_dpm(state, i1, S, unet_eps_dc_cond)
            x = state[0]
        else:

            def _dpm_body(eps_fn):
                def body(i, state):
                    t = schedule.timesteps[i]
                    eps = eps_fn(state[0], t)
                    state, _ = schedule.step(eps, i, state)
                    return state
                return body

            body = _dpm_body(unet_eps)
            if return_trajectory:

                def body_traj(i, carry):
                    state, traj = carry
                    state2 = body(i, state)
                    return state2, jax.lax.dynamic_update_index_in_dim(
                        traj, state2[0], i, 0
                    )

                state, traj = jax.lax.fori_loop(0, S, body_traj, (state, traj))
                x = state[0]
            elif cfg_interval is not None:
                body_c = _dpm_body(unet_eps_cond_only)
                state = jax.lax.fori_loop(0, i0, body_c, state)
                state = jax.lax.fori_loop(i0, i1, body, state)
                state = jax.lax.fori_loop(i1, S, body_c, state)
                x = state[0]
            else:
                x = jax.lax.fori_loop(0, S, body, state)[0]

    else:
        raise ValueError(scheduler)

    # --- decode ------------------------------------------------------------
    # the decoder's 128-ch full-resolution activations dominate peak memory
    # at large batch; `decode_chunk` serializes the (once-per-run) decode so
    # the 30-step UNet loop can use bigger batches
    if decode_chunk is not None and B > decode_chunk and B % decode_chunk == 0:
        chunks = x.reshape(B // decode_chunk, decode_chunk, h, w, 4)
        images = jax.lax.map(
            lambda z: vae.decode(params["vae"], z, models.vae_cfg, policy=policy),
            chunks,
        ).reshape(B, height, width, 3)
    else:
        images = vae.decode(params["vae"], x, models.vae_cfg, policy=policy)
    images = jnp.clip(images * 0.5 + 0.5, 0.0, 1.0)
    if return_trajectory:
        return images, traj
    return images


@functools.partial(_options_jit, static_argnames=("S", "h", "w"))
def per_prompt_noise(key: jax.Array, prompt_idx: jax.Array, S: int, h: int, w: int) -> jax.Array:
    """(S+1, B, h, w, 4) `noise_override` stream keyed by PROMPT index.

    The reference seeds one torch.Generator with the identity index and
    draws from it sequentially across the 21 prompts
    (`inference_ID-Booth.py:111,138`), so (a) the three model variants see
    identical latents per prompt and (b) different prompts see different
    noise. Deriving every slot's stream as fold_in(identity_key, prompt_idx)
    reproduces both properties regardless of WHICH batch a (variant, prompt)
    pair lands in — the invariant that lets the packed sweep
    (`pipelines.sweep.run_sweep(pack_variants=True)`) mix variants freely
    within fixed-shape batches."""
    def one(p):
        return jax.random.normal(
            jax.random.fold_in(key, p), (S + 1, h, w, 4), jnp.float32
        )

    return jnp.moveaxis(jax.vmap(one)(prompt_idx), 0, 1)


def sample_data_parallel(mesh, params, schedule, input_ids, negative_input_ids, key, **kw):
    """Sharded sampling: batch over the mesh "data" axis, params replicated.

    The reference parallelizes generation only by running whole processes
    per GPU; here one `sample` program SPMD-shards the prompt batch across
    chips (collectives ride ICI; per-chip batch = B / n_data). `input_ids`
    batch must divide the data-axis size.
    """
    from ..core.mesh import replicate, shard_batch

    ids, neg = shard_batch(mesh, (input_ids, negative_input_ids))
    params_r = replicate(mesh, params)
    lora = kw.pop("lora", None)
    if lora is not None:
        lora = replicate(mesh, lora)
    return sample(params_r, schedule, ids, neg, key, lora=lora, **kw)


def sample_2d_parallel(mesh, params, schedule, input_ids, negative_input_ids, key, **kw):
    """2-D parallel sampling: batch sharded over "data" AND the UNet
    tensor-sharded over "model" (Megatron placement via
    `parallel.shard_unet_params_tp` — per-level shard-or-replicate for
    SD2.1's 5/10/20 heads). jit's SPMD partitioner inserts the two
    all-reduces per transformer block over ICI; text encoder and VAE stay
    replicated (tiny share of the FLOPs)."""
    from ..core.mesh import replicate, shard_batch
    from ..parallel import shard_unet_params_tp

    models = kw.get("models", SamplerModels())
    ids, neg = shard_batch(mesh, (input_ids, negative_input_ids))
    placed = {
        "text_encoder": replicate(mesh, params["text_encoder"]),
        "vae": replicate(mesh, params["vae"]),
        "unet": shard_unet_params_tp(
            params["unet"], mesh, head_dim=models.unet_cfg.head_dim
        ),
    }
    lora = kw.pop("lora", None)
    if lora is not None:
        lora = replicate(mesh, lora)
    return sample(placed, schedule, ids, neg, key, lora=lora, **kw)
