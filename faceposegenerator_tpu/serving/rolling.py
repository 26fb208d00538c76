"""Rolling (iteration-level) serving: continuous batching for diffusion.

`SamplerServer` forms a batch, runs the whole 30-step program, returns —
a request arriving one tick after a batch launches waits the FULL program
(~4 s at bs8) before its first denoise step. This engine is the diffusion
equivalent of LLM continuous batching ("in-flight batching"): a persistent
B-slot device state where every slot advances its OWN timestep each tick,
so a request admits into any free slot immediately and leaves after
exactly S ticks, regardless of what the other slots are doing.

TPU-first shape of the design — everything is a handful of fixed-shape
programs compiled once:

  _admit   CLIP-encode ONE request's [negative; positive] prompts, write
           its rows into the (2B, 77, D) context buffer, its pre-drawn
           noise stream into the (S+1, B, h, w, 4) buffer (the SAME
           per-seed stream as `engine._batch_noise`, so a (prompt, seed,
           lora) request is reproducible across both engines), and its
           initial latent into slot `slot` — slot index is a traced
           scalar, so admissions never retrace.
  _tick    one denoise step for ALL slots: UNet over the [uncond; cond]
           2B rows with per-slot timesteps (the UNet is row-independent),
           per-slot adapters via the stacked-LoRA mechanism
           (`ops.lora.lora_delta`), then a vmapped per-slot scheduler
           step. Finished/free slots (step == S) pass through frozen —
           padding compute, exactly like a padded batch in the classic
           engine.
  _decode1 VAE decode at batch 1 per COMPLETED slot — total decode work
           stays one decode-image per image (decoding the whole B-slot
           buffer per completion would multiply decode cost ~B×).

The host mirrors every slot's step count (it admitted the slot; ticks are
counted), so the steady-state loop dispatches ticks ASYNCHRONOUSLY with
zero device fetches — the only blocking fetch is a completed image. On
the axon tunnel (25 ms RTT per dispatch) this matters: dispatches
pipeline under the ~0.1–0.5 s device tick.

Determinism: a request's noise depends only on its seed (same stream as
the batch engine) and every per-slot computation is row-independent, so
the result for (prompt, seed, lora) is the same whether it rode a full
rolling mix, an empty server, or the classic batch engine — up to
compile-level numeric jitter between the two programs (tested at fp32).

No reference equivalent: the reference generates one image at a time and
reloads the pipeline per identity (`inference_ID-Booth.py:103-144`).
Approximation modes (DeepCache/ToMe/cfg_interval) are NOT composable with
rolling slots (their state is step-synchronized across the batch);
quantization composes (it is param-side) via `pipe.quantize`; the
few-step DPM-Solver++ scheduler composes via per-slot multistep history
buffers (`_tick_dpm` — the reference's own validation sampler,
`train_ID-Booth.py:155`); and a `jax.sharding.Mesh` composes
data-parallel: the persistent slot buffers shard over the "data" axis
(`_place`), params/stacked adapters replicate (base class), and every
tick is one SPMD program — CPU-mesh parity test in tests/test_rolling.py.
"""

from __future__ import annotations

import collections
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core.compile import jit as _options_jit
from ..core.rng import sampler_key
from ..models import clip_text, unet2d, vae
from ..ops.image import quantize_u8 as _quantize_u8
from .engine import GenerationResult, SamplerServer


@functools.partial(_options_jit, static_argnames=("models", "policy", "S"))
def _admit(
    text_params, ids, neg_ids, seed, slot,
    ctx_buf, noise_buf, latents, text_lora, lora_scale,
    *, models, policy, S,
):
    """Admit one request into `slot` (traced scalar — no retrace per slot).

    ids/neg_ids: (1, 77). `text_lora`: the request's text-encoder adapter
    (2-D leaves; the zero adapter for lora-less requests keeps the pytree
    structure — and therefore the compiled program — constant). The UNet
    half of the adapter applies per-tick instead. Returns updated
    (ctx_buf, noise_buf, latents).
    """
    B = latents.shape[0]
    h, w = latents.shape[1], latents.shape[2]
    ctx = clip_text.apply(
        text_params, jnp.concatenate([neg_ids, ids], axis=0),
        models.text_cfg, policy=policy,
        lora=text_lora, lora_scale=lora_scale,
    )  # (2, 77, D): [uncond; cond]
    ctx_buf = ctx_buf.at[slot].set(ctx[0]).at[B + slot].set(ctx[1])
    # same stream as engine._batch_noise: index 0 = initial latent,
    # index i+1 = step-i DDPM noise
    stream = jax.random.normal(sampler_key(seed), (S + 1, h, w, 4), jnp.float32)
    noise_buf = noise_buf.at[:, slot].set(stream)
    latents = latents.at[slot].set(stream[0])
    return ctx_buf, noise_buf, latents


@functools.partial(
    _options_jit,
    tpu_default_options={"xla_tpu_enable_experimental_fusion_cost_model": "true"},
    static_argnames=("models", "guidance_scale", "policy", "S"),
)
def _tick(
    params, schedule, latents, step_idx, ctx_buf, noise_buf,
    lora, lora_scale, *, models, guidance_scale, policy, S,
):
    """One denoise step for every live slot (step_idx < S); others frozen.

    step_idx: (B,) int32 host-mirrored step counters (S = done/free).
    Returns (latents, step_idx) advanced.
    """
    B = latents.shape[0]
    safe_idx = jnp.clip(step_idx, 0, S - 1)
    t = schedule.timesteps[safe_idx]  # (B,) per-slot timesteps

    unet_lora = None if lora is None else lora.get("unet")
    scale2 = lora_scale
    if unet_lora is not None:
        leaves = jax.tree.leaves(unet_lora)
        if leaves and leaves[0].ndim == 3:
            # per-slot adapters tile ×2 so slot b rides rows b and B+b
            unet_lora = jax.tree.map(
                lambda l: jnp.concatenate([l, l], axis=0), unet_lora
            )
            if isinstance(lora_scale, jax.Array) and lora_scale.ndim == 1:
                scale2 = jnp.concatenate([lora_scale, lora_scale], axis=0)

    lat2 = jnp.concatenate([latents, latents], axis=0)
    t2 = jnp.concatenate([t, t], axis=0)
    eps = unet2d.apply(
        params["unet"], lat2, t2, ctx_buf, models.unet_cfg, policy=policy,
        lora=unet_lora, lora_scale=scale2, attn_impl=models.attn_impl,
    )
    eps_u, eps_c = jnp.split(eps, 2, axis=0)
    eps = eps_u + guidance_scale * (eps_c - eps_u)

    step_noise = noise_buf[safe_idx + 1, jnp.arange(B)]  # (B, h, w, 4)
    x_new, _ = jax.vmap(
        lambda e, i, x, n: schedule.step(e, i, x, n)
    )(eps, safe_idx, latents, step_noise)

    live = step_idx < S
    latents = jnp.where(live[:, None, None, None], x_new, latents)
    return latents, jnp.where(live, step_idx + 1, step_idx)


@functools.partial(
    _options_jit,
    tpu_default_options={"xla_tpu_enable_experimental_fusion_cost_model": "true"},
    static_argnames=("models", "guidance_scale", "policy", "S"),
)
def _tick_dpm(
    params, schedule, latents, m0, m1, step_idx, ctx_buf,
    lora, lora_scale, *, models, guidance_scale, policy, S,
):
    """One DPM-Solver++ 2M step for every live slot — the few-step
    scheduler (the reference's own validation sampler,
    `train_ID-Booth.py:155`) on the rolling path.

    Per-slot multistep state: `m0`/`m1` are the (B, h, w, 4) data-
    prediction history buffers; a slot's warm-up counter IS its step index
    (the sequential sampler's `prev_count` increments exactly once per
    step from 0 — `diffusion/schedulers.py DPMSolverSchedule.step`), so no
    extra counter buffer. Stale history from a slot's previous occupant
    cannot leak: step 0 takes the first-order branch (prev_count < 1)
    which never reads m0, and order-2 never reads m1 — step 0 then
    overwrites m0 with the fresh x̂0. Deterministic (no per-step noise).
    Returns (latents, m0, m1, step_idx) advanced.
    """
    B = latents.shape[0]
    safe_idx = jnp.clip(step_idx, 0, S - 1)
    t = schedule.timesteps[safe_idx]

    unet_lora = None if lora is None else lora.get("unet")
    scale2 = lora_scale
    if unet_lora is not None:
        leaves = jax.tree.leaves(unet_lora)
        if leaves and leaves[0].ndim == 3:
            unet_lora = jax.tree.map(
                lambda l: jnp.concatenate([l, l], axis=0), unet_lora
            )
            if isinstance(lora_scale, jax.Array) and lora_scale.ndim == 1:
                scale2 = jnp.concatenate([lora_scale, lora_scale], axis=0)

    lat2 = jnp.concatenate([latents, latents], axis=0)
    t2 = jnp.concatenate([t, t], axis=0)
    eps = unet2d.apply(
        params["unet"], lat2, t2, ctx_buf, models.unet_cfg, policy=policy,
        lora=unet_lora, lora_scale=scale2, attn_impl=models.attn_impl,
    )
    eps_u, eps_c = jnp.split(eps, 2, axis=0)
    eps = eps_u + guidance_scale * (eps_c - eps_u)

    def one(e, i, x, a, b):
        (x_new, a_new, b_new, _), _ = schedule.step(e, i, (x, a, b, i))
        return x_new, a_new, b_new

    x_new, m0_new, m1_new = jax.vmap(one)(eps, safe_idx, latents, m0, m1)

    live = step_idx < S
    mask = live[:, None, None, None]
    latents = jnp.where(mask, x_new, latents)
    m0 = jnp.where(mask, m0_new, m0)
    m1 = jnp.where(mask, m1_new, m1)
    return latents, m0, m1, jnp.where(live, step_idx + 1, step_idx)


@functools.partial(_options_jit, static_argnames=("models", "policy"))
def _decode1(vae_params, latent, *, models, policy):
    """Decode ONE slot's latent (h, w, 4) -> (H, W, 3) uint8 on device."""
    img = vae.decode(vae_params, latent[None], models.vae_cfg, policy=policy)
    return _quantize_u8(jnp.clip(img * 0.5 + 0.5, 0.0, 1.0))[0]


class RollingServer(SamplerServer):
    """Continuous-batching variant of `SamplerServer` (same submit/generate/
    register_lora/stats/shutdown surface; `batch_size` = slot count).

    Admission is immediate into any free slot; per-request latency under
    load approaches S ticks + queue instead of S-step batch formation
    boundaries. Per-slot adapters always ride the stacked-LoRA path (the
    heterogeneous `multi_lora` mechanism), so mixed-identity traffic packs
    slots with no fragmentation by construction.
    """

    def __init__(self, pipe, **kw):
        for bad in ("parallel_window", "deepcache_interval",
                    "tome_ratio", "cfg_interval"):
            if kw.get(bad):
                raise ValueError(f"{bad} is not composable with RollingServer")
        # scheduler: "ddpm" (per-slot noise stream) or "dpm" (few-step
        # DPM-Solver++ with per-slot multistep history — `_tick_dpm`)
        kw["multi_lora"] = True  # per-slot adapters by construction
        super().__init__(pipe, **kw)

    def _place(self, x, batch_dim=0):
        """Under a mesh, pin the persistent slot state to the "data" axis
        (the slot dim, `batch_dim`) so every tick runs SPMD with slot rows
        resident; re-placed host-built arrays (the step mirror after an
        admission) keep the SAME sharding so the tick program never
        retraces."""
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..core.mesh import DATA_AXIS

        spec = P(*([None] * batch_dim + [DATA_AXIS]))
        return jax.device_put(x, NamedSharding(self.mesh, spec))

    # the classic batch collector/executor are unused; the rolling loop
    # owns the worker thread (started by SamplerServer.__init__ — method
    # resolution picks this override).
    def _run(self):
        B, S = self.batch_size, self.num_inference_steps
        h, w = self.height // 8, self.width // 8
        pipe = self.pipe
        models, policy = pipe.models, pipe.policy
        static = dict(models=models, policy=policy, S=S)

        # host mirror: per-slot (request, future, t_submit, t_admit) or None;
        # steps[i] counts ticks since admission — the host never fetches
        # device state except a finished image
        meta = [None] * B
        steps = [S] * B
        self._completions = collections.deque(maxlen=4096)  # (t_done,) stamps

        try:
            # probe the context dtype/width with a dummy encode (once)
            probe = clip_text.apply(
                self._params["text_encoder"], jnp.zeros((1, 77), jnp.int32),
                models.text_cfg, policy=policy,
            )
            ctx_buf = self._place(jnp.zeros((2 * B, 77, probe.shape[-1]), probe.dtype))
            noise_buf = self._place(jnp.zeros((S + 1, B, h, w, 4), jnp.float32), batch_dim=1)
            latents = self._place(jnp.zeros((B, h, w, 4), jnp.float32))
            step_dev = self._place(jnp.full((B,), S, jnp.int32))
            dpm = self.scheduler == "dpm"
            if dpm:  # per-slot DPM-Solver++ data-prediction history
                m0 = self._place(jnp.zeros((B, h, w, 4), jnp.float32))
                m1 = self._place(jnp.zeros((B, h, w, 4), jnp.float32))

            while not self._stop.is_set():
                # --- admit into free slots --------------------------------
                admitted = False
                with self._pending_cv:
                    self._expire_deadlined_locked()
                    free = [i for i in range(B) if meta[i] is None]
                    take = [self._pending.popleft()
                            for _ in range(min(len(free), len(self._pending)))]
                for slot, item in zip(free, take):
                    req, fut, t_sub = item
                    ids = pipe.tokenize([req.prompt])
                    neg = pipe.tokenize([req.negative_prompt])
                    req_lora, req_scale = self._loras[req.lora_id]
                    ctx_buf, noise_buf, latents = _admit(
                        self._params["text_encoder"], ids, neg,
                        jnp.uint32(req.seed), jnp.int32(slot),
                        ctx_buf, noise_buf, latents,
                        req_lora.get("text_encoder"), jnp.float32(req_scale),
                        **static,
                    )
                    meta[slot] = (req, fut, t_sub, time.perf_counter())
                    steps[slot] = 0
                    admitted = True
                if admitted:
                    step_dev = self._place(jnp.asarray(steps, jnp.int32))

                if all(m is None for m in meta):
                    with self._pending_cv:
                        self._pending_cv.wait_for(
                            lambda: self._pending or self._stop.is_set(),
                            timeout=0.1,
                        )
                    continue

                # --- one tick over all slots ------------------------------
                lora_tree, lora_scale = self._stacked_lora(
                    tuple(m[0].lora_id if m else None for m in meta)
                )
                t0 = time.perf_counter()
                if dpm:
                    latents, m0, m1, step_dev = _tick_dpm(
                        self._params, self._schedule, latents, m0, m1,
                        step_dev, ctx_buf, lora_tree, lora_scale,
                        guidance_scale=self.guidance_scale, **static,
                    )
                else:
                    latents, step_dev = _tick(
                        self._params, self._schedule, latents, step_dev,
                        ctx_buf, noise_buf, lora_tree, lora_scale,
                        guidance_scale=self.guidance_scale, **static,
                    )
                with self._stats_lock:
                    self._stats["batches"] += 1  # = ticks
                    self._stats["batch_sizes"].append(
                        sum(1 for m in meta if m is not None)
                    )
                for i in range(B):
                    if meta[i] is not None:
                        steps[i] += 1

                # --- complete finished slots ------------------------------
                for i in range(B):
                    if meta[i] is not None and steps[i] >= S:
                        req, fut, t_sub, t_adm = meta[i]
                        lat_i = latents[i]
                        if self.mesh is not None:
                            # params are mesh-replicated; replicate the slot's
                            # latent so the batch-1 decode is one SPMD program
                            from jax.sharding import NamedSharding, PartitionSpec

                            lat_i = jax.device_put(
                                lat_i, NamedSharding(self.mesh, PartitionSpec())
                            )
                        img = np.asarray(_decode1(
                            self._params["vae"], lat_i,
                            models=models, policy=policy,
                        ))  # blocking fetch — the only one in the loop
                        t1 = time.perf_counter()
                        with self._stats_lock:
                            self._stats["requests"] += 1
                            self._stats["queue_times"].append(t_adm - t_sub)
                            self._stats["batch_times"].append(t1 - t0)
                        self._completions.append(t1)
                        if not fut.done():
                            fut.set_result(GenerationResult(
                                image=img, seed=req.seed, lora_id=req.lora_id,
                                queue_s=t_adm - t_sub, batch_s=t1 - t_adm,
                            ))
                        meta[i] = None
        except Exception as e:  # fail in-flight and queued requests, not hang
            for m in meta:
                if m is not None and not m[1].done():
                    m[1].set_exception(e)
            self._fail_all_pending(e)
        # worker exiting (shutdown): resolve whatever is left
        err = RuntimeError("server shut down")
        for m in meta:
            if m is not None and not m[1].done():
                m[1].set_exception(err)
        self._fail_all_pending(err)

    def stats(self) -> dict:
        base = super().stats()
        comp = list(getattr(self, "_completions", ()))
        if len(comp) >= 2:
            base["images_per_s"] = round((len(comp) - 1) / (comp[-1] - comp[0]), 3)
        base["ticks"] = base.pop("batches")
        base.pop("padded_slots", None)
        return base
