"""SD2.1 UNet2DCondition in functional JAX (NHWC, TPU-native layout).

Replaces the diffusers `UNet2DConditionModel` the reference loads from
SD2.1-base (`train_ID-Booth.py:620-630`; sampled 60×/image inside
`inference_ID-Booth.py:138`'s 30-step CFG loop). Operating point (SD2.1-base
`unet/config.json` semantics): in/out 4 channels, block channels
(320, 640, 1280, 1280), 2 resnet layers per block, cross-attention dim 1024,
64-dim attention heads (5/10/20/20 heads per level), linear transformer
projections, GN(32, eps 1e-5) in resnets / GN(32, eps 1e-6) in transformers,
GEGLU feed-forward, epsilon prediction.

Design notes (TPU-first):
  - NHWC everywhere; convs via `lax.conv_general_dilated` with HWIO weights.
  - Attention dispatches to the Pallas flash kernel on TPU (4096-token
    self-attention, padded/masked 77-token cross-attention).
  - Params are a nested pytree with torch-Linear orientation so the
    safetensors bridge is pure key mapping; LoRA is threaded *factored*
    through the six attention projections (`train_ID-Booth.py:676`) so
    checkpoint swaps never change program structure (no recompile).
  - Optional `remat` wraps each block in `jax.checkpoint` (the TPU
    equivalent of `gradient_checkpointing`, `configs/config_train_SD21.py:52`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..core.precision import Policy, DEFAULT_POLICY
from ..ops import quant
from ..ops.attention import dot_product_attention
from ..ops.norms import group_norm, layer_norm
from ..ops.lora import broadcast_scale, lora_delta, lora_dense


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    head_dim: int = 64
    norm_groups: int = 32
    down_block_has_attn: Sequence[bool] = (True, True, True, False)
    transformer_layers: int = 1
    freq_shift: int = 0
    flip_sin_to_cos: bool = True

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


SD21_UNET_CONFIG = UNetConfig()


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def conv2d(x, p, stride=1, padding=1):
    """NHWC conv with HWIO weights + bias. Quantized trees (`ops/quant.py`,
    opt-in w8a8) carry `{"q": int8, "s": scale}` in place of the `"w"`
    array; the dispatch is on pytree structure, so the exact path's
    compiled program is untouched."""
    if quant.is_quantized(p["w"]):
        return quant.qconv2d(x, p, stride=stride, padding=padding)
    dn = jax.lax.conv_dimension_numbers(x.shape, p["w"].shape, ("NHWC", "HWIO", "NHWC"))
    pad = ((padding, padding), (padding, padding)) if isinstance(padding, int) else padding
    # NOTE: no preferred_element_type here — bf16 TPU convs accumulate in
    # fp32 on the MXU natively, and upcast-then-downcast breaks the conv
    # transpose (gradient) rule's dtype agreement under bf16 training
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=dn,
    )
    return y + p["b"].astype(x.dtype)


def timestep_embedding(t: jax.Array, dim: int, flip_sin_to_cos: bool, freq_shift: float, max_period: float = 10000.0):
    """Sinusoidal timestep features, diffusers `Timesteps` semantics."""
    half = dim // 2
    exponent = -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    emb = t.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    return jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _conv_init(key, kh, kw, cin, cout, dtype):
    fan_in = kh * kw * cin
    scale = (1.0 / fan_in) ** 0.5
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.uniform(k1, (kh, kw, cin, cout), dtype, -scale, scale),
        "b": jax.random.uniform(k2, (cout,), dtype, -scale, scale),
    }


def _dense_init(key, cout, cin, dtype, bias=True):
    scale = (1.0 / cin) ** 0.5
    k1, k2 = jax.random.split(key)
    p = {"w": jax.random.uniform(k1, (cout, cin), dtype, -scale, scale)}
    if bias:
        p["b"] = jax.random.uniform(k2, (cout,), dtype, -scale, scale)
    return p


def _gn_init(c, dtype):
    return {"g": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)}


def _ln_init(c, dtype):
    return {"g": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)}


def _resblock_init(key, cin, cout, temb_dim, dtype):
    ks = jax.random.split(key, 4)
    p = {
        "norm1": _gn_init(cin, dtype),
        "conv1": _conv_init(ks[0], 3, 3, cin, cout, dtype),
        "time_emb_proj": _dense_init(ks[1], cout, temb_dim, dtype),
        "norm2": _gn_init(cout, dtype),
        "conv2": _conv_init(ks[2], 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["conv_shortcut"] = _conv_init(ks[3], 1, 1, cin, cout, dtype)
    return p


def _attn_init(key, dim, ctx_dim, dtype):
    ks = jax.random.split(key, 4)
    return {
        "q": _dense_init(ks[0], dim, dim, dtype, bias=False),
        "k": _dense_init(ks[1], dim, ctx_dim, dtype, bias=False),
        "v": _dense_init(ks[2], dim, ctx_dim, dtype, bias=False),
        "out": _dense_init(ks[3], dim, dim, dtype, bias=True),
    }


def _transformer_init(key, cfg: UNetConfig, dim, dtype):
    ks = jax.random.split(key, 4 + 2 * cfg.transformer_layers)
    blocks = []
    for i in range(cfg.transformer_layers):
        bk = jax.random.split(ks[4 + i], 5)
        blocks.append(
            {
                "ln1": _ln_init(dim, dtype),
                "attn1": _attn_init(bk[0], dim, dim, dtype),
                "ln2": _ln_init(dim, dtype),
                "attn2": _attn_init(bk[1], dim, cfg.cross_attention_dim, dtype),
                "ln3": _ln_init(dim, dtype),
                "ff_in": _dense_init(bk[2], dim * 8, dim, dtype),  # GEGLU: 2×4h
                "ff_out": _dense_init(bk[3], dim, dim * 4, dtype),
            }
        )
    return {
        "norm": _gn_init(dim, dtype),
        "proj_in": _dense_init(ks[0], dim, dim, dtype),
        "proj_out": _dense_init(ks[1], dim, dim, dtype),
        "blocks": blocks,
    }


def init(key: jax.Array, cfg: UNetConfig = SD21_UNET_CONFIG, dtype=jnp.float32):
    C = list(cfg.block_out_channels)
    temb = cfg.time_embed_dim
    keys = iter(jax.random.split(key, 256))
    nk = lambda: next(keys)

    params = {
        "conv_in": _conv_init(nk(), 3, 3, cfg.in_channels, C[0], dtype),
        "time_embedding": {
            "linear_1": _dense_init(nk(), temb, C[0], dtype),
            "linear_2": _dense_init(nk(), temb, temb, dtype),
        },
        "down_blocks": [],
        "mid_block": None,
        "up_blocks": [],
        "conv_norm_out": _gn_init(C[0], dtype),
        "conv_out": _conv_init(nk(), 3, 3, C[0], cfg.out_channels, dtype),
    }

    # down path
    cin = C[0]
    for lvl, cout in enumerate(C):
        is_last = lvl == len(C) - 1
        block = {"resnets": [], "attentions": [] if cfg.down_block_has_attn[lvl] else None}
        for j in range(cfg.layers_per_block):
            block["resnets"].append(_resblock_init(nk(), cin if j == 0 else cout, cout, temb, dtype))
            if cfg.down_block_has_attn[lvl]:
                block["attentions"].append(_transformer_init(nk(), cfg, cout, dtype))
        block["downsample"] = None if is_last else _conv_init(nk(), 3, 3, cout, cout, dtype)
        params["down_blocks"].append(block)
        cin = cout

    # mid
    params["mid_block"] = {
        "resnets": [
            _resblock_init(nk(), C[-1], C[-1], temb, dtype),
            _resblock_init(nk(), C[-1], C[-1], temb, dtype),
        ],
        "attentions": [_transformer_init(nk(), cfg, C[-1], dtype)],
    }

    # up path (reversed channels, layers_per_block+1 resnets, skip concats)
    rev = list(reversed(C))  # (1280, 1280, 640, 320)
    has_attn_rev = list(reversed(cfg.down_block_has_attn))
    prev_out = C[-1]
    for lvl, cout in enumerate(rev):
        is_last = lvl == len(rev) - 1
        block = {"resnets": [], "attentions": [] if has_attn_rev[lvl] else None}
        for j in range(cfg.layers_per_block + 1):
            res_skip = rev[min(lvl + 1, len(rev) - 1)] if j == cfg.layers_per_block else cout
            rin = prev_out if j == 0 else cout
            block["resnets"].append(_resblock_init(nk(), rin + res_skip, cout, temb, dtype))
            if has_attn_rev[lvl]:
                block["attentions"].append(_transformer_init(nk(), cfg, cout, dtype))
        block["upsample"] = None if is_last else _conv_init(nk(), 3, 3, cout, cout, dtype)
        params["up_blocks"].append(block)
        prev_out = cout

    return params


# ---------------------------------------------------------------------------
# LoRA pytree (matches attention structure; fixed rank, zero-init B)
# ---------------------------------------------------------------------------


def init_lora(key: jax.Array, params, rank: int = 4, dtype=jnp.float32, targets=("q", "k", "v", "out")):
    """Gaussian-A/zero-B LoRA pairs for every attention projection in the
    UNet, mirroring peft target modules to_k,to_q,to_v,to_out.0
    (`train_ID-Booth.py:676`). Returns a pytree with the same block layout as
    `params` but containing only attention entries."""
    keys = iter(jax.random.split(key, 1024))

    def attn_lora(attn):
        out = {}
        for name in targets:
            wshape = quant.weight_shape(attn[name]["w"])
            a = jax.random.normal(next(keys), (rank, wshape[1]), dtype) / rank
            b = jnp.zeros((wshape[0], rank), dtype)
            out[name] = {"a": a, "b": b}
        return out

    def transformer_lora(tr):
        return {"blocks": [{"attn1": attn_lora(b["attn1"]), "attn2": attn_lora(b["attn2"])} for b in tr["blocks"]]}

    def block_lora(block):
        if block.get("attentions") is None:
            return {"attentions": None}
        return {"attentions": [transformer_lora(t) for t in block["attentions"]]}

    return {
        "down_blocks": [block_lora(b) for b in params["down_blocks"]],
        "mid_block": block_lora(params["mid_block"]),
        "up_blocks": [block_lora(b) for b in params["up_blocks"]],
    }


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def _gn_silu_conv(x, norm_p, conv_p, num_groups):
    """conv3x3(silu(gn(x))) — routed to the Pallas conv-prologue fusion
    (`ops/fused_gn_conv.py`) on eligible shapes when GN_CONV_IMPL=pallas;
    XLA formulation otherwise."""
    from ..ops.fused_gn_conv import gn_conv_impl, gn_silu_conv3x3, supported

    if (
        gn_conv_impl() == "pallas"
        and jax.default_backend() == "tpu"
        and not quant.is_quantized(conv_p["w"])
    ):
        n, h, w, cin = x.shape
        cout = conv_p["w"].shape[-1]
        if conv_p["w"].shape[:2] == (3, 3) and supported(n, h, w, cin, cout, num_groups):
            return gn_silu_conv3x3(
                x, norm_p["g"], norm_p["b"], conv_p["w"], conv_p["b"], num_groups, 1e-5
            )
    h = group_norm(x, norm_p["g"], norm_p["b"], num_groups=num_groups, eps=1e-5, act="silu")
    return conv2d(h, conv_p)


def _resblock_apply(p, x, temb, policy: Policy, num_groups: int = 32):
    h = _gn_silu_conv(x, p["norm1"], p["conv1"], num_groups)
    t = lora_dense(jax.nn.silu(temb), p["time_emb_proj"]["w"], p["time_emb_proj"]["b"])
    h = h + t[:, None, None, :].astype(h.dtype)
    h = _gn_silu_conv(h, p["norm2"], p["conv2"], num_groups)
    if "conv_shortcut" in p:
        x = conv2d(x, p["conv_shortcut"], padding=0)
    return x + h


def _attention_apply(p, x, ctx, head_dim, lora=None, lora_scale=1.0, attn_impl="auto", kv_len=None):
    """x: (B, S, C) queries; ctx: (B, Skv, Cctx) keys/values.

    Self-attention (ctx is x) fuses the q/k/v projections into ONE GEMM: the
    weight concat is loop-invariant so XLA hoists it out of the sampling
    fori_loop, and one (S, C)×(C, 3C) dot replaces three (S, C)×(C, C) dots
    (larger N → better MXU tiling, one read of the activations). LoRA deltas
    stay factored per-projection (rank-4 matmuls are negligible)."""
    b, s, c = x.shape
    nh = c // head_dim

    def proj(name, inp):
        la = None if lora is None else lora.get(name)
        return lora_dense(
            inp, p[name]["w"], p[name].get("b"),
            lora_a=None if la is None else la["a"],
            lora_b=None if la is None else la["b"],
            scale=lora_scale,
        )

    if ctx is x:
        if quant.is_quantized(p["q"]["w"]):
            # w8a8: one int8 GEMM over the concatenated q/k/v weights —
            # the same fusion as the bf16 path, with x quantized once
            qkv = quant.qdense_fused(x, [p["q"]["w"], p["k"]["w"], p["v"]["w"]]).astype(x.dtype)
        else:
            wqkv = jnp.concatenate([p["q"]["w"], p["k"]["w"], p["v"]["w"]], axis=0)
            qkv = jnp.einsum(
                "...i,oi->...o", x, wqkv.astype(x.dtype),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if lora is not None:

            def delta(name, base):
                la = lora.get(name)
                if la is None:
                    return base
                d = lora_delta(x, la["a"], la["b"])
                return base + (broadcast_scale(lora_scale, d.ndim) * d).astype(base.dtype)

            q, k, v = delta("q", q), delta("k", k), delta("v", v)
        q = q.reshape(b, s, nh, head_dim)
        k = k.reshape(b, s, nh, head_dim)
        v = v.reshape(b, s, nh, head_dim)
    else:
        q = proj("q", x).reshape(b, s, nh, head_dim)
        k = proj("k", ctx).reshape(b, ctx.shape[1], nh, head_dim)
        v = proj("v", ctx).reshape(b, ctx.shape[1], nh, head_dim)
    o = dot_product_attention(q, k, v, impl=attn_impl, kv_len=kv_len).reshape(b, s, c)
    return proj("out", o)


def _transformer_apply(p, x, ctx, cfg: UNetConfig, lora=None, lora_scale=1.0, attn_impl="auto", ctx_len=None,
                       tome_ratio=0.0, tome_min_tokens=4096, tome_ops="attn"):
    b, hh, ww, c = x.shape
    res = x
    # ToMe (ops/tome.py, opt-in): merge the most-redundant tokens before the
    # level-0 transformer ops, copy outputs back after. Gate on token count
    # so one knob threads uniformly through every level (512²: only 64²=4096
    # qualifies at the default threshold). `tome_ops` selects which ops run
    # on the merged set (tomesd's merge_attn/merge_crossattn/merge_mlp):
    # "attn" (default, upstream's quality-safe choice), plus "xattn" and/or
    # "mlp" — ONE matching per block (computed from the block input) is
    # reused by all selected ops, exactly as upstream does.
    tome_r = 0
    if tome_ratio > 0.0 and hh * ww >= tome_min_tokens:
        from ..ops import tome as _tome

        tome_r = _tome.merge_count(hh * ww, tome_ratio)
    h = group_norm(x, p["norm"]["g"], p["norm"]["b"], num_groups=cfg.norm_groups, eps=1e-6)
    h = h.reshape(b, hh * ww, c)
    h = lora_dense(h, p["proj_in"]["w"], p["proj_in"]["b"])
    for i, blk in enumerate(p["blocks"]):
        blora = None if lora is None else lora["blocks"][i]
        m = _tome.build_match(h, hh, ww, tome_r) if tome_r > 0 else None

        r = h
        hn = layer_norm(h, blk["ln1"]["g"], blk["ln1"]["b"])
        if m is not None:
            hm = _tome.merge(hn, m)  # ONE object: keeps the fused-qkv path
            h = r + _tome.unmerge(
                _attention_apply(
                    blk["attn1"], hm, hm, cfg.head_dim,
                    lora=None if blora is None else blora["attn1"],
                    lora_scale=lora_scale, attn_impl=attn_impl,
                ),
                m,
            )
        else:
            h = r + _attention_apply(
                blk["attn1"], hn, hn, cfg.head_dim,
                lora=None if blora is None else blora["attn1"],
                lora_scale=lora_scale, attn_impl=attn_impl,
            )
        r = h
        hn = layer_norm(h, blk["ln2"]["g"], blk["ln2"]["b"])
        if m is not None and "xattn" in tome_ops:
            h = r + _tome.unmerge(
                _attention_apply(
                    blk["attn2"], _tome.merge(hn, m), ctx, cfg.head_dim,
                    lora=None if blora is None else blora["attn2"],
                    lora_scale=lora_scale, attn_impl=attn_impl, kv_len=ctx_len,
                ),
                m,
            )
        else:
            h = r + _attention_apply(
                blk["attn2"], hn, ctx, cfg.head_dim,
                lora=None if blora is None else blora["attn2"],
                lora_scale=lora_scale, attn_impl=attn_impl, kv_len=ctx_len,
            )
        r = h
        hn = layer_norm(h, blk["ln3"]["g"], blk["ln3"]["b"])
        if m is not None and "mlp" in tome_ops:
            hn = _tome.merge(hn, m)
        ff = lora_dense(hn, blk["ff_in"]["w"], blk["ff_in"]["b"])
        # GEGLU: first half is the value, second half is the gelu gate
        val, gate = jnp.split(ff, 2, axis=-1)
        ff_out = lora_dense(val * jax.nn.gelu(gate, approximate=False), blk["ff_out"]["w"], blk["ff_out"]["b"])
        if m is not None and "mlp" in tome_ops:
            ff_out = _tome.unmerge(ff_out, m)
        h = r + ff_out
    h = lora_dense(h, p["proj_out"]["w"], p["proj_out"]["b"])
    return res + h.reshape(b, hh, ww, c)


def _downsample(p, x):
    return conv2d(x, p, stride=2, padding=1)


def _upsample(p, x):
    b, h, w, c = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return conv2d(x, p, stride=1, padding=1)


def apply(
    params,
    latents: jax.Array,
    timesteps: jax.Array,
    encoder_hidden_states: jax.Array,
    cfg: UNetConfig = SD21_UNET_CONFIG,
    policy: Policy = DEFAULT_POLICY,
    lora: Optional[dict] = None,
    lora_scale: float | jax.Array = 1.0,
    attn_impl: str = "auto",
    ctx_len: Optional[int] = None,
    remat: bool = False,
    tome_ratio: float = 0.0,
    tome_min_tokens: int = 4096,
    tome_ops: str = "attn",
) -> jax.Array:
    """Predict noise ε̂.

    latents: (B, H, W, 4) NHWC; timesteps: (B,) or scalar int;
    encoder_hidden_states: (B, 77, 1024) CLIP conditioning.
    `tome_ratio > 0` (OPT-IN approximation) merges that fraction of tokens
    before each ≥4096-token self-attention (ops/tome.py); 0.0 is exact.
    """
    x = latents.astype(policy.compute_dtype)
    ctx = encoder_hidden_states.astype(policy.compute_dtype)
    if timesteps.ndim == 0:
        timesteps = jnp.broadcast_to(timesteps, (x.shape[0],))

    temb = timestep_embedding(timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift)
    temb = temb.astype(policy.compute_dtype)
    te = params["time_embedding"]
    temb = lora_dense(temb, te["linear_1"]["w"], te["linear_1"]["b"])
    temb = lora_dense(jax.nn.silu(temb), te["linear_2"]["w"], te["linear_2"]["b"])

    maybe_remat = (lambda f: jax.checkpoint(f)) if remat else (lambda f: f)

    x = conv2d(x, params["conv_in"])
    skips = [x]

    # down path
    for bi, block in enumerate(params["down_blocks"]):
        blora = None if lora is None else lora["down_blocks"][bi]
        for j, rp in enumerate(block["resnets"]):

            @maybe_remat
            def down_unit(x, temb, ctx, rp=rp, block=block, blora=blora, j=j):
                h = _resblock_apply(rp, x, temb, policy, cfg.norm_groups)
                if block["attentions"] is not None:
                    h = _transformer_apply(
                        block["attentions"][j], h, ctx, cfg,
                        lora=None if blora is None else blora["attentions"][j],
                        lora_scale=lora_scale, attn_impl=attn_impl, ctx_len=ctx_len,
                        tome_ratio=tome_ratio, tome_min_tokens=tome_min_tokens, tome_ops=tome_ops,
                    )
                return h

            x = down_unit(x, temb, ctx)
            skips.append(x)
        if block["downsample"] is not None:
            x = _downsample(block["downsample"], x)
            skips.append(x)

    # mid
    mid = params["mid_block"]
    mlora = None if lora is None else lora["mid_block"]

    @maybe_remat
    def mid_unit(x, temb, ctx):
        h = _resblock_apply(mid["resnets"][0], x, temb, policy, cfg.norm_groups)
        h = _transformer_apply(
            mid["attentions"][0], h, ctx, cfg,
            lora=None if mlora is None else mlora["attentions"][0],
            lora_scale=lora_scale, attn_impl=attn_impl, ctx_len=ctx_len,
            tome_ratio=tome_ratio, tome_min_tokens=tome_min_tokens, tome_ops=tome_ops,
        )
        return _resblock_apply(mid["resnets"][1], h, temb, policy, cfg.norm_groups)

    x = mid_unit(x, temb, ctx)

    # up path
    for bi, block in enumerate(params["up_blocks"]):
        blora = None if lora is None else lora["up_blocks"][bi]
        for j, rp in enumerate(block["resnets"]):
            skip = skips.pop()

            @maybe_remat
            def up_unit(x, skip, temb, ctx, rp=rp, block=block, blora=blora, j=j):
                h = _resblock_apply(rp, jnp.concatenate([x, skip.astype(x.dtype)], axis=-1), temb, policy, cfg.norm_groups)
                if block["attentions"] is not None:
                    h = _transformer_apply(
                        block["attentions"][j], h, ctx, cfg,
                        lora=None if blora is None else blora["attentions"][j],
                        lora_scale=lora_scale, attn_impl=attn_impl, ctx_len=ctx_len,
                        tome_ratio=tome_ratio, tome_min_tokens=tome_min_tokens, tome_ops=tome_ops,
                    )
                return h

            x = up_unit(x, skip, temb, ctx)
        if block["upsample"] is not None:
            x = _upsample(block["upsample"], x)

    x = group_norm(x, params["conv_norm_out"]["g"], params["conv_norm_out"]["b"], num_groups=cfg.norm_groups, eps=1e-5, act="silu")
    x = conv2d(x, params["conv_out"])
    return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# DeepCache-style cached apply (training-free sampler acceleration, opt-in)
# ---------------------------------------------------------------------------


def apply_cached(
    params,
    latents: jax.Array,
    timesteps: jax.Array,
    encoder_hidden_states: jax.Array,
    cfg: UNetConfig = SD21_UNET_CONFIG,
    policy: Policy = DEFAULT_POLICY,
    lora: Optional[dict] = None,
    lora_scale: float | jax.Array = 1.0,
    attn_impl: str = "auto",
    ctx_len: Optional[int] = None,
    depth: int = 1,
    cached: Optional[jax.Array] = None,
    tome_ratio: float = 0.0,
    tome_min_tokens: int = 4096,
    tome_ops: str = "attn",
):
    """ε̂ with a DeepCache-style deep-feature cache (opt-in approximation;
    `apply` stays the exact default).

    Adjacent denoising steps change the UNet's DEEP features far less than
    its shallow ones (DeepCache, arXiv:2312.00858; "Faster Diffusion"
    encoder propagation, arXiv:2312.09608 — see PAPERS.md). With `cached`
    given, only the shallowest `depth` down blocks (where the fresh latent
    enters; their downsamples dropped) and the last `depth` up blocks run,
    splicing `cached` as the feature entering `up_blocks[L-depth]` — the
    skip bookkeeping is exact: up block L-1 consumes [conv_in, d0r0, d0r1],
    up block L-2 consumes [d0ds, d1r0, d1r1], … so the partial pass's
    recomputed skips are exactly the ones the executed up blocks read.
    With `cached=None` the FULL network runs (identical math to `apply`)
    and the splice-point feature is returned for reuse.

    Returns (eps, cache). `partial(z, full_cache(z)) == full(z)` bit-for-bit
    on the same latent (tests/test_deepcache.py) — the approximation comes
    only from reusing a cache across steps, never from the splice itself.
    Inference-only (no remat); the reference has no counterpart (it samples
    the full UNet 60×/image, `inference_ID-Booth.py:138`).
    """
    L = len(params["down_blocks"])
    if not 1 <= depth < L:
        raise ValueError(f"depth must be in [1, {L - 1}], got {depth}")
    x = latents.astype(policy.compute_dtype)
    ctx = encoder_hidden_states.astype(policy.compute_dtype)
    if timesteps.ndim == 0:
        timesteps = jnp.broadcast_to(timesteps, (x.shape[0],))

    temb = timestep_embedding(timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift)
    temb = temb.astype(policy.compute_dtype)
    te = params["time_embedding"]
    temb = lora_dense(temb, te["linear_1"]["w"], te["linear_1"]["b"])
    temb = lora_dense(jax.nn.silu(temb), te["linear_2"]["w"], te["linear_2"]["b"])

    partial = cached is not None
    n_down = depth if partial else L  # shallow blocks always recompute

    def down_unit(block, blora, j, x):
        h = _resblock_apply(block["resnets"][j], x, temb, policy, cfg.norm_groups)
        if block["attentions"] is not None:
            h = _transformer_apply(
                block["attentions"][j], h, ctx, cfg,
                lora=None if blora is None else blora["attentions"][j],
                lora_scale=lora_scale, attn_impl=attn_impl, ctx_len=ctx_len,
                tome_ratio=tome_ratio, tome_min_tokens=tome_min_tokens, tome_ops=tome_ops,
            )
        return h

    x = conv2d(x, params["conv_in"])
    skips = [x]
    for bi in range(n_down):
        block = params["down_blocks"][bi]
        blora = None if lora is None else lora["down_blocks"][bi]
        for j in range(len(block["resnets"])):
            x = down_unit(block, blora, j, x)
            skips.append(x)
        # the deepest recomputed block's downsample feeds only SKIPPED
        # blocks in the partial pass — drop it there
        if block["downsample"] is not None and not (partial and bi == depth - 1):
            x = _downsample(block["downsample"], x)
            skips.append(x)

    if partial:
        x = cached.astype(policy.compute_dtype)
        cache_out = cached
        first_up = L - depth
    else:
        mid = params["mid_block"]
        mlora = None if lora is None else lora["mid_block"]
        h = _resblock_apply(mid["resnets"][0], x, temb, policy, cfg.norm_groups)
        h = _transformer_apply(
            mid["attentions"][0], h, ctx, cfg,
            lora=None if mlora is None else mlora["attentions"][0],
            lora_scale=lora_scale, attn_impl=attn_impl, ctx_len=ctx_len,
            tome_ratio=tome_ratio, tome_min_tokens=tome_min_tokens, tome_ops=tome_ops,
        )
        x = _resblock_apply(mid["resnets"][1], h, temb, policy, cfg.norm_groups)
        first_up = 0

    for bi in range(first_up, L):
        if not partial and bi == L - depth:
            cache_out = x  # feature entering up_blocks[L-depth]
        block = params["up_blocks"][bi]
        blora = None if lora is None else lora["up_blocks"][bi]
        for j in range(len(block["resnets"])):
            skip = skips.pop()
            h = _resblock_apply(
                block["resnets"][j],
                jnp.concatenate([x, skip.astype(x.dtype)], axis=-1),
                temb, policy, cfg.norm_groups,
            )
            if block["attentions"] is not None:
                h = _transformer_apply(
                    block["attentions"][j], h, ctx, cfg,
                    lora=None if blora is None else blora["attentions"][j],
                    lora_scale=lora_scale, attn_impl=attn_impl, ctx_len=ctx_len,
                    tome_ratio=tome_ratio, tome_min_tokens=tome_min_tokens, tome_ops=tome_ops,
                )
            x = h
        if block["upsample"] is not None:
            x = _upsample(block["upsample"], x)

    x = group_norm(x, params["conv_norm_out"]["g"], params["conv_norm_out"]["b"], num_groups=cfg.norm_groups, eps=1e-5, act="silu")
    x = conv2d(x, params["conv_out"])
    return x.astype(jnp.float32), cache_out
