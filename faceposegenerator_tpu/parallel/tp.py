"""Tensor-parallel sharding for the UNet over the mesh "model" axis.

The reference has no tensor parallelism (SURVEY.md §2.5 — optional for
>1-chip inference). This implements the Megatron pattern purely through
parameter placement — no model-code changes:

  - attention q/k/v projections: shard the OUT dim (heads split across
    chips); the per-head attention then computes locally;
  - attention out-projection: shard the IN dim → partial results, XLA
    inserts the psum;
  - GEGLU ff_in: shard OUT (both value and gate halves are sharded
    consistently because the weight is one (8h, h) matrix — we shard each
    half separately via a blocked spec); ff_out: shard IN;
  - convolutions, norms, time embedding: replicated.

jit's SPMD partitioner propagates these shardings through reshapes and
einsums and inserts the two all-reduces per transformer block (attention
out + MLP out) — collectives ride ICI. Combine with batch sharding over
"data" for 2-D ("data", "model") meshes.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import MODEL_AXIS


def _put(x, mesh, spec):
    return jax.device_put(x, NamedSharding(mesh, spec))


def tp_sharding_plan(mesh: Mesh):
    """Returns the (spec_for_attn, spec_for_ff) leaf rules."""
    row = P(MODEL_AXIS, None)  # shard out-dim of (out, in)
    col = P(None, MODEL_AXIS)  # shard in-dim
    rep = P()
    return row, col, rep


def _shard_attn(attn, mesh, n_model, head_dim):
    """Shard the projections head-aligned, or replicate when the level's
    head count doesn't divide the model axis.

    SD2.1's per-level head counts are 5/10/20: at model=2 the 5-head level-0
    attention replicates (its heads can't split evenly) while the 10- and
    20-head levels shard; at model=4 the 20-head levels shard. Replication
    keeps the attention math local and exact at any axis size — the
    alternative (splitting mid-head) would make XLA re-gather the full
    projection at the (b, s, nh, hd) reshape anyway."""
    row, col, rep = tp_sharding_plan(mesh)
    n_heads = attn["q"]["w"].shape[0] // head_dim
    if n_heads % n_model != 0:
        return {k: jax.tree.map(lambda x: _put(x, mesh, P()), v) for k, v in attn.items()}
    out = dict(attn)
    for name in ("q", "k", "v"):
        p = dict(attn[name])
        p["w"] = _put(attn[name]["w"], mesh, row)
        out[name] = p
    o = dict(attn["out"])
    o["w"] = _put(attn["out"]["w"], mesh, col)
    if "b" in o:
        o["b"] = _put(o["b"], mesh, P())  # bias added once post-psum
    out["out"] = o
    return out


def _shard_transformer(tr, mesh, n_model, head_dim):
    row, col, rep = tp_sharding_plan(mesh)
    out = dict(tr)
    blocks = []
    for blk in tr["blocks"]:
        b = dict(blk)
        b["attn1"] = _shard_attn(blk["attn1"], mesh, n_model, head_dim)
        b["attn2"] = _shard_attn(blk["attn2"], mesh, n_model, head_dim)
        ff_in = dict(blk["ff_in"])
        # GEGLU weight rows are [value(4h); gate(4h)]; row-sharding the 8h
        # output dim is correct — the later split at 4h slices the logical
        # array and XLA re-shards as needed
        ff_in["w"] = _put(blk["ff_in"]["w"], mesh, row)
        if "b" in ff_in:
            ff_in["b"] = _put(blk["ff_in"]["b"], mesh, P(MODEL_AXIS))
        b["ff_in"] = ff_in
        ff_out = dict(blk["ff_out"])
        ff_out["w"] = _put(blk["ff_out"]["w"], mesh, col)
        if "b" in ff_out:
            ff_out["b"] = _put(blk["ff_out"]["b"], mesh, P())
        b["ff_out"] = ff_out
        blocks.append(b)
    out["blocks"] = blocks
    return out


def shard_unet_params_tp(params, mesh: Mesh, head_dim: int = 64):
    """Place UNet params for tensor parallelism over "model"; everything not
    attention/MLP is replicated. Levels whose head count doesn't divide the
    model axis keep their attention replicated (see `_shard_attn`), so ANY
    model-axis size is legal for SD2.1 (5/10/20 heads): model=2 shards the
    10/20-head levels, model=4 the 20-head ones, model=5 all of them."""
    n_model = mesh.shape[MODEL_AXIS]
    rep = NamedSharding(mesh, P())

    def replicate(tree):
        return jax.tree.map(lambda x: jax.device_put(x, rep), tree)

    out = {
        "conv_in": replicate(params["conv_in"]),
        "time_embedding": replicate(params["time_embedding"]),
        "conv_norm_out": replicate(params["conv_norm_out"]),
        "conv_out": replicate(params["conv_out"]),
        "down_blocks": [],
        "up_blocks": [],
    }

    def shard_block(block):
        b = {"resnets": [replicate(r) for r in block["resnets"]]}
        if block.get("attentions") is not None:
            attns = []
            for tr in block["attentions"]:
                t = _shard_transformer(tr, mesh, n_model, head_dim)
                t["norm"] = replicate(tr["norm"])
                t["proj_in"] = replicate(tr["proj_in"])
                t["proj_out"] = replicate(tr["proj_out"])
                for blk_sharded, blk_orig in zip(t["blocks"], tr["blocks"]):
                    for ln in ("ln1", "ln2", "ln3"):
                        blk_sharded[ln] = replicate(blk_orig[ln])
                attns.append(t)
            b["attentions"] = attns
        else:
            b["attentions"] = None
        for k in ("downsample", "upsample"):
            if k in block:
                b[k] = replicate(block[k]) if block[k] is not None else None
        return b

    for block in params["down_blocks"]:
        out["down_blocks"].append(shard_block(block))
    out["mid_block"] = shard_block(params["mid_block"])
    for block in params["up_blocks"]:
        out["up_blocks"].append(shard_block(block))
    return out
