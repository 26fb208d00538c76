"""LoRA checkpoint IO: diffusers/peft safetensors ↔ factored LoRA pytrees.

The reference saves LoRA-only checkpoints via
`LoraLoaderMixin.save_lora_weights` → `pytorch_lora_weights.safetensors`
(`train_ID-Booth.py:744-766,1240-1258`) and loads them with
`pipe.load_lora_weights(<model>/<id>/checkpoint-31-6400)`
(`inference_ID-Booth.py:107`). This module speaks that wire format:

  peft-style keys      `unet.<module>.lora_A.weight` / `.lora_B.weight`
  legacy processor     `<module>.processor.to_q_lora.down.weight` / `.up.…`
  text encoder         `text_encoder.text_model.encoder.layers.{i}.self_attn.
                        {q,k,v,out}_proj.lora_A.weight`

and converts to/from the fixed-structure LoRA pytrees of
`unet2d.init_lora` / `clip_text` — missing modules become zero-B pairs so
the pytree (and the compiled program) never changes shape across checkpoint
swaps (merge-without-recompile, SURVEY.md §7 hard part (c))."""

from __future__ import annotations

import os
import re
from typing import Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..models import unet2d

_PROJ = {"to_q": "q", "to_k": "k", "to_v": "v", "to_out.0": "out"}
_PROJ_TEXT = {"q_proj": "q", "k_proj": "k", "v_proj": "v", "out_proj": "out"}


def _zeros_like_lora(unet_params, text_params, rank: int, dtype=jnp.float32):
    import jax

    unet_lora = unet2d.init_lora(jax.random.key(0), unet_params, rank=rank, dtype=dtype)
    # zero both A and B: a loaded checkpoint overwrites what it has
    unet_lora = jax.tree.map(jnp.zeros_like, unet_lora)
    text_lora = None
    if text_params is not None:
        text_lora = {}
        for i, layer in enumerate(text_params["layers"]):
            text_lora[f"layer_{i}"] = {
                v: {
                    "a": jnp.zeros((rank, layer[k]["w"].shape[1]), dtype),
                    "b": jnp.zeros((layer[k]["w"].shape[0], rank), dtype),
                }
                for k, v in (("q", "q"), ("k", "k"), ("v", "v"), ("out", "out"))
            }
    return unet_lora, text_lora


def zero_lora(unet_params, text_params=None, rank: int = 4, dtype=jnp.float32) -> dict:
    """All-zero {"unet", "text_encoder"} LoRA with the standard fixed-rank
    structure — the identity adapter. Serving keeps the no-LoRA path on the
    same compiled program as loaded checkpoints by passing this instead of
    None (the pytree-structure no-recompile invariant, CLAUDE.md)."""
    unet_lora, text_lora = _zeros_like_lora(unet_params, text_params, rank, dtype)
    return {"unet": unet_lora, "text_encoder": text_lora}


def _normalize_keys(sd: Dict[str, np.ndarray]) -> Dict[str, Tuple[str, np.ndarray]]:
    """Map raw checkpoint keys to (canonical_module_path.{A|B}, tensor)."""
    out = {}
    for k, v in sd.items():
        m = re.match(r"(.+)\.lora_A(?:\.default)?\.weight$", k)
        if m:
            out[f"{m.group(1)}.A"] = np.asarray(v)
            continue
        m = re.match(r"(.+)\.lora_B(?:\.default)?\.weight$", k)
        if m:
            out[f"{m.group(1)}.B"] = np.asarray(v)
            continue
        m = re.match(r"(.+)\.processor\.(to_[qkv]|to_out)_lora\.(down|up)\.weight$", k)
        if m:
            proj = m.group(2) if m.group(2) != "to_out" else "to_out.0"
            ab = "A" if m.group(3) == "down" else "B"
            out[f"{m.group(1)}.{proj}.{ab}"] = np.asarray(v)
            continue
        m = re.match(r"(.+)\.alpha$", k)
        if m:
            # kohya/diffusers network_alpha scalars: effective scale is
            # alpha/rank (peft `scaling`); folded into B at load time
            out[f"{m.group(1)}.alpha"] = np.asarray(v)
            continue
    return out


def lora_from_state_dict(
    sd: Dict[str, np.ndarray],
    unet_params,
    text_params=None,
    rank: Optional[int] = None,
    dtype=jnp.float32,
) -> dict:
    """Build {"unet": ..., "text_encoder": ...} LoRA pytrees from a
    diffusers-format LoRA state dict."""
    norm = _normalize_keys(sd)
    alphas = {k[: -len(".alpha")]: float(v) for k, v in norm.items() if k.endswith(".alpha")}
    if rank is None:
        ranks = {v.shape[0] for k, v in norm.items() if k.endswith(".A")}
        if not ranks:
            raise ValueError("no LoRA tensors found in state dict")
        if len(ranks) > 1:
            raise ValueError(
                f"mixed LoRA ranks {sorted(ranks)} in checkpoint — the fixed-"
                "rank no-recompile pytree needs a single rank; pass rank= "
                "explicitly to pad to a common rank"
            )
        rank = ranks.pop()
    unet_lora, text_lora = _zeros_like_lora(unet_params, text_params, rank, dtype)

    unmatched = []
    for key, tensor in norm.items():
        path, ab = key.rsplit(".", 1)
        if ab == "alpha":
            continue  # consumed below via `alphas`
        leaf = "a" if ab == "A" else "b"
        if leaf == "b":
            # fold the peft/diffusers network_alpha scale (alpha/rank) into B
            # so runtime lora_dense (which assumes scale 1 ≡ alpha == rank)
            # reproduces the reference's effective weights
            alpha = alphas.get(path)
            if alpha is not None and alpha != tensor.shape[-1]:
                tensor = tensor * (alpha / tensor.shape[-1])
        if path.startswith("unet."):
            path = path[len("unet.") :]
        if path.startswith("text_encoder."):
            tpath = path[len("text_encoder.") :]
            m = re.match(
                r"(?:text_model\.)?encoder\.layers\.(\d+)\.self_attn\.(\w+_proj)$", tpath
            )
            if m and text_lora is not None:
                text_lora[f"layer_{int(m.group(1))}"][_PROJ_TEXT[m.group(2)]][leaf] = jnp.asarray(
                    tensor, dtype
                )
                continue
            unmatched.append(key)
            continue
        m = re.match(
            r"(down_blocks\.(\d+)|mid_block|up_blocks\.(\d+))\.attentions\.(\d+)\."
            r"transformer_blocks\.(\d+)\.(attn[12])\.(to_q|to_k|to_v|to_out\.0)$",
            path,
        )
        if not m:
            unmatched.append(key)
            continue
        where, down_i, up_i, attn_j, blk_k, attn_name, proj = m.groups()
        if where == "mid_block":
            tr = unet_lora["mid_block"]["attentions"][int(attn_j)]
        elif where.startswith("down_blocks"):
            tr = unet_lora["down_blocks"][int(down_i)]["attentions"][int(attn_j)]
        else:
            tr = unet_lora["up_blocks"][int(up_i)]["attentions"][int(attn_j)]
        tr["blocks"][int(blk_k)][attn_name][_PROJ[proj]][leaf] = jnp.asarray(tensor, dtype)

    if unmatched:
        raise ValueError(f"unrecognized LoRA keys: {unmatched[:5]} (+{len(unmatched) - 5 if len(unmatched) > 5 else 0})")
    return {"unet": unet_lora, "text_encoder": text_lora}


def lora_to_state_dict(lora: dict) -> Dict[str, np.ndarray]:
    """Serialize our LoRA pytrees to diffusers/peft-style keys."""
    sd = {}

    def emit_attn(prefix, attn):
        inv = {v: k for k, v in _PROJ.items()}
        for name, pair in attn.items():
            sd[f"{prefix}.{inv[name]}.lora_A.weight"] = np.asarray(pair["a"])
            sd[f"{prefix}.{inv[name]}.lora_B.weight"] = np.asarray(pair["b"])

    def emit_transformer(prefix, tr):
        for k, blk in enumerate(tr["blocks"]):
            emit_attn(f"{prefix}.transformer_blocks.{k}.attn1", blk["attn1"])
            emit_attn(f"{prefix}.transformer_blocks.{k}.attn2", blk["attn2"])

    unet_lora = lora.get("unet")
    if unet_lora is not None:
        for i, block in enumerate(unet_lora["down_blocks"]):
            if block["attentions"] is not None:
                for j, tr in enumerate(block["attentions"]):
                    emit_transformer(f"unet.down_blocks.{i}.attentions.{j}", tr)
        for j, tr in enumerate(unet_lora["mid_block"]["attentions"]):
            emit_transformer(f"unet.mid_block.attentions.{j}", tr)
        for i, block in enumerate(unet_lora["up_blocks"]):
            if block["attentions"] is not None:
                for j, tr in enumerate(block["attentions"]):
                    emit_transformer(f"unet.up_blocks.{i}.attentions.{j}", tr)

    text_lora = lora.get("text_encoder")
    if text_lora is not None:
        inv = {v: k for k, v in _PROJ_TEXT.items()}
        for lname, attn in text_lora.items():
            i = int(lname.split("_")[1])
            for name, pair in attn.items():
                p = f"text_encoder.text_model.encoder.layers.{i}.self_attn.{inv[name]}"
                sd[f"{p}.lora_A.weight"] = np.asarray(pair["a"])
                sd[f"{p}.lora_B.weight"] = np.asarray(pair["b"])
    return sd


def save_lora_safetensors(lora: dict, path: str):
    from safetensors.numpy import save_file

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    save_file(lora_to_state_dict(lora), path)


def load_lora_safetensors(path_or_dir: str, unet_params, text_params=None, dtype=jnp.float32) -> dict:
    """Load `pytorch_lora_weights.safetensors` (file or checkpoint dir)."""
    from safetensors import safe_open

    path = path_or_dir
    if os.path.isdir(path):
        path = os.path.join(path, "pytorch_lora_weights.safetensors")
    sd = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            sd[k] = f.get_tensor(k)
    return lora_from_state_dict(sd, unet_params, text_params, dtype=dtype)
