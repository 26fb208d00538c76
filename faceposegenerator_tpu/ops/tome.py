"""ToMe token merging for the UNet's level-0 self-attention (opt-in).

Token Merging for Stable Diffusion (Bolya & Hoffman, arXiv:2303.17604):
before self-attention, merge the `r` most-redundant tokens into their most
similar neighbours; run attention on the reduced set; copy each merged
token's output back from the token it merged into. The reference has no
counterpart (it runs the full 4096-token self-attention 60×/image,
`inference_ID-Booth.py:138`); like DeepCache this is an OPT-IN
approximation — `tome_ratio=0.0` (default) is the exact reference-parity
path.

TPU-first formulation — everything is static-shaped so the whole sampler
stays one compiled program:
- dst lattice: one token per 2×2 spatial cell, FIXED top-left position
  (upstream tomesd randomizes the cell position per batch; a fixed lattice
  keeps the program deterministic and the indices compile-time constants).
- similarity: one (Ns, C)×(C, Nd) cosine-similarity matmul (MXU), fp32
  accumulation.
- selection: `argsort` of the per-src best-match score; the merge count
  `r` is a PYTHON int derived from `tome_ratio` and rounded down to a
  multiple of 256 so the reduced sequence stays lane/MXU friendly
  (4096 tokens @ ratio 0.5 → exactly 2048 survivors).
- merge: batched scatter-add + count normalization (mean of each merge
  group, tomesd's default reduction).
- unmerge: an int32 position map (three small (B, N) index scatters) then
  ONE gather of the full-width activations — cheaper in HBM traffic than
  scattering (B, N, C) values three times.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


def merge_count(n_tokens: int, ratio: float, sx: int = 2, sy: int = 2,
                lane_multiple: int | None = None) -> int:
    """Static merge count: min(ratio·N, Ns) rounded down to `lane_multiple`
    (keeps the post-merge sequence length a lane-aligned static shape;
    defaults to 256 at production token counts, 8 for tiny test models)."""
    if lane_multiple is None:
        lane_multiple = 256 if n_tokens >= 2048 else 8
    n_dst = -(-n_tokens // (sx * sy))  # ceil for non-divisible grids
    n_src = n_tokens - n_dst
    r = min(int(n_tokens * ratio), n_src)
    return max(r - r % lane_multiple, 0)


@functools.lru_cache(maxsize=None)
def _lattice(h: int, w: int, sx: int, sy: int):
    """Static (dst_idx, src_idx) token-index split: dst = the top-left token
    of every sy×sx cell, src = the rest. Returns numpy constants."""
    ids = np.arange(h * w, dtype=np.int32).reshape(h, w)
    dst_mask = np.zeros((h, w), dtype=bool)
    dst_mask[::sy, ::sx] = True
    return ids[dst_mask], ids[~dst_mask]


@dataclasses.dataclass(frozen=True)
class ToMeMatch:
    """Index bundle tying merge() and unmerge() to one matching decision."""

    dst_idx: np.ndarray      # (Nd,) static token ids of the dst lattice
    src_idx: np.ndarray      # (Ns,) static token ids of the src set
    merged: jax.Array        # (B, r) positions into src set, most redundant
    unmerged: jax.Array      # (B, Ns-r) surviving src positions
    match: jax.Array         # (B, r) dst-set position each merged src joins
    n_tokens: int
    r: int


def build_match(metric: jax.Array, h: int, w: int, r: int,
                sx: int = 2, sy: int = 2) -> ToMeMatch:
    """Bipartite soft matching. `metric`: (B, N, C) tokens (N = h·w); the
    caller passes the transformer block's input hidden states (tomesd's
    choice of metric)."""
    B, N, C = metric.shape
    assert N == h * w, (N, h, w)
    dst_idx, src_idx = _lattice(h, w, sx, sy)
    a = metric[:, src_idx]                      # (B, Ns, C)
    b = metric[:, dst_idx]                      # (B, Nd, C)
    a = a * jax.lax.rsqrt(jnp.sum(jnp.square(a), -1, keepdims=True) + 1e-6)
    b = b * jax.lax.rsqrt(jnp.sum(jnp.square(b), -1, keepdims=True) + 1e-6)
    scores = jnp.einsum(
        "bsc,bdc->bsd", a, b, preferred_element_type=jnp.float32
    )                                           # (B, Ns, Nd)
    node_max = jnp.max(scores, axis=-1)
    node_idx = jnp.argmax(scores, axis=-1).astype(jnp.int32)
    order = jnp.argsort(-node_max, axis=-1).astype(jnp.int32)  # redundant first
    merged, unmerged = order[:, :r], order[:, r:]
    match = jnp.take_along_axis(node_idx, merged, axis=1)
    return ToMeMatch(dst_idx=dst_idx, src_idx=src_idx, merged=merged,
                     unmerged=unmerged, match=match, n_tokens=N, r=r)


def merge(x: jax.Array, m: ToMeMatch) -> jax.Array:
    """(B, N, C) → (B, N-r, C): [surviving src tokens; dst tokens with their
    merge groups averaged in]."""
    B = x.shape[0]
    bidx = jnp.arange(B)[:, None]
    xsrc = x[:, m.src_idx]
    xdst = x[:, m.dst_idx]
    un = jnp.take_along_axis(xsrc, m.unmerged[..., None], axis=1)
    mg = jnp.take_along_axis(xsrc, m.merged[..., None], axis=1)
    acc = xdst.astype(jnp.float32).at[bidx, m.match].add(mg.astype(jnp.float32))
    cnt = jnp.ones((B, m.dst_idx.shape[0]), jnp.float32).at[bidx, m.match].add(1.0)
    return jnp.concatenate([un, (acc / cnt[..., None]).astype(x.dtype)], axis=1)


def unmerge(y: jax.Array, m: ToMeMatch) -> jax.Array:
    """(B, N-r, C) → (B, N, C): surviving tokens return to their positions;
    each merged token receives its dst group's output (ToMe's copy-back)."""
    B = y.shape[0]
    n_keep = m.src_idx.shape[0] - m.r           # survivors come first
    bidx = jnp.arange(B)[:, None]
    # position map: for every original token, its row in y
    inv = jnp.zeros((B, m.n_tokens), jnp.int32)
    inv = inv.at[:, m.dst_idx].set(n_keep + jnp.arange(m.dst_idx.shape[0], dtype=jnp.int32))
    src_ids = jnp.asarray(m.src_idx)
    inv = inv.at[bidx, jnp.take(src_ids, m.unmerged)].set(
        jnp.broadcast_to(jnp.arange(n_keep, dtype=jnp.int32), m.unmerged.shape)
    )
    inv = inv.at[bidx, jnp.take(src_ids, m.merged)].set(n_keep + m.match)
    return jnp.take_along_axis(y, inv[..., None], axis=1)
