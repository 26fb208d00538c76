"""ToMe token merging (ops/tome.py) — opt-in sampler approximation.

Oracles: merge/unmerge are re-computed with an O(N·r) pure-numpy loop that
reads the SAME ToMeMatch indices, so the batched scatter/gather semantics
are verified independently. Losslessness: when every token is identical,
merging is exact — the tome path must reproduce full attention bit-close.
The reference has no counterpart (full 4096-token self-attention 60×/image,
`inference_ID-Booth.py:138`); `tome_ratio=0.0` is the exact parity path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceposegenerator_tpu.ops import tome


def _np_merge(x, m):
    B = x.shape[0]
    out = []
    for bi in range(B):
        xs = np.asarray(x[bi])[np.asarray(m.src_idx)]
        xd = np.asarray(x[bi])[np.asarray(m.dst_idx)].astype(np.float64).copy()
        cnt = np.ones(len(m.dst_idx))
        for pos, d in zip(np.asarray(m.merged[bi]), np.asarray(m.match[bi])):
            xd[d] += xs[pos]
            cnt[d] += 1
        out.append(np.concatenate(
            [xs[np.asarray(m.unmerged[bi])], xd / cnt[:, None]], axis=0))
    return np.stack(out)


def _np_unmerge(y, m):
    B = y.shape[0]
    n_keep = len(m.src_idx) - m.r
    out = np.zeros((B, m.n_tokens, y.shape[-1]), dtype=np.asarray(y).dtype)
    for bi in range(B):
        yb = np.asarray(y[bi])
        out[bi, np.asarray(m.dst_idx)] = yb[n_keep:]
        out[bi, np.asarray(m.src_idx)[np.asarray(m.unmerged[bi])]] = yb[:n_keep]
        out[bi, np.asarray(m.src_idx)[np.asarray(m.merged[bi])]] = (
            yb[n_keep + np.asarray(m.match[bi])])
    return out


def test_merge_unmerge_numpy_oracle():
    h = w = 8
    x = jax.random.normal(jax.random.key(0), (2, h * w, 6))
    m = tome.build_match(x, h, w, r=12)
    merged = tome.merge(x, m)
    assert merged.shape == (2, h * w - 12, 6)
    np.testing.assert_allclose(np.asarray(merged), _np_merge(x, m),
                               rtol=1e-5, atol=1e-5)
    y = jax.random.normal(jax.random.key(1), (2, h * w - 12, 6))
    restored = tome.unmerge(y, m)
    assert restored.shape == (2, h * w, 6)
    np.testing.assert_allclose(np.asarray(restored), _np_unmerge(y, m),
                               rtol=1e-6, atol=1e-6)


def test_identical_tokens_lossless():
    """All-identical tokens: each merge group's mean is the token itself and
    copy-back restores it — unmerge(merge(x)) == x exactly."""
    tok = jnp.asarray([[0.3, -1.2, 2.0, 0.7]])
    x = jnp.broadcast_to(tok, (3, 16, 4)).astype(jnp.float32)
    m = tome.build_match(x, 4, 4, r=8)
    np.testing.assert_allclose(
        np.asarray(tome.unmerge(tome.merge(x, m), m)), np.asarray(x),
        rtol=1e-6, atol=1e-6)


def test_merge_count():
    assert tome.merge_count(4096, 0.5) == 2048          # lane multiple 256
    assert tome.merge_count(4096, 0.75) == 3072         # capped at Ns
    assert tome.merge_count(4096, 0.9) == 3072
    assert tome.merge_count(64, 0.5) == 32              # tiny: multiple of 8
    assert tome.merge_count(64, 0.0) == 0
    n = 4096
    r = tome.merge_count(n, 0.37)
    assert (n - r) % 256 == 0 or r == 0


def test_unet_tome_approximates_exact():
    """tome_ratio on unet2d.apply: deterministic, different from exact but
    same ballpark; ratio 0.0 is bitwise the exact program."""
    from faceposegenerator_tpu.models import unet2d

    cfg = unet2d.UNetConfig(
        block_out_channels=(32, 64, 64, 64), cross_attention_dim=48, head_dim=8
    )
    params = unet2d.init(jax.random.key(0), cfg)
    z = jax.random.normal(jax.random.key(2), (2, 16, 16, 4))
    ctx = jax.random.normal(jax.random.key(3), (2, 77, 48))
    t = jnp.asarray([7, 7])

    exact = unet2d.apply(params, z, t, ctx, cfg)
    zero = unet2d.apply(params, z, t, ctx, cfg, tome_ratio=0.0, tome_min_tokens=16)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(zero))

    tm = unet2d.apply(params, z, t, ctx, cfg, tome_ratio=0.5, tome_min_tokens=16)
    tm2 = unet2d.apply(params, z, t, ctx, cfg, tome_ratio=0.5, tome_min_tokens=16)
    np.testing.assert_array_equal(np.asarray(tm), np.asarray(tm2))
    assert np.isfinite(np.asarray(tm)).all()
    d = np.abs(np.asarray(tm) - np.asarray(exact))
    assert d.max() > 1e-6          # merging actually engaged
    rel = d.mean() / (np.abs(np.asarray(exact)).mean() + 1e-9)
    assert rel < 0.5               # ...but output stays in the same regime


def test_tome_ops_extended():
    """tome_ops="attn+xattn+mlp" (tomesd's merge_crossattn/merge_mlp flags):
    each added op changes the output further; all stay finite/deterministic;
    default "attn" is unchanged by the knob's existence."""
    from faceposegenerator_tpu.models import unet2d

    cfg = unet2d.UNetConfig(
        block_out_channels=(32, 64, 64, 64), cross_attention_dim=48, head_dim=8
    )
    params = unet2d.init(jax.random.key(0), cfg)
    z = jax.random.normal(jax.random.key(2), (2, 16, 16, 4))
    ctx = jax.random.normal(jax.random.key(3), (2, 77, 48))
    t = jnp.asarray([7, 7])
    kw = dict(tome_ratio=0.5, tome_min_tokens=16)

    attn_only = unet2d.apply(params, z, t, ctx, cfg, tome_ops="attn", **kw)
    full = unet2d.apply(params, z, t, ctx, cfg, tome_ops="attn+xattn+mlp", **kw)
    full2 = unet2d.apply(params, z, t, ctx, cfg, tome_ops="attn+xattn+mlp", **kw)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(full2))
    assert np.isfinite(np.asarray(full)).all()
    assert np.abs(np.asarray(full) - np.asarray(attn_only)).max() > 1e-6
    exact = unet2d.apply(params, z, t, ctx, cfg)
    rel = (np.abs(np.asarray(full) - np.asarray(exact)).mean()
           / (np.abs(np.asarray(exact)).mean() + 1e-9))
    assert rel < 0.5


def test_sampler_tome_integration():
    from faceposegenerator_tpu.diffusion import make_ddpm
    from faceposegenerator_tpu.diffusion.sampler import SamplerModels, sample
    from faceposegenerator_tpu.models import clip_text, unet2d, vae

    cfg = unet2d.UNetConfig(
        block_out_channels=(32, 64, 64, 64), cross_attention_dim=48, head_dim=8
    )
    tiny = SamplerModels(
        text_cfg=clip_text.CLIPTextConfig(
            vocab_size=512, hidden_size=48, num_layers=2, num_heads=4,
            intermediate_size=96),
        unet_cfg=cfg,
        vae_cfg=vae.VAEConfig(block_out_channels=(32, 32, 32, 32)),
    )
    params = {
        "text_encoder": clip_text.init(jax.random.key(4), tiny.text_cfg),
        "unet": unet2d.init(jax.random.key(0), cfg),
        "vae": vae.init(jax.random.key(5), tiny.vae_cfg),
    }
    sched = make_ddpm(num_inference_steps=4)
    ids = jax.random.randint(jax.random.key(6), (2, 77), 0, 512)
    neg = jnp.zeros_like(ids)
    kw = dict(models=tiny, height=64, width=64)

    exact = sample(params, sched, ids, neg, jax.random.key(0), **kw)
    tm = sample(params, sched, ids, neg, jax.random.key(0),
                tome_ratio=0.5, tome_min_tokens=16, **kw)
    tm2 = sample(params, sched, ids, neg, jax.random.key(0),
                 tome_ratio=0.5, tome_min_tokens=16, **kw)
    np.testing.assert_array_equal(np.asarray(tm), np.asarray(tm2))
    assert np.isfinite(np.asarray(tm)).all()
    assert np.abs(np.asarray(tm) - np.asarray(exact)).max() > 1e-6
    assert np.abs(np.asarray(tm) - np.asarray(exact)).mean() < 0.2

    # composes with DeepCache in one program
    both = sample(params, sched, ids, neg, jax.random.key(0),
                  tome_ratio=0.5, tome_min_tokens=16,
                  deepcache_interval=2, **kw)
    assert np.isfinite(np.asarray(both)).all()
