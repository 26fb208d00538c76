"""FR margin-head parity vs the reference torch implementations (oracle
import) and verification-protocol correctness on synthetic data."""

import io
import pickle
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceposegenerator_tpu.training import losses as jlosses
from faceposegenerator_tpu.evaluation import verification


def _torch_losses():
    sys.path.insert(0, "/root/reference/FR_training")
    from utils import losses as tlosses

    return tlosses


def test_arcface_parity():
    torch = pytest.importorskip("torch")
    tl = _torch_losses()
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((8, 64)).astype(np.float32)
    kernel = rng.standard_normal((64, 10)).astype(np.float32) * 0.01
    labels = rng.integers(0, 10, 8)

    head = tl.ArcFace(64, 10, s=64.0, m=0.5)
    head.kernel.data = torch.from_numpy(kernel.copy())
    with torch.no_grad():
        ref = head(torch.from_numpy(emb.copy()), torch.from_numpy(labels)).numpy()
    out = jlosses.arcface_logits(jnp.asarray(kernel), jnp.asarray(emb), jnp.asarray(labels))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3)


def test_cosface_parity():
    torch = pytest.importorskip("torch")
    tl = _torch_losses()
    rng = np.random.default_rng(1)
    emb = rng.standard_normal((8, 64)).astype(np.float32)
    kernel = rng.standard_normal((64, 10)).astype(np.float32) * 0.01
    labels = rng.integers(0, 10, 8)

    head = tl.CosFace(64, 10, s=64.0, m=0.35)
    head.kernel.data = torch.from_numpy(kernel.copy())
    with torch.no_grad():
        ref = head(torch.from_numpy(emb.copy()), torch.from_numpy(labels)).numpy()
    out = jlosses.cosface_logits(jnp.asarray(kernel), jnp.asarray(emb), jnp.asarray(labels))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_adaface_parity():
    torch = pytest.importorskip("torch")
    tl = _torch_losses()
    rng = np.random.default_rng(2)
    raw = rng.standard_normal((8, 64)).astype(np.float32) * 3
    norms = np.linalg.norm(raw, axis=1, keepdims=True)
    emb = raw / norms
    kernel = rng.standard_normal((64, 10)).astype(np.float32) * 0.01
    labels = rng.integers(0, 10, 8)

    head = tl.AdaFace(embedding_size=64, classnum=10)  # defaults m=0.4 h=0.333
    head.kernel.data = torch.from_numpy(kernel.copy())
    with torch.no_grad():
        ref = head(
            torch.from_numpy(emb.copy()),
            torch.from_numpy(norms.copy()),
            torch.from_numpy(labels),
        ).numpy()
    state = jlosses.adaface_init_state()
    out, new_state = jlosses.adaface_logits(
        jnp.asarray(kernel), jnp.asarray(emb), jnp.asarray(norms[:, 0]),
        jnp.asarray(labels), state,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3)
    # EMA state moved (t_alpha=1 → equals batch stats)
    np.testing.assert_allclose(
        float(new_state["batch_mean"]), float(norms.mean()), rtol=1e-5
    )


def test_elastic_cosface_runs():
    rng = np.random.default_rng(3)
    emb = jnp.asarray(rng.standard_normal((8, 64)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((64, 10)) * 0.01, jnp.float32)
    labels = jnp.asarray(rng.integers(0, 10, 8))
    out = jlosses.elastic_cosface_logits(kernel, emb, labels, jax.random.key(0))
    assert out.shape == (8, 10) and np.isfinite(np.asarray(out)).all()
    out_plus = jlosses.elastic_cosface_logits(
        kernel, emb, labels, jax.random.key(0), plus=True
    )
    assert np.isfinite(np.asarray(out_plus)).all()


def test_elastic_cosface_plus_reference_scatter_semantics():
    """ElasticCosFace plus=True must replicate the reference scatter
    (`FR_training/utils/losses.py:113-118`): sample j receives
    sorted_margin[idicate_cosie[j]] where idicate_cosie = argsort of target
    cosines descending — NOT the inverse (monotone rank) mapping."""
    rng = np.random.default_rng(7)
    emb = jnp.asarray(rng.standard_normal((8, 64)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((64, 10)) * 0.01, jnp.float32)
    labels_np = rng.integers(0, 10, 8)
    labels = jnp.asarray(labels_np)
    key = jax.random.key(11)
    s, m, std = 64.0, 0.35, 0.0125

    got = np.asarray(
        jlosses.elastic_cosface_logits(kernel, emb, labels, key, s=s, m=m, std=std, plus=True)
    )

    # numpy oracle with the SAME jax margin draw, applying the reference
    # indexing literally
    margin = np.asarray(m + std * jax.random.normal(key, labels.shape))
    embn = np.asarray(emb) / np.linalg.norm(np.asarray(emb), axis=1, keepdims=True)
    kn = np.asarray(kernel) / np.linalg.norm(np.asarray(kernel), axis=0, keepdims=True)
    cos = np.clip(embn @ kn, -1 + 1e-7, 1 - 1e-7)
    target = cos[np.arange(8), labels_np]
    idicate_cosie = np.argsort(-target)
    margin_applied = np.sort(margin)[idicate_cosie]
    expected = cos.copy()
    expected[np.arange(8), labels_np] -= margin_applied
    expected *= s
    np.testing.assert_allclose(got, expected, atol=2e-4)

    # the permutation matters: inverse mapping would differ for this seed
    inv = np.zeros(8)
    inv[idicate_cosie] = np.sort(margin)
    assert not np.allclose(inv, margin_applied)


def _synthetic_pairs(n_pairs=120, d=32, noise=0.05, seed=0):
    """Interleaved pair embeddings: same-pairs share a direction."""
    rng = np.random.default_rng(seed)
    issame = rng.random(n_pairs) < 0.5
    embs = np.zeros((2 * n_pairs, d), np.float32)
    for i in range(n_pairs):
        a = rng.standard_normal(d)
        b = a + noise * rng.standard_normal(d) if issame[i] else rng.standard_normal(d)
        embs[2 * i] = a / np.linalg.norm(a)
        embs[2 * i + 1] = b / np.linalg.norm(b)
    return embs, issame


def test_verification_separable_gets_high_accuracy():
    embs, issame = _synthetic_pairs(noise=0.01)
    _, _, acc, val, _, far = verification.evaluate(embs, issame)
    assert acc.mean() > 0.95
    assert val > 0.9


def test_verification_random_is_chance():
    rng = np.random.default_rng(1)
    embs = rng.standard_normal((240, 32)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    issame = rng.random(120) < 0.5
    _, _, acc, *_ = verification.evaluate(embs, issame)
    assert 0.3 < acc.mean() < 0.7


def test_load_bin_and_full_protocol(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(2)
    n_pairs = 12
    bins, issame = [], []
    for i in range(n_pairs):
        same = i % 2 == 0
        base = rng.integers(0, 255, (112, 112, 3), np.uint8)
        img2 = base.copy() if same else rng.integers(0, 255, (112, 112, 3), np.uint8)
        for arr in (base, img2):
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            bins.append(buf.getvalue())
        issame.append(same)
    path = str(tmp_path / "toy.bin")
    with open(path, "wb") as f:
        pickle.dump((bins, issame), f)

    imgs, same = verification.load_bin(path)
    assert imgs.shape == (24, 112, 112, 3) and same.sum() == 6

    # mean-pixel "embedding": identical images embed identically
    def embed_fn(x):
        return x.reshape(x.shape[0], -1, 3).mean(axis=1)

    acc, acc_std, xnorm, *_ = verification.test((imgs, same), embed_fn, batch_size=8, n_folds=3)
    assert 0.0 <= acc <= 1.0 and xnorm > 0
