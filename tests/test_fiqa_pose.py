"""CR-FIQA and pose-estimation tests (rotation math has exact oracles)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceposegenerator_tpu.core.precision import PARITY_POLICY
from faceposegenerator_tpu.evaluation import fiqa, pose
from faceposegenerator_tpu.models import iresnet, repvgg


def test_fiqa_quality_fn(tmp_path):
    cfg = iresnet.config_for("r18", num_features=64)
    params, state = iresnet.init(jax.random.key(0), cfg)
    qs = fiqa.init_qs_head(jax.random.key(1))
    fn = fiqa.make_quality_fn(params, state, qs, cfg, policy=PARITY_POLICY)
    x = np.random.default_rng(0).uniform(-1, 1, (4, 112, 112, 3)).astype(np.float32)
    emb, q = fn(x)
    assert emb.shape == (4, 64) and q.shape == (4,)
    assert np.isfinite(np.asarray(q)).all()

    # quality head consumes the same features as the embedding fc: embedding
    # path must match the plain iresnet apply
    emb_ref, _ = iresnet.apply(params, state, jnp.asarray(x), cfg, policy=PARITY_POLICY)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(emb_ref), atol=1e-3)


def test_fiqa_score_dataset(tmp_path):
    from PIL import Image

    d = tmp_path / "imgs" / "1"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(5):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(d / f"{i}.jpg")

    def qfn(x):
        return x.mean(axis=(1, 2, 3)), x.std(axis=(1, 2, 3))

    out = str(tmp_path / "scores.txt")
    scores = fiqa.score_dataset(str(tmp_path / "imgs"), qfn, out, batch_size=2)
    assert len(scores) == 5
    lines = open(out).read().strip().split("\n")
    assert len(lines) == 5 and all(len(l.split()) >= 2 for l in lines)


def test_rotation_from_ortho6d_is_rotation():
    rng = np.random.default_rng(0)
    sixd = jnp.asarray(rng.standard_normal((8, 6)), jnp.float32)
    r = pose.rotation_from_ortho6d(sixd)
    r = np.asarray(r)
    for m in r:
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(m) == pytest.approx(1.0, abs=1e-5)


def test_rotation_from_ortho6d_reference_convention():
    """Fixed-vector oracle against 6DRepNet's torch convention:
    x = norm(a1); z = norm(x × a2); y = z × x; R = cat((x, y, z), dim=2)
    — the basis vectors are COLUMNS of R. A transposed implementation
    produces wrong pitch/yaw/roll for any bridged real checkpoint."""
    sixd = np.array(
        [
            [1.0, 0.0, 0.0, 0.0, 1.0, 0.0],  # identity basis
            [2.0, 1.0, 0.0, -0.5, 2.0, 1.0],
            [0.3, -1.2, 0.7, 1.1, 0.4, -0.9],
        ],
        np.float32,
    )

    def torch_convention(p):
        x = p[:3] / np.linalg.norm(p[:3])
        z = np.cross(x, p[3:])
        z = z / np.linalg.norm(z)
        y = np.cross(z, x)
        return np.stack([x, y, z], axis=1)  # columns

    expected = np.stack([torch_convention(p) for p in sixd])
    got = np.asarray(pose.rotation_from_ortho6d(jnp.asarray(sixd)))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_euler_roundtrip():
    """Construct R from known Euler angles, recover them."""

    def rot(pitch, yaw, roll):
        p, y, r = np.deg2rad([pitch, yaw, roll])
        rx = np.array([[1, 0, 0], [0, np.cos(p), -np.sin(p)], [0, np.sin(p), np.cos(p)]])
        ry = np.array([[np.cos(y), 0, np.sin(y)], [0, 1, 0], [-np.sin(y), 0, np.cos(y)]])
        rz = np.array([[np.cos(r), -np.sin(r), 0], [np.sin(r), np.cos(r), 0], [0, 0, 1]])
        return rz @ ry @ rx

    angles = [(10.0, -20.0, 30.0), (0.0, 0.0, 0.0), (-45.0, 60.0, -15.0)]
    rs = jnp.asarray(np.stack([rot(*a) for a in angles]), jnp.float32)
    out = np.asarray(pose.euler_from_rotation(rs))
    np.testing.assert_allclose(out, np.asarray(angles), atol=1e-3)


def test_repvgg_shapes_and_pose_fn():
    cfg = repvgg.RepVGGConfig(num_blocks=(1, 1, 1, 1), width_multiplier=(0.25, 0.25, 0.25, 0.5))
    params = pose.init_sixdrepnet(jax.random.key(0), cfg)
    fn = pose.make_pose_fn(params, cfg)
    out = fn(np.zeros((2, 64, 64, 3), np.float32))
    assert out.shape == (2, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_repvgg_fuse_branches_matches_sum():
    """Fused 3x3 conv == conv3x3+BN + conv1x1+BN + idBN applied separately."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    cin = cout = 4
    w3 = rng.standard_normal((cout, cin, 3, 3)).astype(np.float32)
    w1 = rng.standard_normal((cout, cin, 1, 1)).astype(np.float32)

    def bn_params():
        return {
            "g": rng.uniform(0.5, 1.5, cout).astype(np.float32),
            "b": rng.standard_normal(cout).astype(np.float32),
            "mean": rng.standard_normal(cout).astype(np.float32),
            "var": rng.uniform(0.5, 2.0, cout).astype(np.float32),
        }

    bn3, bn1, bnid = bn_params(), bn_params(), bn_params()
    wf, bf = repvgg.fuse_branches(w3, bn3, w1, bn1, bnid)

    x = torch.from_numpy(rng.standard_normal((1, cin, 8, 8)).astype(np.float32))

    def branch(w, bn, pad):
        y = torch.nn.functional.conv2d(x, torch.from_numpy(w), padding=pad)
        std = np.sqrt(bn["var"] + 1e-5)
        g = torch.from_numpy(bn["g"] / std)
        b = torch.from_numpy(bn["b"] - bn["mean"] * bn["g"] / std)
        return y * g[None, :, None, None] + b[None, :, None, None]

    ref = branch(w3, bn3, 1) + branch(w1, bn1, 0)
    wid = np.zeros((cout, cin, 1, 1), np.float32)
    for i in range(cout):
        wid[i, i, 0, 0] = 1.0
    ref = ref + branch(wid, bnid, 0)

    got = torch.nn.functional.conv2d(x, torch.from_numpy(wf), torch.from_numpy(bf), padding=1)
    np.testing.assert_allclose(got.numpy(), ref.numpy(), atol=1e-4)


def test_pose_dataset_aggregation(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for ident in ["1", "2"]:
        d = tmp_path / "gen" / ident
        d.mkdir(parents=True)
        for i in range(3):
            Image.fromarray(rng.integers(0, 255, (32, 32, 3), np.uint8)).save(d / f"{i}.png")

    def pose_fn(x):
        return np.tile(np.array([[10.0, 20.0, 30.0]], np.float32), (x.shape[0], 1))

    out = pose.estimate_dataset_poses(
        str(tmp_path / "gen"), pose_fn, str(tmp_path / "poses.json"), batch_size=4
    )
    assert out["global"]["count"] == 6
    np.testing.assert_allclose(out["global"]["mean"], [10, 20, 30], atol=1e-5)
    assert set(out["per_id"]) == {"1", "2"}
    np.testing.assert_allclose(out["pose_diversity"], [0, 0, 0], atol=1e-5)
    assert os.path.exists(tmp_path / "poses.json")


def test_fiqa_u8_path_matches_host_path_at_112():
    """At 112² (no resize), the device-preprocessing u8 quality fn must match
    the host-normalized fn — the in-memory sweep path's correctness anchor."""
    cfg = iresnet.config_for("r18", num_features=64)
    params, state = iresnet.init(jax.random.key(0), cfg)
    qs = fiqa.init_qs_head(jax.random.key(1))
    fn = fiqa.make_quality_fn(params, state, qs, cfg, policy=PARITY_POLICY)
    fn_u8 = fiqa.make_quality_fn_u8(params, state, qs, cfg, policy=PARITY_POLICY)

    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (4, 112, 112, 3), np.uint8)
    host = (u8.astype(np.float32) / 255.0 - 0.5) / 0.5
    emb_a, q_a = fn(host)
    emb_b, q_b = fn_u8(u8)
    np.testing.assert_allclose(np.asarray(q_a), np.asarray(q_b), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(emb_a), np.asarray(emb_b), rtol=1e-3, atol=1e-3)


def test_fiqa_score_images_matches_score_dataset_at_112(tmp_path):
    """score_images on in-memory arrays == score_dataset on the same images
    written as (lossless) PNGs, when no resize is involved."""
    from PIL import Image

    cfg = iresnet.config_for("r18", num_features=64)
    params, state = iresnet.init(jax.random.key(0), cfg)
    qs = fiqa.init_qs_head(jax.random.key(1))
    fn = fiqa.make_quality_fn(params, state, qs, cfg, policy=PARITY_POLICY)
    fn_u8 = fiqa.make_quality_fn_u8(params, state, qs, cfg, policy=PARITY_POLICY)

    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 256, (5, 112, 112, 3), np.uint8)
    d = tmp_path / "imgs"
    d.mkdir()
    names = []
    for i in range(5):
        p = d / f"{i}.png"
        Image.fromarray(u8[i]).save(p)
        names.append(str(p))

    mem = fiqa.score_images(u8, names, fn_u8, str(tmp_path / "mem.txt"), batch_size=2)
    disk = fiqa.score_dataset(str(d), fn, str(tmp_path / "disk.txt"), batch_size=2)
    assert set(mem) == set(disk)
    for k in mem:
        assert mem[k] == pytest.approx(disk[k], rel=1e-3, abs=1e-3)
    assert len(open(tmp_path / "mem.txt").read().strip().split("\n")) == 5


def test_pose_u8_wrapper_matches_manual_device_preprocess():
    """make_pose_fn_u8 == (edge-pad → device bilinear resize → imagenet
    norm) fed to make_pose_fn — validates the fused device preprocessing."""
    from faceposegenerator_tpu.ops.image import resize_bilinear

    cfg = repvgg.RepVGGConfig(num_blocks=(1, 1, 1, 1), width_multiplier=(0.25, 0.25, 0.25, 0.5))
    params = pose.init_sixdrepnet(jax.random.key(0), cfg)
    fn = pose.make_pose_fn(params, cfg)
    fn_u8 = pose.make_pose_fn_u8(params, cfg, pad=30, size=96)

    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 256, (3, 64, 64, 3), np.uint8)
    x = np.pad(u8.astype(np.float32), ((0, 0), (30, 30), (30, 30), (0, 0)), mode="edge")
    x = np.asarray(resize_bilinear(jnp.asarray(x), (96, 96)))
    x = (x / 255.0 - pose.IMAGENET_MEAN) / pose.IMAGENET_STD
    np.testing.assert_allclose(
        np.asarray(fn_u8(u8)), np.asarray(fn(x)), atol=1e-3
    )


def test_poses_for_images_and_aggregate(tmp_path):
    """Streaming path: poses_for_images + aggregate_poses gives the same
    JSON shape/stats as the file-walking estimate_dataset_poses."""

    def pose_fn(x):
        return np.tile(np.array([[10.0, 20.0, 30.0]], np.float32), (x.shape[0], 1))

    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (6, 32, 32, 3), np.uint8)
    idents = ["1", "1", "1", "2", "2", "2"]
    per_id = pose.poses_for_images(u8, idents, pose_fn, batch_size=4)
    out = pose.aggregate_poses(per_id, str(tmp_path / "poses.json"))
    assert out["global"]["count"] == 6
    np.testing.assert_allclose(out["global"]["mean"], [10, 20, 30], atol=1e-5)
    assert set(out["per_id"]) == {"1", "2"}
    np.testing.assert_allclose(out["pose_diversity"], [0, 0, 0], atol=1e-5)
    assert os.path.exists(tmp_path / "poses.json")
