"""`cli analyze` — dataset-distribution + training-log analysis
(VERDICT r3 #5: the live parts of
`Evaluation/PyEER_analysis/analysis_scripts/` — `analyse_dataset.py`
gen/imp split, `plot_distributions.py` histogram, `plot_logs.py` curves).
"""

import json
import os

import numpy as np
import pytest

from faceposegenerator_tpu.evaluation.analysis import (
    load_embeddings_per_id,
    split_gen_imp_scores,
)


def _make_embeds(rng, n_ids=6, n_imgs=5, d=32):
    """Separable synthetic identities: per-id mean + small noise."""
    out = []
    for i in range(n_ids):
        mean = rng.standard_normal(d)
        out.append(mean + 0.1 * rng.standard_normal((n_imgs, d)))
    return out


def test_split_gen_imp_reference_sampling():
    """Pair counts follow `analyse_dataset.py:46-92`: all intra-id pairs
    genuine; impostor refs stride 8 from p+1 with min(4,n)x min(4,n)
    samples — and separable ids give genuine >> impostor scores."""
    rng = np.random.default_rng(0)
    per_id = _make_embeds(rng, n_ids=10, n_imgs=5)
    gen, imp = split_gen_imp_scores(per_id, np.random.default_rng(1))
    assert len(gen) == 10 * (5 * 4 // 2)
    # impostor refs per id: ids p+1, p+9, ... (stride 8) -> for 10 ids:
    # p=0 -> refs {1, 9}; p in 1..8 -> ref {p+1}; p=9 -> none. 10 ref pairs,
    # each 4x4 scores.
    assert len(imp) == 10 * 16
    assert gen.mean() > 0.9 > imp.mean() + 0.5


def test_load_embeddings_layouts(tmp_path):
    rng = np.random.default_rng(2)
    per_id = _make_embeds(rng, n_ids=3, n_imgs=4, d=8)

    d1 = tmp_path / "per_id_npy"; d1.mkdir()
    for i, e in enumerate(per_id):
        np.save(d1 / f"id{i}.npy", e)
    d2 = tmp_path / "subdirs"; d2.mkdir()
    for i, e in enumerate(per_id):
        sub = d2 / f"id{i}"; sub.mkdir()
        for j in range(e.shape[0]):
            np.save(sub / f"{j}.npy", e[j])
    d3 = tmp_path / "flat"; d3.mkdir()
    for i, e in enumerate(per_id):
        for j in range(e.shape[0]):
            np.save(d3 / f"id{i}_{j}.npy", e[j])

    for d in (d1, d2, d3):
        loaded = load_embeddings_per_id(str(d))
        assert len(loaded) == 3
        for a, b in zip(loaded, per_id):
            np.testing.assert_allclose(a, b.astype(a.dtype), rtol=1e-6)
    trunc = load_embeddings_per_id(str(d1), num_ids=2, num_imgs=3)
    assert len(trunc) == 2 and all(e.shape[0] == 3 for e in trunc)


def test_cli_analyze_embeds_and_logs(tmp_path):
    from faceposegenerator_tpu.cli import main

    rng = np.random.default_rng(3)
    emb_dir = tmp_path / "embeds"; emb_dir.mkdir()
    for i, e in enumerate(_make_embeds(rng, n_ids=4, n_imgs=6, d=16)):
        np.save(emb_dir / f"id{i}.npy", e)

    logs = tmp_path / "scalars.jsonl"
    with open(logs, "w") as f:
        for s in range(5):
            f.write(json.dumps({"step": s, "time": 0.0, "loss": 1.0 / (s + 1),
                                "lr": 1e-4}) + "\n")

    out = tmp_path / "out"
    rc = main([
        "analyze", "--embeds_dir", str(emb_dir), "--logs", str(logs),
        "--output", str(out), "--name", "toy",
    ])
    assert rc == 0
    stats = json.load(open(out / "toy_stats.json"))
    assert stats["n_identities"] == 4
    assert 0.0 <= stats["eer"] <= 1.0 and "fdr" in stats
    npz = np.load(out / "toy_scores.npz")
    assert len(npz["genuine"]) == stats["n_genuine"]
    assert os.path.exists(out / "toy_hist.png")  # matplotlib is available
    assert os.path.exists(out / "toy_loss.png")
    assert os.path.exists(out / "toy_lr.png")


def test_cli_analyze_requires_input():
    from faceposegenerator_tpu.cli import main

    with pytest.raises(SystemExit) as e:
        main(["analyze", "--output", "/tmp/x"])
    assert e.value.code == 2
