"""L7 tool CLIs, driven end-to-end (reference: src/tools/*)."""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(mod, *args):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, "-m", mod, *args],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=300,
    )


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    from tossctr_tpu.data.synth import write_synth_train_test

    root = str(tmp_path_factory.mktemp("tools"))
    paths = write_synth_train_test(root, n_train=4000, n_test=500, seed=21)
    return root, paths


def test_blend_submissions(tmp_path, synth):
    rng = np.random.default_rng(0)
    ids = [f"T_{i:05d}" for i in range(200)]
    a = pd.DataFrame({"ID": ids, "clicked": rng.random(200)})
    b = pd.DataFrame({"ID": ids[::-1], "clicked": rng.random(200)})
    pa = str(tmp_path / "a.csv")
    pb = str(tmp_path / "b.csv")
    po = str(tmp_path / "out.csv")
    a.to_csv(pa, index=False)
    b.to_csv(pb, index=False)
    r = _run(
        "tossctr_tpu.tools.blend_submissions",
        "--a", pa, "--b", pb, "--out", po, "--method", "logit_mean", "--w", "0.6",
    )
    assert r.returncode == 0, r.stderr
    assert "corr=" in r.stdout
    out = pd.read_csv(po, dtype={"ID": str})
    assert len(out) == 200
    m = a.merge(b, on="ID", suffixes=("_a", "_b")).merge(out, on="ID")
    za = np.log(m.clicked_a / (1 - m.clicked_a))
    zb = np.log(m.clicked_b / (1 - m.clicked_b))
    want = 1 / (1 + np.exp(-(0.6 * za + 0.4 * zb)))
    assert np.allclose(m.clicked, want, atol=1e-6)


def test_blend_rejects_id_mismatch(tmp_path):
    a = pd.DataFrame({"ID": ["x", "y"], "clicked": [0.1, 0.2]})
    b = pd.DataFrame({"ID": ["x", "z"], "clicked": [0.3, 0.4]})
    pa, pb = str(tmp_path / "a.csv"), str(tmp_path / "b.csv")
    a.to_csv(pa, index=False)
    b.to_csv(pb, index=False)
    r = _run(
        "tossctr_tpu.tools.blend_submissions",
        "--a", pa, "--b", pb, "--out", str(tmp_path / "o.csv"),
    )
    assert r.returncode != 0
    assert "ID mismatch" in r.stderr


def test_guess_numeric_types(tmp_path, synth):
    root, paths = synth
    out_dir = str(tmp_path / "outputs")
    r = _run(
        "tossctr_tpu.tools.guess_numeric_types",
        "--parquet", paths["train"], "--out-dir", out_dir,
    )
    assert r.returncode == 0, r.stderr
    rep = pd.read_csv(os.path.join(out_dir, "column_type_report.csv"))
    kinds = dict(zip(rep.column, rep.kind))
    assert kinds["feat_a_1"] == "continuous"
    assert kinds["gender"] == "string_categorical"
    assert kinds["inventory_id"] == "int_like_categorical"
    import yaml

    sug = yaml.safe_load(open(os.path.join(out_dir, "column_suggestions.yaml")))
    assert "inventory_id" in sug["cat_cols"]
    assert "feat_a_1" in sug["num_cols"]
    assert sug["hash_buckets"]["inventory_id"] >= rep.set_index("column").loc["inventory_id", "n_unique"]


def test_check_hash_collisions(synth):
    root, paths = synth
    r = _run(
        "tossctr_tpu.tools.check_hash_collisions",
        "--parquet", paths["train"], "--column", "inventory_id",
        "--candidates", "101", "100003", "--target", "0.01",
    )
    assert r.returncode == 0, r.stderr
    assert "n_unique=" in r.stdout and "recommended m" in r.stdout
    # tiny bucket must show high collisions, huge bucket near zero
    lines = [ln for ln in r.stdout.splitlines() if "m=" in ln]
    c_small = float(lines[0].split("collision=")[1].split()[0])
    c_big = float(lines[1].split("collision=")[1].split()[0])
    assert c_small > 0.3 and c_big < 0.01


def test_run_calibration_cli(tmp_path, synth):
    """Precomputed-OOF path of run_calibration."""
    rng = np.random.default_rng(3)
    n = 20000
    z_true = rng.normal(0, 1.5, n)
    y = (rng.random(n) < 1 / (1 + np.exp(-z_true))).astype(np.int32)
    z = z_true * 3.0
    np.save(tmp_path / "oof_z.npy", z)
    np.save(tmp_path / "oof_y.npy", y)
    import yaml

    cfgp = str(tmp_path / "cfg.yaml")
    yaml.safe_dump(
        {
            "exp_name": "caltest",
            "logging": {"log_dir": str(tmp_path / "runs"), "tb": False},
            "calibration": {"enabled": True, "method": "temperature"},
        },
        open(cfgp, "w"),
    )
    out_dir = str(tmp_path / "cal_out")
    r = _run(
        "tossctr_tpu.tools.run_calibration",
        "--cfg", cfgp, "--oof-z", str(tmp_path / "oof_z.npy"),
        "--oof-y", str(tmp_path / "oof_y.npy"), "--out-dir", out_dir,
        "--save-pickle", "--cpu",
    )
    assert r.returncode == 0, r.stderr
    meta = json.load(open(os.path.join(out_dir, "cal_meta.json")))
    assert 2.0 < meta["T"] <= 5.0  # recovers the 3x overconfidence
    metrics = json.load(open(os.path.join(out_dir, "oof_metrics.json")))
    assert metrics["after"]["WLL"] < metrics["before"]["WLL"]
    assert os.path.exists(os.path.join(out_dir, "calibrator.pkl"))


def test_parity_driver_smoke(tmp_path, monkeypatch):
    """tools/parity_vs_reference.py end-to-end plumbing on a tiny run
    (ours-only; the full 3-seed head-to-head vs the reference produced
    PARITY.md).  Asserts the shared cache, injected split, and
    parity.json artifact."""
    import json as _json
    import sys

    from tossctr_tpu.tools import parity_vs_reference as pv

    out = str(tmp_path / "par")
    monkeypatch.setattr(
        sys, "argv",
        ["parity", "--out", out, "--rows", "3000", "--seeds", "0",
         "--epochs", "1", "--batch", "512", "--ours-modes",
         "rowwise_adagrad", "--skip-reference",
         "--report", str(tmp_path / "P.md")],
    )
    pv.main()
    with open(f"{out}/parity.json") as f:
        d = _json.load(f)
    r = d["results"][0]
    assert r["framework"] == "ours_jax_rowwise_adagrad"
    assert 0.0 < r["best"]["Score"] < 1.0
    assert (tmp_path / "P.md").exists()
