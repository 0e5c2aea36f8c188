"""Tests for offline tooling: batch probe, dev datasets, downsampling, plot."""
import os
import sys

import numpy as np
import pytest

from protein_transformer_tpu.data.synthetic import make_dataset
from protein_transformer_tpu.training.batch_probe import (
    find_largest_batch_size)


def test_batch_probe_search():
    calls = []

    def try_batch(b):
        calls.append(b)
        if b > 23:
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")

    got = find_largest_batch_size(try_batch, verbose=False)
    # frontier is 23, keep 0.8 -> 18
    assert got == int(23 * 0.8)


def test_batch_probe_non_oom_propagates():
    def try_batch(b):
        raise ValueError("boom")

    with pytest.raises(ValueError):
        find_largest_batch_size(try_batch, verbose=False)


def test_batch_probe_start_too_big():
    def try_batch(b):
        raise RuntimeError("RESOURCE_EXHAUSTED")

    with pytest.raises(RuntimeError, match="starting batch"):
        find_largest_batch_size(try_batch, verbose=False)


def test_dev_dataset_scripts(tmp_path):
    sys.path.insert(0, "ptt_scripts")
    try:
        from create_development_datasets import (
            extract_ids_dataset, make_dev_dataset)
    finally:
        sys.path.remove("ptt_scripts")
    data = make_dataset(n_train=10, n_eval=2, seed=0)
    wanted = [data["train"]["ids"][1], data["train"]["ids"][4]]
    dev = make_dev_dataset(data, wanted)
    assert len(dev["train"]["seq"]) == 2
    assert dev["valid-70"] is dev["train"]
    both = extract_ids_dataset(data, ["syn1"])
    assert len(both["train"]["seq"]) >= 1


def test_downsample(tmp_path):
    sys.path.insert(0, "ptt_scripts")
    try:
        from downsample_dataset import down_sample_split
    finally:
        sys.path.remove("ptt_scripts")
    data = make_dataset(n_train=10, n_eval=4, seed=0)
    rng = np.random.default_rng(0)
    small = down_sample_split(data["train"], rng, n=3)
    assert len(small["seq"]) == 3
    frac = down_sample_split(data["train"], rng, fraction=0.5)
    assert len(frac["seq"]) == 5


def test_plot_reads_log(tmp_path):
    sys.path.insert(0, "ptt_scripts")
    try:
        import plot as plot_mod
    finally:
        sys.path.remove("ptt_scripts")
    log = tmp_path / "x.train"
    log.write_text(
        "drmsd,ln_drmsd,rmse,rmsd,combined,lr,mode,granularity,time,speed\n"
        "1.0,0.1,0.5,0.0,2.0,0.001,train,epoch,1.0,100\n"
        "0.9,0.09,0.4,0.0,1.8,0.001,train,epoch,2.0,100\n")
    data = plot_mod.read_log(str(log))
    assert data["drmsd"] == [1.0, 0.9]
    assert plot_mod.main([str(log), "--mode", "train",
                          "--out", str(tmp_path / "p.png")]) == 0


def test_analyze_runs(tmp_path):
    import json
    run = tmp_path / "runA"
    run.mkdir()
    (run / "runA.train").write_text(
        "drmsd,ln_drmsd,rmse,rmsd,lr,mode,granularity,time,speed\n"
        "2.0,0.2,0.8,0.0,0.001,train,epoch,1.0,100\n"
        "1.5,0.15,0.6,0.0,0.001,train,epoch,2.0,100\n")
    (run / "config.json").write_text(json.dumps(
        {"config": {"model": "enc-only", "d_model": 64, "loss": "mse"},
         "angle_means": [0.0] * 24}))
    sys.path.insert(0, "ptt_scripts")
    try:
        import analyze
    finally:
        sys.path.remove("ptt_scripts")
    s = analyze.summarize_run(str(run), "train")
    assert s["epochs"] == 2
    assert s["best_rmse"] == 0.6 and s["final_drmsd"] == 1.5
    assert analyze.main([str(run), "--metric", "rmse"]) == 0


def test_dataset_item_to_pdb(tmp_path, monkeypatch):
    from protein_transformer_tpu.data.convert import convert
    data = make_dataset(n_train=3, n_eval=2, min_len=8, max_len=12, seed=2)
    native = str(tmp_path / "native")
    convert(data, native)
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, "/root/repo/ptt_scripts")
    sys.path.insert(0, "/root/repo")
    try:
        import dataset_item_to_pdb
    finally:
        sys.path.remove("/root/repo/ptt_scripts")
    out = str(tmp_path / "item.pdb")
    dataset_item_to_pdb.main([native, "--split", "train", "--idx", "0",
                              "--out", out, "--rebuild"])
    assert os.path.exists(out)
    rebuilt = out.replace("_true.pdb", "_rebuilt.pdb")
    assert os.path.exists(out.replace(".pdb", ".pdb"))


def test_export_embeddings(tmp_path):
    # reuse a trained run from the trainer test helper
    from protein_transformer_tpu.config import TrainConfig
    from protein_transformer_tpu.training.trainer import Trainer
    data = make_dataset(n_train=6, n_eval=2, min_len=8, max_len=16, seed=3)
    cfg = TrainConfig(model="enc-only", d_model=16, d_ff=32, n_heads=2,
                      n_layers=1, batch_size=4, epochs=1, loss="mse",
                      optimizer="adam", bucket_sizes=(16,), max_seq_len=16,
                      out_dir=str(tmp_path), name="emb", dropout=0.0,
                      train_only=True, log_structure_step=0)
    Trainer(cfg, data=data).train()
    sys.path.insert(0, "/root/repo/ptt_scripts")
    try:
        import export_embeddings_to_tsv as exp
    finally:
        sys.path.remove("/root/repo/ptt_scripts")
    exp.main([str(tmp_path / "emb"), "--out", str(tmp_path / "tsv")])
    vecs = open(tmp_path / "tsv" / "vectors.tsv").read().strip().splitlines()
    labels = open(tmp_path / "tsv" / "labels.tsv").read().strip().splitlines()
    assert len(vecs) == len(labels) == 22  # vocab size
    assert len(vecs[0].split("\t")) == 16  # d_model


def test_group_predictions(tmp_path):
    """PyMOL-free analogue of scripts/group_pymol_by_prediction.py: pairs
    are Kabsch-aligned, bucketed by RMSD, and written as multi-model PDBs."""
    from protein_transformer_tpu.protein.pdb import PdbWriter, parse_pdb_atoms
    rng = np.random.default_rng(0)
    seq = "ACDEF"
    crd = rng.normal(size=(5, 14, 3)) * 3.0
    pred_dir = tmp_path / "preds"
    pred_dir.mkdir()
    # pred = rigidly moved true + 0.1A noise -> aligned RMSD ~0.1 (excellent)
    theta = 0.7
    rot = np.array([[np.cos(theta), -np.sin(theta), 0],
                    [np.sin(theta), np.cos(theta), 0], [0, 0, 1.0]])
    moved = crd @ rot.T + np.array([5.0, -3.0, 2.0])
    moved += rng.normal(size=moved.shape) * 0.05
    PdbWriter(crd, seq).save_pdb(str(pred_dir / "p1_true.pdb"))
    PdbWriter(moved, seq).save_pdb(str(pred_dir / "p1_pred.pdb"))
    # a second, badly wrong prediction -> poor bucket
    PdbWriter(crd, seq).save_pdb(str(pred_dir / "p2_true.pdb"))
    PdbWriter(rng.normal(size=(5, 14, 3)) * 20.0, seq).save_pdb(
        str(pred_dir / "p2_pred.pdb"))

    sys.path.insert(0, "/root/repo/ptt_scripts")
    try:
        import group_predictions as gp
    finally:
        sys.path.remove("/root/repo/ptt_scripts")
    out = tmp_path / "grouped"
    results = gp.group_predictions(str(pred_dir), str(out))
    assert [r[0] for r in results] == ["p1", "p2"]  # sorted best-first
    assert results[0][1] < 0.2 and results[0][2] == "excellent"
    assert results[1][1] > 10.0 and results[1][2] == "poor"
    # the multi-model group file holds true + aligned pred
    text = open(results[0][3]).read()
    assert text.count("MODEL") == 2 and "ENDMDL" in text
    # aligned pred coordinates now sit on the true ones
    _, _, _, true_xyz = parse_pdb_atoms(str(pred_dir / "p1_true.pdb"))
    lines = [ln for ln in text.splitlines()]
    m2 = lines.index("MODEL     2")
    aligned_path = tmp_path / "aligned.pdb"
    aligned_path.write_text("\n".join(lines[m2:]))
    _, _, _, al_xyz = parse_pdb_atoms(str(aligned_path))
    assert np.sqrt(((al_xyz - true_xyz) ** 2).sum(-1).mean()) < 0.2
    assert (out / "summary.tsv").exists()


def test_group_predictions_kabsch_matches_losses():
    """The script's kabsch() duplicates the numerically-delicate Kabsch
    construction of losses.kabsch_rmsd (it additionally needs the rotation
    back); this differential test keeps the two in sync."""
    from protein_transformer_tpu import losses as L
    sys.path.insert(0, "/root/repo/ptt_scripts")
    try:
        import group_predictions as gp
    finally:
        sys.path.remove("/root/repo/ptt_scripts")
    rng = np.random.default_rng(5)
    for trial in range(5):
        a = rng.normal(size=(30, 3)) * 4.0
        b = rng.normal(size=(30, 3)) * 4.0
        _, _, _, rmsd_script = gp.kabsch(a, b)
        assert rmsd_script == pytest.approx(L.kabsch_rmsd(a, b), rel=1e-8)
