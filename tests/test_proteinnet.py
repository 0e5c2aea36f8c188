"""Offline ProteinNet pipeline tests: record parsing, mask alignment, error
taxonomy, end-to-end dataset building from local PDB files."""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from protein_transformer_tpu.data import proteinnet as pn
from protein_transformer_tpu.protein.geometry import build_coords
from protein_transformer_tpu.protein.pdb import PdbWriter
from protein_transformer_tpu.protein.structure_exceptions import (
    ContigMultipleMatchingError, MaskAlignmentError)

RAW_RECORD = """[ID]
1ABC_1_A
[PRIMARY]
MKVLAA
[EVOLUTIONARY]
""" + "\n".join("0.1 " * 6 for _ in range(21)) + """
[MASK]
++++--

[ID]
2XYZ_1_B
[PRIMARY]
GGHHII
[MASK]
++++++

"""


def test_parse_records(tmp_path):
    path = tmp_path / "training_30"
    path.write_text(RAW_RECORD)
    recs = list(pn.parse_proteinnet_records(str(path)))
    assert len(recs) == 2
    assert recs[0]["id"] == "1ABC_1_A"
    assert recs[0]["primary"] == "MKVLAA"
    assert recs[0]["mask"] == [1, 1, 1, 1, 0, 0]
    assert len(recs[0]["evolutionary"]) == 21
    assert recs[1]["id"] == "2XYZ_1_B"
    assert "evolutionary" not in recs[1]


def test_parse_raw_dir_with_ids(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "training_30").write_text(RAW_RECORD)
    out = tmp_path / "parsed"
    recs = pn.parse_raw_proteinnet(str(raw), out_dir=str(out))
    assert set(recs) == {"1ABC_1_A", "2XYZ_1_B"}
    ids = (out / "training_30.ids").read_text().split()
    assert ids == ["1ABC_1_A", "2XYZ_1_B"]


def test_parse_raw_dir_parallel(tmp_path):
    """n_workers > 1 must actually work: the worker is a module-level
    function so multiprocessing can pickle it."""
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "training_30").write_text(RAW_RECORD)
    recs = pn.parse_raw_proteinnet(str(raw), n_workers=2)
    assert set(recs) == {"1ABC_1_A", "2XYZ_1_B"}


def test_angle_means_all_nan_column_falls_back_to_zero():
    """A sincos column that is NaN across the training set (a chi no
    protein carries) must not poison the model's angle-mean bias with
    NaN (arctanh(NaN))."""
    a = np.full((3, 24), 0.25, np.float32)
    a[:, 7] = np.nan  # this column has NO finite value anywhere
    b = np.full((2, 24), 0.75, np.float32)
    b[:, 7] = np.nan
    means = pn.compute_angle_means([a, b])
    assert np.isfinite(means).all()
    assert means[7] == 0.0
    assert abs(means[0] - 0.45) < 1e-6  # (3*0.25 + 2*0.75) / 5


def test_align_fast_path():
    primary = "MKVLAA"
    mask = [1, 1, 0, 1, 1, 0]
    obs_seq = "MKLA"
    ang = np.arange(4 * 12, dtype=np.float32).reshape(4, 12)
    crd = np.arange(4 * 14 * 3, dtype=np.float32).reshape(4 * 14, 3)
    ang_f, crd_f = pn.align_observed_to_mask(primary, mask, obs_seq, ang, crd)
    assert ang_f.shape == (6, 12)
    np.testing.assert_array_equal(ang_f[0], ang[0])
    np.testing.assert_array_equal(ang_f[3], ang[2])
    assert np.isnan(ang_f[2]).all() and np.isnan(ang_f[5]).all()
    assert np.isnan(crd_f[2 * 14]).all()
    np.testing.assert_array_equal(crd_f[3 * 14:(4 * 14)], crd[2 * 14:3 * 14])


def test_align_contig_fallback_and_errors():
    primary = "AAGVKAA"
    ang = np.zeros((3, 12), np.float32)
    crd = np.zeros((3 * 14, 3), np.float32)
    # single contig 'GVK' found even though mask disagrees
    ang_f, _ = pn.align_observed_to_mask(primary, [1] * 7, "GVK", ang, crd)
    assert np.isfinite(ang_f[2:5]).all()
    # ambiguous contig
    with pytest.raises(ContigMultipleMatchingError):
        pn.align_observed_to_mask("AGAGA", [1] * 5, "GA", np.zeros((2, 12)),
                                  np.zeros((2 * 14, 3)))
    # no match
    with pytest.raises(MaskAlignmentError):
        pn.align_observed_to_mask("AAAA", [1] * 4, "W", np.zeros((1, 12)),
                                  np.zeros((14, 3)))


def test_error_taxonomy_reports(tmp_path):
    errors = pn.ProteinErrors()
    errors.record("id1", pn.ERROR_NAME_TO_CODE["MISSING_FILE"])
    errors.record("id2", pn.ERROR_NAME_TO_CODE["MISSING_FILE"])
    errors.record("id3", errors.code_for_exception(MaskAlignmentError()))
    other = pn.ProteinErrors()
    other.record("id4", pn.ERROR_NAME_TO_CODE["SHORT_STRUCTURE"])
    errors.merge(other)
    assert errors.total() == 4
    assert "MISSING_FILE (2)" in errors.summarize()
    errors.write_reports(str(tmp_path / "errors"))
    assert (tmp_path / "errors" / "MISSING_FILE.txt").read_text().split() == \
        ["id1", "id2"]


def test_build_dataset_end_to_end(tmp_path):
    """PDB files on disk -> measured, aligned, assembled dataset dict."""
    from tests.test_geometry import random_protein
    rng = np.random.default_rng(0)
    structure_dir = tmp_path / "pdbs"
    structure_dir.mkdir()
    records = {}
    for i in range(3):
        seq_str, ids, ang = random_protein(rng, 12 + 4 * i)
        crd = np.asarray(build_coords(jnp.asarray(ang), jnp.asarray(ids)))
        PdbWriter(crd, seq_str).save_pdb(str(structure_dir / f"p{i}.pdb"))
        records[f"p{i}"] = {"primary": seq_str,
                            "mask": [1] * len(seq_str)}
    records["missing"] = {"primary": "AAAA", "mask": [1] * 4}

    errors = pn.ProteinErrors()
    data = pn.build_dataset(records, str(structure_dir),
                            split_of_id=lambda i: "train", errors=errors)
    assert len(data["train"]["seq"]) == 3
    assert errors.total() == 1  # the missing file
    # ascending length sort
    lens = [len(s) for s in data["train"]["seq"]]
    assert lens == sorted(lens)
    # angle means finite, 24-dim
    assert data["settings"]["angle_means"].shape == (24,)
    assert np.isfinite(data["settings"]["angle_means"]).all()
    # produced dict loads into the training DataModule
    from protein_transformer_tpu.config import TrainConfig
    from protein_transformer_tpu.data.dataset import DataModule
    for split in ("test",) + tuple(f"valid-{s}" for s in
                                   (10, 20, 30, 40, 50, 70, 90)):
        data[split] = {k: list(v) for k, v in data["train"].items()}
    cfg = TrainConfig(batch_size=2, bucket_sizes=(32,), max_seq_len=32,
                      skip_missing_res_train=False).finalize()
    dm = DataModule(data, cfg)
    batch = next(dm.train_batches(np.random.default_rng(0)))
    assert batch.seq.shape[1] == 32
    # angles measured from coordinates produce usable masks
    assert batch.ang_mask.any()


def test_align_multi_contig_repair():
    """Multi-contig mismatches are repaired with a gap-scored alignment
    instead of being discarded (align_dataset_to_proteinnet capability)."""
    primary = "MKTWGGGHRLVNPPPIKQ"
    observed = "KTW" + "RLVN" + "IKQ"  # 3 contigs; recorded mask is wrong
    n = len(observed)
    ang = np.arange(n * 12, dtype=np.float32).reshape(n, 12)
    crd = np.arange(n * 14 * 3, dtype=np.float32).reshape(n * 14, 3)
    ang_f, crd_f = pn.align_observed_to_mask(primary, [1] * len(primary),
                                             observed, ang, crd)
    # derived positions: KTW at 1-3, RLVN at 8-11, IKQ at 15-17
    for j, pos in enumerate([1, 2, 3, 8, 9, 10, 11, 15, 16, 17]):
        np.testing.assert_array_equal(ang_f[pos], ang[j])
    assert np.isnan(ang_f[0]).all() and np.isnan(ang_f[4:8]).all()
    assert np.isnan(ang_f[12:15]).all()
