"""Data pipeline tests: binning invariants, sampler semantics, collate masks,
native format round-trip. Mirrors the reference's dataset test strategy
(reference: tests/test_datasets.py:20-31) plus mask-contract checks."""
import os

import numpy as np
import pytest

from protein_transformer_tpu.config import TrainConfig
from protein_transformer_tpu.data import convert as convert_mod
from protein_transformer_tpu.data.dataset import (
    Batch, BinnedDataset, DataModule, binned_batch_sampler, bucket_length,
    collate, load_native)
from protein_transformer_tpu.data.synthetic import make_dataset
from protein_transformer_tpu.protein.constants import NUM_PREDICTED_COORDS
from protein_transformer_tpu.protein.vocab import VOCAB


@pytest.fixture(scope="module")
def data():
    return make_dataset(n_train=24, n_eval=4, min_len=8, max_len=48, seed=0)


@pytest.fixture(scope="module")
def train_ds(data):
    t = data["train"]
    return BinnedDataset(t["seq"], t["ang"], t["crd"], ids=t["ids"],
                         skip_missing_residues=True)


def test_bin_probs_sum_to_one(train_ds):
    assert abs(train_ds.bin_probs.sum() - 1.0) < 1e-9


def test_equal_length_seqs_share_bin(train_ds):
    by_len = {}
    for b, idxs in train_ds.bin_map.items():
        for i in idxs:
            by_len.setdefault(train_ds.lens[i], set()).add(b)
    for ln, bs in by_len.items():
        assert len(bs) == 1, f"length {ln} in multiple bins {bs}"


def test_every_protein_in_exactly_one_bin(train_ds):
    seen = sorted(i for idxs in train_ds.bin_map.values() for i in idxs)
    assert seen == list(range(len(train_ds)))


def test_skip_missing_residues():
    d = make_dataset(n_train=10, n_eval=2, seed=1)
    # poison two proteins with all-NaN residues
    d["train"]["ang"][0][3] = np.nan
    d["train"]["ang"][5][0] = np.nan
    t = d["train"]
    kept = BinnedDataset(t["seq"], t["ang"], t["crd"],
                         skip_missing_residues=True)
    assert len(kept) == 8
    kept_all = BinnedDataset(t["seq"], t["ang"], t["crd"],
                             skip_missing_residues=False)
    assert len(kept_all) == 10


def test_dynamic_batch_sampler_budget(train_ds):
    rng = np.random.default_rng(0)
    budget = 8 * 48
    batches = list(binned_batch_sampler(train_ds, 8, budget, rng))
    assert len(batches) > 0
    for idx in batches:
        bin_lens = train_ds.lens[idx]
        # all same bin => similar lengths; batch residue total <= ~budget
        assert int(bin_lens.max()) * len(idx) <= budget + int(bin_lens.max())


def test_sampler_batch_count_scaling(train_ds):
    rng = np.random.default_rng(0)
    n1 = len(list(binned_batch_sampler(train_ds, 4, None, rng)))
    n2 = len(list(binned_batch_sampler(train_ds, 4, None, rng,
                                       repeat_train=3)))
    assert n2 == 3 * n1


def test_bucket_length():
    buckets = (64, 128, 256, 512)
    assert bucket_length(3, buckets, 500) == 64
    assert bucket_length(64, buckets, 500) == 64
    assert bucket_length(65, buckets, 500) == 128
    assert bucket_length(400, buckets, 500) == 500
    assert bucket_length(700, buckets, 500) == 500


def test_collate_masks(train_ds, data):
    # masks must reproduce the RAW NaN pattern (the split stores zero-filled
    # views; the raw fixture is the ground truth)
    raw = {pid: (np.asarray(a, np.float32), np.asarray(c, np.float32))
           for pid, a, c in zip(data["train"]["ids"], data["train"]["ang"],
                                data["train"]["crd"])}
    idx = np.array([0, 1, 2])
    batch = collate(train_ds, idx, (16, 32, 64))
    assert isinstance(batch, Batch)
    b, l = batch.seq.shape
    assert l in (16, 32, 64)
    assert b == 4  # bucketed up from 3
    assert batch.protein_mask.tolist() == [True, True, True, False]
    for row, i in enumerate(idx):
        li = int(train_ds.lens[i])
        # sequence ids correct and padded
        assert (batch.seq[row, li:] == VOCAB.pad_id).all()
        assert (batch.seq[row, :li] != VOCAB.pad_id).all()
        # angle mask excludes NaN and padding
        raw_ang, raw_crd = raw[train_ds.ids[i]]
        np.testing.assert_array_equal(batch.ang_mask[row, :li],
                                      ~np.isnan(raw_ang[:li]))
        assert not batch.ang_mask[row, li:].any()
        # masked angle entries arrive zero-filled, unmasked match the raw
        np.testing.assert_array_equal(
            batch.ang[row, :li],
            np.where(batch.ang_mask[row, :li], raw_ang[:li], 0.0))
        # coords: finite everywhere, mask matches source NaNs
        assert np.isfinite(batch.crd).all()
        src_c = raw_crd[:li * NUM_PREDICTED_COORDS].reshape(
            li, NUM_PREDICTED_COORDS, 3)
        np.testing.assert_array_equal(batch.crd_mask[row, :li],
                                      ~np.isnan(src_c).any(-1))
    assert batch.n_res == sum(int(train_ds.lens[i]) for i in idx)


def test_native_format_roundtrip(tmp_path, data):
    out = str(tmp_path / "native")
    convert_mod.convert(data, out)
    loaded = load_native(out)
    assert set(k for k in data if k not in ("settings", "date")) <= set(loaded)
    for split in ("train", "test", "valid-70"):
        assert loaded[split]["seq"] == data[split]["seq"]
        for a, b in zip(loaded[split]["ang"], data[split]["ang"]):
            np.testing.assert_array_equal(a, b)
        for a, b in zip(loaded[split]["crd"], data[split]["crd"]):
            np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(loaded["settings"]["angle_means"],
                               data["settings"]["angle_means"], atol=1e-7)


def test_datamodule_iterates(data):
    cfg = TrainConfig(batch_size=4, bucket_sizes=(16, 32, 64),
                      max_seq_len=64).finalize()
    dm = DataModule(data, cfg)
    rng = np.random.default_rng(0)
    n = 0
    for batch in dm.train_batches(rng):
        # buckets clamp at the dataset max_len (48 here)
        assert batch.seq.shape[1] in (16, 32, 48)
        n += 1
        if n > 3:
            break
    assert n > 0
    evals = list(dm.eval_batches("valid-70"))
    assert sum(int(b.protein_mask.sum()) for b in evals) == 4


def test_batching_order_modes(data):
    cfg = TrainConfig(batch_size=4, bucket_sizes=(16, 32, 48), max_seq_len=48,
                      batching_order="ascending").finalize()
    dm = DataModule(data, cfg)
    lens = []
    for batch in dm.train_batches(np.random.default_rng(0)):
        valid = batch.seq != VOCAB.pad_id
        lens.append(valid.sum(1)[batch.protein_mask].max())
    assert lens == sorted(lens)
    cfg2 = TrainConfig(batch_size=4, bucket_sizes=(16, 32, 48), max_seq_len=48,
                       batching_order="descending").finalize()
    dm2 = DataModule(data, cfg2)
    lens2 = [int((b.seq != VOCAB.pad_id).sum(1)[b.protein_mask].max())
             for b in dm2.train_batches(np.random.default_rng(0))]
    assert lens2 == sorted(lens2, reverse=True)
