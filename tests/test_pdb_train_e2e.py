"""End-to-end: PDB files ON DISK -> acquisition -> measurement -> dataset
-> training.

Every prior convergence run consumed datasets produced directly by a
generator; this test exercises the same offline path a reference user runs
(scripts/proteinnet2pytorch.py:211-397: parse structure files, measure
angles, assemble the dataset dict, train): realistic chains are written as
PDB TEXT, re-acquired through the wild-type parser, measured, assembled via
``build_dataset``, and trained on -- including the two committed wild-type
quirk fixtures (altloc/icode/HETATM/multi-model) flowing through the same
dataset into the same trainer.
"""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from protein_transformer_tpu.config import TrainConfig
from protein_transformer_tpu.data import proteinnet as pn
from protein_transformer_tpu.protein.geometry import build_coords_batch
from protein_transformer_tpu.protein.pdb import PdbWriter
from protein_transformer_tpu.protein.vocab import VOCAB
from protein_transformer_tpu.training.trainer import Trainer

from tools.gen_scale_data import _aa_rotamers, gen_chain

DATA = os.path.join(os.path.dirname(__file__), "data")
N_CHAINS = 10
MAX_LEN = 32


@pytest.fixture(scope="module")
def disk_dataset(tmp_path_factory):
    """Chains -> PDB text on disk -> build_dataset, plus the generator's
    own coordinates for fidelity checks."""
    cache = tmp_path_factory.mktemp("pdb_cache")
    rng = np.random.default_rng(7)
    rotamers = _aa_rotamers(rng)
    build = jax.jit(build_coords_batch)

    records, truth = {}, {}
    for i in range(N_CHAINS):
        length = int(rng.integers(18, MAX_LEN + 1))
        seq, ids, ang = gen_chain(rng, length, rotamers)
        ids_pad = np.full((1, MAX_LEN), VOCAB.pad_id, np.int32)
        ang_pad = np.zeros((1, MAX_LEN, ang.shape[1]), np.float32)
        ids_pad[0, :length] = ids
        ang_pad[0, :length] = ang
        crd = np.asarray(build(jnp.asarray(ang_pad),
                               jnp.asarray(ids_pad)))[0, :length]
        pdbid = f"t{i:03d}"
        PdbWriter(crd, seq, chain="A").save_pdb(str(cache / f"{pdbid}.pdb"))
        pnid = f"{pdbid.upper()}_0_A"
        records[pnid] = {"primary": seq, "mask": [1] * length}
        truth[pnid] = (seq, crd)

    # the committed wild-type quirk fixtures ride the same acquisition path
    for name in ("9xqa.pdb", "9xqb.cif"):
        (cache / name).write_bytes(
            open(os.path.join(DATA, name), "rb").read())
    records["9XQA_0_A"] = {"primary": "MGASVLKDQ", "mask": [1] * 9}
    records["9XQB_0_AB"] = {"primary": "PTG", "mask": [1] * 3}

    order = sorted(records)  # deterministic split assignment
    split_of = {pnid: ("valid-70" if j % 5 == 3 else
                       "test" if j % 5 == 4 else "train")
                for j, pnid in enumerate(order)}
    errors = pn.ProteinErrors()
    data = pn.build_dataset(records, str(cache), split_of.get,
                            max_len=MAX_LEN, errors=errors)
    assert errors.total() == 0, errors.counts
    return data, truth, split_of


def test_all_chains_acquired(disk_dataset):
    data, truth, split_of = disk_dataset
    got = {pnid for split in ("train", "valid-70", "test")
           for pnid in data[split]["ids"]}
    assert got == set(split_of)


def test_pdb_text_roundtrip_fidelity(disk_dataset):
    """Coordinates survive the 8.3-column PDB text round trip to 2e-3 A;
    slots the builder left empty (zero) come back as NaN markers."""
    data, truth, split_of = disk_dataset
    for split in ("train", "valid-70", "test"):
        for pnid, crd in zip(data[split]["ids"], data[split]["crd"]):
            if pnid.startswith("9XQ"):
                continue
            seq, crd_true = truth[pnid]
            crd = np.asarray(crd).reshape(crd_true.shape)
            empty = (crd_true == 0).all(-1)
            assert np.isnan(crd[empty]).all()
            np.testing.assert_allclose(crd[~empty], crd_true[~empty],
                                       atol=2e-3)


def test_measured_angles_rebuild_structures(disk_dataset):
    """The dataset's measured sincos angles rebuild each chain close to the
    original coordinates. The 8.3-column text quantization (~1e-3 A) enters
    every dihedral measurement and compounds down the chain via the lever
    arm, so the aligned backbone RMS lands in the 0.1-0.3 A range at L~30;
    the 0.5 A gate is an order of magnitude below any modeling signal."""
    data, truth, split_of = disk_dataset
    split = data["train"]
    for pnid, seq, sincos, crd in zip(split["ids"], split["seq"],
                                      split["ang"], split["crd"]):
        if pnid.startswith("9XQ"):
            continue
        n = len(seq)
        # sincos is interleaved [cos, sin] per angle (measure.py:140-144)
        cs = np.nan_to_num(sincos).reshape(len(seq), 12, 2)
        ang = np.arctan2(cs[..., 1], cs[..., 0])
        ids_arr = np.array([VOCAB[c] for c in seq], np.int32)
        rebuilt = np.asarray(build_coords_batch(
            jnp.asarray(ang[None]), jnp.asarray(ids_arr[None])))[0]
        crd_true = truth[pnid][1]
        bb = rebuilt[:, :4].reshape(-1, 3)       # N, CA, C, O backbone
        bb_true = crd_true[:, :4].reshape(-1, 3)
        # rigid-align (measurement loses the global frame)
        mu, mu_t = bb.mean(0), bb_true.mean(0)
        h = (bb - mu).T @ (bb_true - mu_t)
        u, _, vt = np.linalg.svd(h)
        d = np.sign(np.linalg.det(vt.T @ u.T))
        r = vt.T @ np.diag([1, 1, d]) @ u.T
        rms = np.sqrt(np.mean(np.sum(
            ((bb - mu) @ r.T - (bb_true - mu_t)) ** 2, -1)))
        assert rms < 0.5, (pnid, rms)


def test_training_from_disk_dataset_learns(disk_dataset, tmp_path):
    data, _, _ = disk_dataset
    cfg = TrainConfig(model="enc-only", d_model=16, d_ff=32, n_heads=2,
                      n_layers=1, batch_size=4, epochs=4, loss="mse",
                      optimizer="adam", learning_rate=1e-3,
                      lr_scheduling="plateau", bucket_sizes=(MAX_LEN,),
                      max_seq_len=MAX_LEN, out_dir=str(tmp_path),
                      name="disk_e2e", dropout=0.0, train_only=True,
                      early_stopping=0)
    tr = Trainer(cfg, data=data)
    tr.train()
    hist = tr.metrics["train"]["epoch-history-mse"]
    assert len(hist) == 4 and np.isfinite(hist).all()
    assert hist[-1] < hist[0], f"no learning from disk-acquired data: {hist}"
