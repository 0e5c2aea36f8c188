"""Measurement tests: the strongest check is the build->measure round trip --
angles in, coordinates out, measured angles must match the inputs wherever
the builder consumed them."""
import numpy as np
import pytest

import jax.numpy as jnp

from protein_transformer_tpu.protein import _ff14sb as ff
from protein_transformer_tpu.protein import measure
from protein_transformer_tpu.protein.geometry import build_coords
from protein_transformer_tpu.protein.pdb import PdbWriter
from protein_transformer_tpu.protein.vocab import VOCAB


def wrap_diff(a, b):
    """Angular difference wrapped to [-pi, pi]."""
    d = a - b
    return np.abs(np.arctan2(np.sin(d), np.cos(d)))


def test_dihedral_known_values():
    # staggered butane-like: 4 points with a perfect 90-degree torsion
    p0 = np.array([1.0, 0.0, 0.0])
    p1 = np.array([0.0, 0.0, 0.0])
    p2 = np.array([0.0, 1.0, 0.0])
    p3 = np.array([0.0, 1.0, 1.0])
    assert abs(measure.dihedral(p0, p1, p2, p3)) == pytest.approx(np.pi / 2)
    # cis (0) and trans (pi)
    p3_cis = np.array([1.0, 1.0, 0.0])
    assert measure.dihedral(p0, p1, p2, p3_cis) == pytest.approx(0.0)
    p3_trans = np.array([-1.0, 1.0, 0.0])
    assert abs(measure.dihedral(p0, p1, p2, p3_trans)) == pytest.approx(np.pi)


def test_bond_angle():
    a = np.array([1.0, 0.0, 0.0])
    b = np.zeros(3)
    c = np.array([0.0, 1.0, 0.0])
    assert measure.bond_angle(a, b, c) == pytest.approx(np.pi / 2)


def test_build_measure_roundtrip():
    """angles -> coords -> angles: every angle the builder actually uses must
    be recovered."""
    from tests.test_geometry import random_protein
    rng = np.random.default_rng(0)
    seq_str = "ACDEFGHIKLMNPQRSTVWY" * 2
    _, ids, ang = random_protein(rng, len(seq_str), seq=seq_str)
    crd = np.asarray(build_coords(jnp.asarray(ang), jnp.asarray(ids)))
    meas = measure.coords_to_angles(crd, ids)
    L = len(seq_str)

    # backbone torsions/angles: defined interior positions must match
    checks = [
        ("phi", meas[1:, 0], ang[1:, 0]),
        ("psi", meas[:-1, 1], ang[:-1, 1]),
        ("omega", meas[:-1, 2], ang[:-1, 2]),
        ("ncac", meas[:, 3], ang[:, 3]),
        ("cacn", meas[:-1, 4], ang[:-1, 4]),
        ("cnca", meas[:-1, 5], ang[:-1, 5]),
    ]
    for name, got, want in checks:
        err = wrap_diff(got, want).max()
        assert err < 5e-3, f"{name}: max err {err}"

    # chi angles: the measurable leading-'p' run per residue
    n_chi = measure.N_CHI[ids]
    for i in range(L):
        for k in range(int(n_chi[i])):
            err = wrap_diff(meas[i, 6 + k], ang[i, 6 + k])
            assert err < 5e-3, f"res {i} ({seq_str[i]}) chi{k}: err {err}"
        # beyond the measurable run: NaN
        for k in range(int(n_chi[i]), 6):
            assert np.isnan(meas[i, 6 + k])


def test_edge_nans():
    from tests.test_geometry import random_protein
    rng = np.random.default_rng(1)
    _, ids, ang = random_protein(rng, 10)
    crd = np.asarray(build_coords(jnp.asarray(ang), jnp.asarray(ids)))
    meas = measure.coords_to_angles(crd, ids)
    assert np.isnan(meas[0, 0])                             # phi at 0
    assert np.isnan(meas[-1, 1]) and np.isnan(meas[-1, 2])  # psi/omega at last
    assert np.isnan(meas[-1, 4]) and np.isnan(meas[-1, 5])  # cacn/cnca


def test_n_chi_table():
    # spot checks: ALA has 1 'p' (CB), GLY 0, ARG 6 ('p' x6 then 'i'),
    # PHE 3 ('p','p','p' then planar ring)
    assert measure.N_CHI[VOCAB["A"]] == 1
    assert measure.N_CHI[VOCAB["G"]] == 0
    assert measure.N_CHI[VOCAB["R"]] == 6
    assert measure.N_CHI[VOCAB["F"]] == 3


def test_pdb_to_record_roundtrip(tmp_path):
    from tests.test_geometry import random_protein
    rng = np.random.default_rng(2)
    seq_str, ids, ang = random_protein(rng, 20)
    crd = np.asarray(build_coords(jnp.asarray(ang), jnp.asarray(ids)))
    path = str(tmp_path / "m.pdb")
    PdbWriter(crd, seq_str).save_pdb(path)
    seq2, crd2 = measure.pdb_to_record(path)
    assert seq2 == seq_str
    # atoms that exist must match to PDB precision (3 decimals)
    for i, c in enumerate(seq_str):
        n_atoms = 4 + int(ff.SC_NUM_ATOMS[VOCAB[c]])
        np.testing.assert_allclose(crd2[i, :n_atoms], crd[i, :n_atoms],
                                   atol=1.5e-3)
        assert np.isnan(crd2[i, n_atoms:]).all()
    # measurement from the parsed record still matches
    meas = measure.coords_to_angles(crd2, ids)
    err = wrap_diff(meas[1:, 0], ang[1:, 0]).max()
    assert err < 5e-3
