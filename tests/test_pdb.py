"""PDB writer round-trip and format tests."""
import numpy as np

import jax.numpy as jnp

from protein_transformer_tpu.protein import _ff14sb as ff
from protein_transformer_tpu.protein.geometry import build_coords
from protein_transformer_tpu.protein.pdb import PdbWriter, parse_pdb_atoms
from protein_transformer_tpu.protein.vocab import (
    THREE_TO_ONE_LETTER_MAP, VOCAB)


def test_pdb_roundtrip(tmp_path):
    from tests.test_geometry import random_protein
    rng = np.random.default_rng(0)
    seq_str, ids, ang = random_protein(rng, 25)
    crd = np.asarray(build_coords(jnp.asarray(ang), jnp.asarray(ids)))

    path = str(tmp_path / "test.pdb")
    PdbWriter(crd, seq_str).save_pdb(path, title="roundtrip")
    names, res_names, res_nums, xyz = parse_pdb_atoms(path)

    # each written atom belongs to the right residue with the right name
    expected_atoms = sum(4 + int(ff.SC_NUM_ATOMS[VOCAB[c]]) for c in seq_str)
    assert len(names) == expected_atoms
    k = 0
    for res_i, c in enumerate(seq_str):
        n_atoms = 4 + int(ff.SC_NUM_ATOMS[VOCAB[c]])
        for slot in range(n_atoms):
            assert res_nums[k] == res_i + 1
            assert THREE_TO_ONE_LETTER_MAP[res_names[k]] == c
            assert names[k] == ff.ATOM_NAMES_14[VOCAB[c]][slot]
            np.testing.assert_allclose(xyz[k], crd[res_i, slot], atol=1.5e-3)
            k += 1


def test_pdb_skips_nan_and_zero(tmp_path):
    from tests.test_geometry import random_protein
    rng = np.random.default_rng(1)
    seq_str, ids, ang = random_protein(rng, 10)
    crd = np.asarray(build_coords(jnp.asarray(ang), jnp.asarray(ids))).copy()
    crd[3, 1] = np.nan  # missing CA in residue 4
    path = str(tmp_path / "gap.pdb")
    PdbWriter(crd, seq_str).save_pdb(path)
    names, _res, res_nums, _xyz = parse_pdb_atoms(path)
    res4 = [nm for nm, rn in zip(names, res_nums) if rn == 4]
    assert "CA" not in res4 and "N" in res4


def test_fixed_columns(tmp_path):
    from tests.test_geometry import random_protein
    rng = np.random.default_rng(2)
    seq_str, ids, ang = random_protein(rng, 5)
    crd = np.asarray(build_coords(jnp.asarray(ang), jnp.asarray(ids)))
    lines = PdbWriter(crd, seq_str).lines()
    atom_lines = [l for l in lines if l.startswith("ATOM")]
    assert all(len(l) == 80 for l in atom_lines), [len(l) for l in atom_lines]
    assert lines[0].startswith("REMARK")
    assert lines[-2] == "TER"
