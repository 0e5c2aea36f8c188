"""Chemistry table integrity tests (mirrors reference tests/test_sidechains.py:
per-AA build lists must be mutually consistent), plus dense-table invariants
specific to this framework's representation."""
import numpy as np

from protein_transformer_tpu.protein import _ff14sb as ff
from protein_transformer_tpu.protein.vocab import STD_AAS, VOCAB


def test_counts_match_atom_names():
    for aa_id in range(20):
        n = int(ff.SC_NUM_ATOMS[aa_id])
        names = ff.ATOM_NAMES_14[aa_id]
        # backbone + n sidechain atoms named, rest empty
        assert all(names[i] for i in range(4 + n))
        assert all(not names[i] for i in range(4 + n, 14))


def test_bond_values_physical():
    for aa_id in range(20):
        n = int(ff.SC_NUM_ATOMS[aa_id])
        lens = ff.SC_BOND_LEN[aa_id, :n]
        angs = ff.SC_BOND_ANG[aa_id, :n]
        assert (lens > 1.0).all() and (lens < 2.0).all()
        assert (angs > 1.5).all() and (angs < 2.5).all()
        # zero beyond n
        assert (ff.SC_BOND_LEN[aa_id, n:] == 0).all()


def test_frame_indices_reference_earlier_atoms():
    """Every frame atom must already exist when its slot is built."""
    for aa_id in range(20):
        n = int(ff.SC_NUM_ATOMS[aa_id])
        for slot in range(n):
            a, b, c = ff.SC_FRAME_IDX[aa_id, slot]
            for idx in (a, b, c):
                assert (idx < 4            # backbone
                        or idx == ff.ANCHOR_IDX
                        or (4 <= idx < 4 + slot)), (aa_id, slot, idx)


def test_torsion_resolution_invariants():
    for aa_id in range(20):
        n = int(ff.SC_NUM_ATOMS[aa_id])
        for slot in range(n):
            src = int(ff.SC_TORSION_SRC[aa_id, slot])
            assert src <= slot
            if ff.SC_TORSION_TYPE[aa_id, slot] == ff.TORSION_PRED:
                assert src < 6, "predicted torsion beyond chi capacity"
            off = float(ff.SC_TORSION_PI_OFFSET[aa_id, slot])
            assert off >= 0 and abs(off / np.pi - round(off / np.pi)) < 1e-6


def test_non_aa_rows_zero():
    for aa_id in range(20, ff.SC_NUM_ATOMS.shape[0]):
        assert ff.SC_NUM_ATOMS[aa_id] == 0


def test_glycine_has_no_sidechain():
    assert ff.SC_NUM_ATOMS[VOCAB["G"]] == 0


def test_tryptophan_is_largest():
    assert ff.SC_NUM_ATOMS[VOCAB["W"]] == ff.MAX_SC_ATOMS == 10
