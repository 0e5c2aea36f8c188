"""Wild-type structure-file robustness: committed PDB/mmCIF fixtures with
the quirks real RCSB entries carry (tests/data/9xqa.pdb, 9xqb.cif):

  altloc A/B with occupancy ties and B>A occupancy, insertion-code runs,
  multi-MODEL entries, HETATM MSE (selenomethionine), waters, duplicated
  residue numbers (microheterogeneity), negative residue numbers,
  multi-char mmCIF auth chains, quoted CIF atom names.

Every expectation below is hand-derived from the fixture text. Reference
behavior being matched: ProDy's "protein and not hetero" selection +
highest-occupancy altloc resolution (proteinnet2pytorch.py:35-114,
structure_utils.py:360-431).
"""
import os

import numpy as np
import pytest

from protein_transformer_tpu.data.acquire import (
    atoms_to_record, get_chain_from_proteinnetid, parse_pdb_text,
    parse_mmcif_text, parse_structure_file, select_chain)
from protein_transformer_tpu.protein import _ff14sb as ff
from protein_transformer_tpu.protein.vocab import VOCAB

DATA = os.path.join(os.path.dirname(__file__), "data")


def _slot(res_char: str, atom_name: str) -> int:
    return ff.ATOM_NAMES_14[VOCAB[res_char]].index(atom_name)


@pytest.fixture(scope="module")
def pdb_atoms():
    return parse_structure_file(os.path.join(DATA, "9xqa.pdb"))


@pytest.fixture(scope="module")
def cif_atoms():
    return parse_structure_file(os.path.join(DATA, "9xqb.cif"))


def test_pdb_chain_a_sequence_and_order(pdb_atoms):
    seq, crd = atoms_to_record(select_chain(pdb_atoms, chain="A", model=1))
    # (-2)M (-1)G (0)A (1)S (2)V (52)L (52A)K (52B)D (54)Q;
    # MSE 53 is HETATM -> dropped (chain break), HOH dropped,
    # GLU 54 (duplicate number, second type) dropped whole
    assert seq == "MGASVLKDQ"
    assert crd.shape == (9, 14, 3)


def test_pdb_altloc_highest_occupancy_wins(pdb_atoms):
    seq, crd = atoms_to_record(select_chain(pdb_atoms, chain="A", model=1))
    i_ser = seq.index("S")
    # SER 1: altloc B has occupancy 0.60 > A's 0.40 -> B's coordinates
    np.testing.assert_allclose(crd[i_ser, _slot("S", "N")], [9.1, 0, 0])
    np.testing.assert_allclose(crd[i_ser, _slot("S", "CA")], [10.5, 0, 0])
    np.testing.assert_allclose(crd[i_ser, _slot("S", "OG")], [11.6, -1, 0])


def test_pdb_altloc_tie_keeps_first(pdb_atoms):
    seq, crd = atoms_to_record(select_chain(pdb_atoms, chain="A", model=1))
    i_val = seq.index("V")
    # VAL 2: both altlocs at 0.50 -> the first conformer (A) wins
    np.testing.assert_allclose(crd[i_val, _slot("V", "N")], [12.0, 0, 0])
    np.testing.assert_allclose(crd[i_val, _slot("V", "CA")], [13.4, 0, 0])


def test_pdb_insertion_code_run_order(pdb_atoms):
    seq, crd = atoms_to_record(select_chain(pdb_atoms, chain="A", model=1))
    # 52 L at x=15, 52A K at 18, 52B D at 21 -- (resnum, icode) order
    assert seq[5:8] == "LKD"
    assert crd[5, _slot("L", "N"), 0] == 15.0
    assert crd[6, _slot("K", "N"), 0] == 18.0
    assert crd[7, _slot("D", "N"), 0] == 21.0


def test_pdb_microheterogeneity_keeps_first_type(pdb_atoms):
    seq, crd = atoms_to_record(select_chain(pdb_atoms, chain="A", model=1))
    # residue 54 appears as GLN then GLU: first-seen type kept whole,
    # never a chimera of both atom sets
    assert seq[-1] == "Q"
    np.testing.assert_allclose(crd[-1, _slot("Q", "N")], [27.0, 0, 0])


def test_pdb_unplaced_slots_are_nan(pdb_atoms):
    seq, crd = atoms_to_record(select_chain(pdb_atoms, chain="A", model=1))
    # GLY has no sidechain atoms beyond the backbone+O slots
    i_gly = seq.index("G")
    names = ff.ATOM_NAMES_14[VOCAB["G"]]
    for slot, nm in enumerate(names):
        if not nm:
            assert np.isnan(crd[i_gly, slot]).all()


def test_pdb_chain_filter_and_models(pdb_atoms):
    seq_b, _ = atoms_to_record(select_chain(pdb_atoms, chain="B", model=1))
    assert seq_b == "W"
    seq_m2, crd_m2 = atoms_to_record(
        select_chain(pdb_atoms, chain="A", model=2))
    assert seq_m2 == "MG"
    assert (crd_m2[0, _slot("M", "N")] == [0, 0, 100]).all()


def test_pdb_negative_resnums_sort_first(pdb_atoms):
    sel = select_chain(pdb_atoms, chain="A", model=1,
                       resnum_range=(-2, 0))
    seq, _ = atoms_to_record(sel)
    assert seq == "MGA"


def test_proteinnet_id_model_routing():
    # ProteinNet model ids are 0-based coordset indices
    seq0, crd0 = get_chain_from_proteinnetid("9XQA_0_A", DATA)
    assert seq0 == "MGASVLKDQ"
    seq1, crd1 = get_chain_from_proteinnetid("9XQA_1_A", DATA)
    assert seq1 == "MG"
    assert crd1[0, _slot("M", "N"), 2] == 100.0


def test_cif_multichar_chain_and_quoted_names(cif_atoms):
    seq, crd = atoms_to_record(select_chain(cif_atoms, chain="AB", model=1))
    # PRO 10, THR 11 (altloc B wins at 0.70), GLY 11A; MSE 12 dropped
    assert seq == "PTG"
    i_thr = 1
    np.testing.assert_allclose(crd[i_thr, _slot("T", "N")], [3.2, 0, 0])
    np.testing.assert_allclose(crd[i_thr, _slot("T", "CA")], [4.66, 0, 0])
    # the quoted atom name "CG2" parses to CG2 and lands in its slot
    np.testing.assert_allclose(crd[i_thr, _slot("T", "CG2")], [5.0, -1, 0])


def test_cif_second_chain_and_model(cif_atoms):
    seq_cd, _ = atoms_to_record(select_chain(cif_atoms, chain="CD", model=1))
    assert seq_cd == "A"
    seq_m2, crd_m2 = atoms_to_record(
        select_chain(cif_atoms, chain="AB", model=2))
    assert seq_m2 == "P"
    assert crd_m2[0, _slot("P", "N"), 2] == 100.0


def test_cif_insertion_code(cif_atoms):
    sel = select_chain(cif_atoms, chain="AB", model=1)
    seq, crd = atoms_to_record(sel)
    assert seq[2] == "G"
    np.testing.assert_allclose(crd[2, _slot("G", "N")], [6.0, 0, 0])


def test_parsers_agree_on_atom_counts(pdb_atoms, cif_atoms):
    # sanity: every fixture line with coordinates landed in the table
    assert len(pdb_atoms) == 61
    assert len(cif_atoms) == 15
