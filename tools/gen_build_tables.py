#!/usr/bin/env python
"""Generate dense NeRF build tables from AMBER ff14SB chemistry constants.

The reference framework stores these constants as nested per-amino-acid dicts
(reference: protein_transformer/protein/SidechainBuildInfo.py:1-585, themselves
generated from AMBER ff14SB sources in data/development/forcefields/). A
TPU-native builder needs *dense arrays indexed by amino-acid id* so that the
whole sidechain build is a gather + vmap instead of a Python object graph.

This script extracts the physical constants (bond lengths, bond angles, torsion
specifications, atom names) and emits `protein_transformer_tpu/protein/_ff14sb.py`
containing dense numpy arrays. Torsion entries of kind "inferred" (value =
previous torsion - pi) are statically resolved to (source-slot, pi-offset)
pairs at generation time, which is possible because the "inferred" chain
structure is a static property of each amino acid's build recipe.

Run:  python tools/gen_build_tables.py
"""
import importlib.util
import math
import sys

import numpy as np

REF_SBI = "/root/reference/protein_transformer/protein/SidechainBuildInfo.py"

# Vocabulary order: 20 standard AAs sorted by 1-letter code, then pad, unk.
ONE_LETTER_ORDER = "ACDEFGHIKLMNPQRSTVWY"
THREE_LETTER = {
    "A": "ALA", "C": "CYS", "D": "ASP", "E": "GLU", "F": "PHE", "G": "GLY",
    "H": "HIS", "I": "ILE", "K": "LYS", "L": "LEU", "M": "MET", "N": "ASN",
    "P": "PRO", "Q": "GLN", "R": "ARG", "S": "SER", "T": "THR", "V": "VAL",
    "W": "TRP", "Y": "TYR",
}

MAX_SC_ATOMS = 10     # largest sidechain build recipe (TRP)
NUM_BB_ATOMS = 4      # N, CA, C, O
NUM_COORDS = 14       # atom slots per residue
N_TABLE_ROWS = 24     # 20 AAs + pad + unk + sos + eos (non-AA rows are zeroed)

# Point-buffer layout used by the vectorized sidechain builder:
#   0..2  = N, CA, C        3 = O        4..13 = sidechain atoms in build order
#   14    = anchor atom (previous residue's C; next residue's N for residue 0)
ANCHOR_IDX = 14

TORSION_CONST = 0     # torsion is a fixed chemical constant
TORSION_PRED = 1      # torsion is predicted (chi angle 6 + slot)


def load_reference_tables():
    spec = importlib.util.spec_from_file_location("_ref_sbi", REF_SBI)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.SC_BUILD_INFO, mod.BB_BUILD_INFO


def main():
    sc_info, bb_info = load_reference_tables()

    n_sc = np.zeros(N_TABLE_ROWS, np.int32)
    bond_len = np.zeros((N_TABLE_ROWS, MAX_SC_ATOMS), np.float32)
    bond_ang = np.zeros((N_TABLE_ROWS, MAX_SC_ATOMS), np.float32)
    tor_type = np.zeros((N_TABLE_ROWS, MAX_SC_ATOMS), np.int32)
    tor_const = np.zeros((N_TABLE_ROWS, MAX_SC_ATOMS), np.float32)
    tor_src = np.zeros((N_TABLE_ROWS, MAX_SC_ATOMS), np.int32)
    tor_pi_off = np.zeros((N_TABLE_ROWS, MAX_SC_ATOMS), np.float32)
    frame_idx = np.zeros((N_TABLE_ROWS, MAX_SC_ATOMS, 3), np.int32)
    atom_names = [["" for _ in range(NUM_COORDS)] for _ in range(N_TABLE_ROWS)]

    for aa_id, one in enumerate(ONE_LETTER_ORDER):
        rec = sc_info[THREE_LETTER[one]]
        names = rec["atom-names"]
        k = len(names)
        n_sc[aa_id] = k
        assert k <= MAX_SC_ATOMS

        # PDB atom-name map: backbone + sidechain build order
        for j, nm in enumerate(["N", "CA", "C", "O"] + list(names)):
            atom_names[aa_id][j] = nm

        # name -> point-buffer index for this AA
        name2idx = {"N": 0, "CA": 1, "C": 2}
        for j, nm in enumerate(names):
            name2idx[nm] = 4 + j

        for slot in range(k):
            bond_len[aa_id, slot] = rec["bonds-vals"][slot]
            bond_ang[aa_id, slot] = rec["angles-vals"][slot]

            t = rec["torsion-vals"][slot]
            if t == "p":
                assert slot < 6, "predicted torsion beyond chi capacity"
                tor_type[aa_id, slot] = TORSION_PRED
                tor_src[aa_id, slot] = slot
                tor_pi_off[aa_id, slot] = 0.0
            elif t == "i":
                # inferred: previous slot's resolved torsion minus pi
                prev = slot - 1
                assert prev >= 0
                tor_type[aa_id, slot] = tor_type[aa_id, prev]
                tor_const[aa_id, slot] = tor_const[aa_id, prev]
                tor_src[aa_id, slot] = tor_src[aa_id, prev]
                tor_pi_off[aa_id, slot] = tor_pi_off[aa_id, prev] + math.pi
            else:
                tor_type[aa_id, slot] = TORSION_CONST
                tor_const[aa_id, slot] = float(t)
                tor_src[aa_id, slot] = slot
                tor_pi_off[aa_id, slot] = 0.0

            # Frame atoms (a, b, c) for placing this atom. Slot 0 uses the
            # inter-residue anchor; the generic entry is the non-first-residue
            # form (prev-C, N, CA); residue 0's (next-N, C, CA) variant is
            # handled at build time.
            if slot == 0:
                frame_idx[aa_id, slot] = (ANCHOR_IDX, 0, 1)
            else:
                a, b, c, _d = rec["torsion-names"][slot].split("-")
                frame_idx[aa_id, slot] = (name2idx[a], name2idx[b], name2idx[c])

    # Rows for pad/unk/sos/eos stay all-zero (n_sc == 0 -> no atoms built),
    # but give them backbone atom names so PDB export of unknowns still works.
    for aa_id in range(len(ONE_LETTER_ORDER), N_TABLE_ROWS):
        for j, nm in enumerate(["N", "CA", "C", "O"]):
            atom_names[aa_id][j] = nm

    bb = {
        "c-n": bb_info["BONDLENS"]["c-n"],
        "n-ca": bb_info["BONDLENS"]["n-ca"],
        "ca-c": bb_info["BONDLENS"]["ca-c"],
        "c-o": bb_info["BONDLENS"]["c-o"],
        "c-oh": bb_info["BONDLENS"]["c-oh"],
        "ca-c-o": bb_info["BONDANGS"]["ca-c-o"],
        "ca-c-oh": bb_info["BONDANGS"]["ca-c-oh"],
        "n-ca-c-n": bb_info["BONDTORSIONS"]["n-ca-c-n"],
    }



    np.savez_compressed(
        "protein_transformer_tpu/protein/ff14sb_tables.npz",
        sc_num_atoms=n_sc, sc_bond_len=bond_len, sc_bond_ang=bond_ang,
        sc_torsion_type=tor_type, sc_torsion_const=tor_const,
        sc_torsion_src=tor_src, sc_torsion_pi_offset=tor_pi_off,
        sc_frame_idx=frame_idx,
        atom_names=np.array(atom_names, dtype="U4"),
        bb_names=np.array(list(bb.keys()), dtype="U12"),
        bb_values=np.array(list(bb.values()), np.float64))

    with open("protein_transformer_tpu/protein/_ff14sb.py", "w") as f:
        f.write('"""AMBER ff14SB build constants as dense arrays '
                '(GENERATED FILE).\n\n')
        f.write("Generated by tools/gen_build_tables.py from the AMBER ff14SB\n")
        f.write("forcefield constants (cf. reference SidechainBuildInfo.py:1-585 and\n")
        f.write("data/development/forcefields/). Arrays live in\n")
        f.write("ff14sb_tables.npz; do not edit by hand.\n\n")
        f.write("Array layout: rows indexed by vocabulary amino-acid id (0..19 =\n")
        f.write(f"{ONE_LETTER_ORDER!r}, 20=pad, 21=unk, 22=sos, 23=eos; non-AA rows zero).\n")
        f.write("Sidechain slots are in build order. Torsion resolution:\n")
        f.write("  type==1 (predicted): torsion = chi[src_slot] - pi_offset\n")
        f.write("  type==0 (constant):  torsion = const       - pi_offset\n")
        f.write('"""\n')
        f.write("import os\n\nimport numpy as np\n\n")
        f.write(f"MAX_SC_ATOMS = {MAX_SC_ATOMS}\n")
        f.write(f"ANCHOR_IDX = {ANCHOR_IDX}\n")
        f.write(f"TORSION_CONST = {TORSION_CONST}\n")
        f.write(f"TORSION_PRED = {TORSION_PRED}\n\n")
        f.write('_z = np.load(os.path.join(os.path.dirname(__file__),\n'
                '                          "ff14sb_tables.npz"))\n\n')
        f.write("SC_NUM_ATOMS = _z['sc_num_atoms']\n")
        f.write("SC_BOND_LEN = _z['sc_bond_len']\n")
        f.write("SC_BOND_ANG = _z['sc_bond_ang']\n")
        f.write("SC_TORSION_TYPE = _z['sc_torsion_type']\n")
        f.write("SC_TORSION_CONST = _z['sc_torsion_const']\n")
        f.write("SC_TORSION_SRC = _z['sc_torsion_src']\n")
        f.write("SC_TORSION_PI_OFFSET = _z['sc_torsion_pi_offset']\n")
        f.write("SC_FRAME_IDX = _z['sc_frame_idx']\n\n")
        f.write("# Backbone bond lengths/angles (radians, Angstroms)\n")
        f.write("BB_CONST = {str(k): float(v) for k, v in\n")
        f.write("            zip(_z['bb_names'], _z['bb_values'])}\n\n")
        f.write("# Per-AA atom names for the 14 coordinate slots (PDB export)\n")
        f.write("ATOM_NAMES_14 = [[str(n) for n in row]\n")
        f.write("                 for row in _z['atom_names']]\n")
    print("wrote protein_transformer_tpu/protein/_ff14sb.py")


if __name__ == "__main__":
    sys.exit(main())
