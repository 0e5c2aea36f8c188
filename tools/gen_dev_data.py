#!/usr/bin/env python
"""Generate the committed development dataset (examples/dev_data).

Analogue of the reference's data/development assets (reference:
data/development/helices.txt, helices_betasheets.txt;
scripts/create_development_datasets.py:17-48): a tiny frozen dataset of
secondary-structure-realistic chains for overfit/dev runs, plus helix and
helix+sheet ID-list files. No network or real PDB entries exist in this
environment, so chains are Ramachandran-realistic synthetics pushed through
the FULL offline path: angles -> geometry build -> PDB file on disk ->
acquisition parser -> measurement -> sin/cos -> create_data_dict -> native
shards (data/convert.py format).

    python tools/gen_dev_data.py            # writes examples/dev_data/
"""
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from protein_transformer_tpu.data.convert import convert  # noqa: E402
from protein_transformer_tpu.data.proteinnet import create_data_dict  # noqa: E402
from protein_transformer_tpu.protein import geometry, measure  # noqa: E402
from protein_transformer_tpu.protein.constants import (  # noqa: E402
    NUM_PREDICTED_ANGLES)
from protein_transformer_tpu.protein.pdb import PdbWriter  # noqa: E402
from protein_transformer_tpu.protein.vocab import STD_AAS, VOCAB  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       os.pardir, "examples", "dev_data")


def realistic_angles(rng, length, p_hel, p_sheet):
    """Ramachandran-clustered angles with controllable H/E/L composition."""
    ang = np.zeros((length, NUM_PREDICTED_ANGLES), np.float32)
    kinds = []
    while len(kinds) < length:
        kind = rng.choice(["H", "E", "L"],
                          p=[p_hel, p_sheet, 1.0 - p_hel - p_sheet])
        kinds.extend([kind] * int(rng.integers(4, 12)))
    kinds = kinds[:length]
    for i, k in enumerate(kinds):
        if k == "H":
            phi, psi, jit = -1.0, -0.82, 0.08       # -57, -47 deg
        elif k == "E":
            phi, psi, jit = -2.43, 2.36, 0.15       # -139, 135 deg
        else:
            phi = rng.uniform(-2.8, -0.5)
            psi = rng.uniform(-np.pi, np.pi)
            jit = 0.01
        ang[i, 0] = phi + rng.normal(0, jit)
        ang[i, 1] = psi + rng.normal(0, jit)
    omega = np.pi + rng.normal(0, 0.03, length)
    ang[:, 2] = np.where(omega > np.pi, omega - 2 * np.pi, omega)
    ang[:, 3] = 1.94 + rng.normal(0, 0.017, length)
    ang[:, 4] = 2.03 + rng.normal(0, 0.017, length)
    ang[:, 5] = 2.13 + rng.normal(0, 0.017, length)
    rot = rng.choice([-np.pi / 3, np.pi / 3, np.pi], size=(length, 6))
    ang[:, 6:] = rot + rng.normal(0, 0.12, (length, 6))
    return ang


def make_chain(rng, pid, p_hel, p_sheet, tmp):
    """angles -> build -> PDB on disk -> parse -> measure (full path)."""
    length = int(rng.integers(24, 64))
    seq = "".join(rng.choice(list(STD_AAS), size=length))
    ids = np.array([VOCAB[c] for c in seq], np.int32)
    ang = realistic_angles(rng, length, p_hel, p_sheet)
    crd = np.asarray(geometry.build_coords(jnp.asarray(ang),
                                           jnp.asarray(ids)))
    pdb_path = os.path.join(tmp, f"{pid}.pdb")
    PdbWriter(crd, seq).save_pdb(pdb_path, title=pid)
    seq2, crd2 = measure.pdb_to_record(pdb_path)
    assert seq2 == seq, pid
    measured = measure.coords_to_angles(crd2, ids)
    # NaN radians propagate to NaN sin/cos -- the reference's convention
    # for immeasurable angles survives the transform unchanged
    sincos = measure.angles_to_sincos(measured).astype(np.float32)
    return seq, sincos, crd2.reshape(-1, 3).astype(np.float32)


def main():
    rng = np.random.default_rng(20260817)
    helix_ids, mixed_ids = [], []
    chains = {}
    with tempfile.TemporaryDirectory() as tmp:
        for i in range(8):
            pid = f"HLX{i:02d}_1_A"
            chains[pid] = make_chain(rng, pid, 0.85, 0.0, tmp)
            helix_ids.append(pid)
        for i in range(8):
            pid = f"MIX{i:02d}_1_A"
            chains[pid] = make_chain(rng, pid, 0.45, 0.35, tmp)
            mixed_ids.append(pid)

    all_ids = helix_ids + mixed_ids
    order = rng.permutation(len(all_ids))
    train = [all_ids[i] for i in order[:12]]
    valid = [all_ids[i] for i in order[12:14]]
    test = [all_ids[i] for i in order[14:]]

    def split_of(ids):
        return {"seq": [chains[i][0] for i in ids],
                "ang": [chains[i][1] for i in ids],
                "crd": [chains[i][2] for i in ids],
                "ids": list(ids)}

    splits = {"train": split_of(train), "valid-70": split_of(valid),
              "test": split_of(test)}
    data = create_data_dict(splits, max_len=64)
    os.makedirs(OUT_DIR, exist_ok=True)
    convert(data, OUT_DIR)
    with open(os.path.join(OUT_DIR, "helices.txt"), "w") as f:
        f.write("\n".join(helix_ids) + "\n")
    with open(os.path.join(OUT_DIR, "helices_betasheets.txt"), "w") as f:
        f.write("\n".join(helix_ids[:4] + mixed_ids[:6]) + "\n")
    n = sum(len(s["seq"]) for s in splits.values())
    print(f"wrote {n} chains to {OUT_DIR}")


if __name__ == "__main__":
    main()
