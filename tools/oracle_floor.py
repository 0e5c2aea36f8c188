#!/usr/bin/env python
"""Irreducible-dRMSD floor of the gen_scale_data distribution.

The scale dataset's coil residues draw psi uniformly (gen_scale_data.RAMA),
so even a Bayes-optimal model cannot predict them from sequence. This tool
quantifies the resulting floor: for each sampled chain it draws TWO
independent angle sets conditioned on the SAME sequence + segment labels
(i.e. two samples from the generator's conditional p(structure | sequence)),
builds both structures, and reports the mean pairwise dRMSD. A trained
model's valid-split dRMSD should be compared against this number, not 0.

Run: python tools/oracle_floor.py [--n 20] [--len 150] [--seed 1]
"""
import argparse
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.gen_scale_data import RAMA, POOLS, _aa_rotamers, build_coords_batch
from protein_transformer_tpu.protein.constants import (
    NUM_PREDICTED_ANGLES, NUM_PREDICTED_COORDS)
from protein_transformer_tpu.protein.vocab import VOCAB
from protein_transformer_tpu.losses import drmsd_masked


def sample_kinds_seq(rng, length):
    kinds, seq = [], []
    while len(kinds) < length:
        k = rng.choice(["H", "E", "L"], p=[0.40, 0.30, 0.30])
        seg = int(rng.integers(4, 13)) if k != "L" else int(rng.integers(2, 6))
        kinds.extend([k] * seg)
        seq.extend(rng.choice(POOLS[k], size=seg))
    return kinds[:length], "".join(seq[:length])


def sample_angles(rng, kinds, ids, rotamers):
    length = len(kinds)
    ang = np.zeros((length, NUM_PREDICTED_ANGLES), np.float32)
    for i, k in enumerate(kinds):
        phi, psi, jit = RAMA[k]
        if phi is None:
            phi = rng.uniform(-2.8, -0.5)
            psi = rng.uniform(-np.pi, np.pi)
        ang[i, 0] = phi + rng.normal(0, jit)
        ang[i, 1] = psi + rng.normal(0, jit)
    omega = np.pi + rng.normal(0, 0.03, length)
    ang[:, 2] = np.where(omega > np.pi, omega - 2 * np.pi, omega)
    ang[:, 3] = 1.94 + rng.normal(0, 0.017, length)
    ang[:, 4] = 2.03 + rng.normal(0, 0.017, length)
    ang[:, 5] = 2.13 + rng.normal(0, 0.017, length)
    ang[:, 6:] = rotamers[ids] + rng.normal(0, 0.10, (length, 6))
    ang[:, 6:] = np.where(ang[:, 6:] > np.pi, ang[:, 6:] - 2 * np.pi,
                          ang[:, 6:])
    return ang


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--len", dest="length", type=int, default=150)
    ap.add_argument("--seed", type=int, default=20260819)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    rotamers = _aa_rotamers(np.random.default_rng(args.seed))
    build = jax.jit(build_coords_batch)
    vals = []
    for _ in range(args.n):
        kinds, seq = sample_kinds_seq(rng, args.length)
        ids = np.array([VOCAB[c] for c in seq], np.int32)
        a1 = sample_angles(rng, kinds, ids, rotamers)
        a2 = sample_angles(rng, kinds, ids, rotamers)
        crd = np.asarray(build(jnp.asarray(np.stack([a1, a2])),
                               jnp.asarray(np.stack([ids, ids]))))
        crd = crd.reshape(2, args.length * NUM_PREDICTED_COORDS, 3)
        valid = (np.linalg.norm(crd[0], axis=-1) > 1e-8) & \
                (np.linalg.norm(crd[1], axis=-1) > 1e-8)
        d = float(drmsd_masked(jnp.asarray(crd[0]), jnp.asarray(crd[1]),
                               jnp.asarray(valid)))
        vals.append(d)
    print(f"conditional-resample dRMSD floor (n={args.n}, L={args.length}): "
          f"mean {np.mean(vals):.2f} A, median {np.median(vals):.2f}, "
          f"min {np.min(vals):.2f}, max {np.max(vals):.2f}")


if __name__ == "__main__":
    main()
