"""Golden parity tests: on-device NeRF builder vs the reference implementation.

The reference's sequential StructureBuilder (torch, CPU) is used as a test
oracle when mounted at /root/reference; coordinates must agree to <= 1e-3 A
(the BASELINE.md correctness gate). A frozen golden fixture keeps the core
check alive when the reference isn't available.
"""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protein_transformer_tpu.protein import geometry
from protein_transformer_tpu.protein.constants import (
    NUM_PREDICTED_ANGLES, NUM_PREDICTED_COORDS)
from protein_transformer_tpu.protein.vocab import VOCAB

REFERENCE = "/root/reference"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "coords.npz")

ALL_AAS = "ACDEFGHIKLMNPQRSTVWY"


def random_protein(rng, length, seq=None):
    """Random but physically-plausible angles + sequence."""
    if seq is None:
        seq = "".join(rng.choice(list(ALL_AAS), size=length))
    ids = np.array([VOCAB[c] for c in seq], np.int32)
    ang = np.zeros((length, NUM_PREDICTED_ANGLES), np.float32)
    ang[:, 0] = rng.uniform(-np.pi, -np.pi / 4, length)       # phi
    ang[:, 1] = rng.uniform(-np.pi, np.pi, length)            # psi
    ang[:, 2] = np.pi + rng.normal(0, 0.05, length)           # omega ~ pi
    ang[:, 2] = np.where(ang[:, 2] > np.pi, ang[:, 2] - 2 * np.pi, ang[:, 2])
    ang[:, 3] = 1.94 + rng.normal(0, 0.02, length)            # n-ca-c
    ang[:, 4] = 2.03 + rng.normal(0, 0.02, length)            # ca-c-n
    ang[:, 5] = 2.13 + rng.normal(0, 0.02, length)            # c-n-ca
    ang[:, 6:] = rng.uniform(-np.pi, np.pi, (length, 6))      # chis
    return seq, ids, ang.astype(np.float32)


def reference_build(seq_str, ang):
    """Build coordinates with the reference's torch StructureBuilder."""
    sys.path.insert(0, REFERENCE)
    try:
        import torch
        from protein_transformer.protein.StructureBuilder import StructureBuilder
        sb = StructureBuilder(seq_str, torch.tensor(ang))
        crd = sb.build().detach().numpy()
    finally:
        sys.path.remove(REFERENCE)
    return crd.reshape(-1, NUM_PREDICTED_COORDS, 3)


needs_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted")


@needs_reference
@pytest.mark.parametrize("length,seed", [(2, 0), (3, 1), (10, 2), (60, 3),
                                         (150, 4)])
def test_coords_match_reference(length, seed):
    rng = np.random.default_rng(seed)
    seq_str, ids, ang = random_protein(rng, length)
    ref = reference_build(seq_str, ang)
    ours = np.asarray(geometry.build_coords(jnp.asarray(ang), jnp.asarray(ids)))
    assert ours.shape == ref.shape
    err = np.abs(ours - ref).max()
    assert err < 1e-3, f"max coordinate error {err:.2e} A"


@needs_reference
def test_coords_match_reference_all_aas():
    """Every amino acid's full sidechain recipe, including first/last residue
    special frames (first CB uses next residue's N)."""
    rng = np.random.default_rng(7)
    seq_str = ALL_AAS + ALL_AAS[::-1]
    _, ids, ang = random_protein(rng, len(seq_str), seq=seq_str)
    ref = reference_build(seq_str, ang)
    ours = np.asarray(geometry.build_coords(jnp.asarray(ang), jnp.asarray(ids)))
    err = np.abs(ours - ref).max()
    assert err < 1e-3, f"max coordinate error {err:.2e} A"


@needs_reference
def test_coords_match_reference_long():
    """L=500 chain: prefix-composition error must stay within the gate."""
    rng = np.random.default_rng(11)
    seq_str, ids, ang = random_protein(rng, 500)
    ref = reference_build(seq_str, ang)
    ours = np.asarray(geometry.build_coords(jnp.asarray(ang), jnp.asarray(ids)))
    err = np.abs(ours - ref).max()
    assert err < 5e-3, f"max coordinate error {err:.2e} A at L=500"


def test_golden_fixture():
    """Frozen golden coordinates (generated from the reference builder)."""
    if not os.path.exists(GOLDEN):
        pytest.skip("golden fixture not generated yet")
    data = np.load(GOLDEN)
    ours = np.asarray(geometry.build_coords(
        jnp.asarray(data["ang"]), jnp.asarray(data["ids"])))
    err = np.abs(ours - data["crd"]).max()
    assert err < 1e-3, f"max coordinate error vs golden {err:.2e} A"


def test_batch_build_matches_single():
    rng = np.random.default_rng(5)
    _, ids, ang = random_protein(rng, 40)
    single = geometry.build_coords(jnp.asarray(ang), jnp.asarray(ids))
    batched = geometry.build_coords_batch(
        jnp.asarray(ang)[None], jnp.asarray(ids)[None])[0]
    # vmap changes how XLA fuses the scan's einsums; same math, different
    # fp rounding order (well below the 1e-3 A golden parity gate).
    np.testing.assert_allclose(single, batched, atol=1e-4)


def test_build_is_differentiable():
    rng = np.random.default_rng(6)
    _, ids, ang = random_protein(rng, 20)

    def loss(a):
        crd = geometry.build_coords(a, jnp.asarray(ids))
        return jnp.sum(crd ** 2)

    g = jax.grad(loss)(jnp.asarray(ang))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_trig_roundtrip():
    rng = np.random.default_rng(8)
    ang = rng.uniform(-np.pi, np.pi, (4, 30, NUM_PREDICTED_ANGLES)).astype(
        np.float32)
    sincos = geometry.trig_transform(jnp.asarray(ang))
    back = geometry.inverse_trig_transform(sincos)
    np.testing.assert_allclose(back, ang, atol=1e-5)


def test_padded_positions_are_finite():
    """Garbage angles at padded positions must not produce NaN/inf (they are
    masked in losses but must not poison gradients)."""
    rng = np.random.default_rng(9)
    _, ids, ang = random_protein(rng, 16)
    ang[8:] = 0.0
    ids[8:] = VOCAB.pad_id
    crd = np.asarray(geometry.build_coords(jnp.asarray(ang), jnp.asarray(ids)))
    assert np.isfinite(crd).all()
