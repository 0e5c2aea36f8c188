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
    """L=500 chain vs the reference builder's own fp32 output.

    The 5e-3 gate here is dominated by the REFERENCE's error, not ours: its
    nerf forces every displacement vector to float32 (Structure.py:63) and
    compounds that rounding over ~1500 sequential steps, measuring 1.5e-3 A
    from a true float64 oracle at L=500 -- while the associative-scan builder
    measures 7.2e-5 A (see test_long_chain_f64_oracle, which enforces the
    real <=1e-3 gate against exact arithmetic)."""
    rng = np.random.default_rng(11)
    seq_str, ids, ang = random_protein(rng, 500)
    ref = reference_build(seq_str, ang)
    ours = np.asarray(geometry.build_coords(jnp.asarray(ang), jnp.asarray(ids)))
    err = np.abs(ours - ref).max()
    assert err < 5e-3, f"max coordinate error {err:.2e} A at L=500"


def _f64_oracle_backbone(ang: np.ndarray) -> np.ndarray:
    """True float64 sequential-NeRF mainchain+O oracle (no per-step f32
    rounding -- unlike reference Structure.py:63). Returns (L, 4, 3)."""
    ang = ang.astype(np.float64)

    def nerf64(a, b, c, l, theta, chi):
        w = b - a
        w = w / np.linalg.norm(w)
        x = c - b
        x = x / np.linalg.norm(x)
        z = np.cross(w, x)
        z = z / np.linalg.norm(z)
        y = np.cross(z, x)
        d = np.array([-l * np.cos(theta), l * np.sin(theta) * np.cos(chi),
                      l * np.sin(theta) * np.sin(chi)])
        return c + np.stack([x, y, z], axis=1) @ d

    from protein_transformer_tpu.protein._ff14sb import BB_CONST as BL
    L = len(ang)
    n0 = np.array([0.0, 0.0, 0.001])
    ca0 = n0 + np.array([BL["n-ca"], 0.0, 0.0])
    t13 = np.pi - ang[0, 3]
    c0 = ca0 + BL["ca-c"] * np.array([np.cos(t13), np.sin(t13), 0.0])
    pts = [n0, ca0, c0]
    for i in range(1, L):
        pts.append(nerf64(*pts[-3:], BL["c-n"], ang[i - 1, 4], ang[i - 1, 1]))
        pts.append(nerf64(*pts[-3:], BL["n-ca"], ang[i - 1, 5], ang[i - 1, 2]))
        pts.append(nerf64(*pts[-3:], BL["ca-c"], ang[i, 3], ang[i, 0]))
    bb = np.array(pts).reshape(L, 3, 3)
    o = np.stack([nerf64(bb[i, 0], bb[i, 1], bb[i, 2], BL["c-o"],
                         BL["ca-c-o"], ang[i, 1] - np.pi) for i in range(L)])
    return np.concatenate([bb, o[:, None]], axis=1)


def test_long_chain_f64_oracle():
    """The BASELINE.md <=1e-3 A gate at L=500, enforced against EXACT
    arithmetic: a float64 sequential-NeRF oracle. The fp32 associative-scan
    builder measures ~7e-5 A here (gate 3e-4 for headroom); the composition
    algebra itself is an identity (1.7e-12 A when run in f64)."""
    rng = np.random.default_rng(11)
    _, ids, ang = random_protein(rng, 500)
    truth = _f64_oracle_backbone(ang)
    ours = np.asarray(geometry.build_backbone(jnp.asarray(ang)))
    err = np.abs(ours - truth).max()
    assert err < 3e-4, f"fp32 scan error vs f64 oracle {err:.2e} A at L=500"


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


def test_untrained_model_angles_match_f64_oracle():
    """Full-range GARBAGE angles (what an untrained model emits: bond
    angles anywhere in [-pi, pi], including sin(theta) < 0) vs the exact
    sequential oracle. Regression for the extension_transform handedness
    bug: the closed-form frame divides by |sin(theta)|, and dropping the
    sign silently flipped the y'/z' axes for theta < 0 -- invisible on
    physical angles, an ~18% ln-dRMSD error on an untrained model's
    output (caught by test_optim_trajectory's dRMSD cases)."""
    rng = np.random.default_rng(23)
    ang = rng.uniform(-np.pi, np.pi, (200, 12)).astype(np.float32)
    truth = _f64_oracle_backbone(ang)
    ours = np.asarray(geometry.build_backbone(jnp.asarray(ang)))
    err = np.abs(ours - truth).max()
    assert err < 3e-3, f"fp32 scan error vs f64 oracle {err:.2e} A (garbage)"


@needs_reference
def test_untrained_model_coords_match_reference():
    """Full 14-slot build on full-range angles vs the reference builder."""
    rng = np.random.default_rng(29)
    seq_str = "".join(rng.choice(list(ALL_AAS), size=48))
    ids = np.array([VOCAB[c] for c in seq_str], np.int32)
    ang = rng.uniform(-np.pi, np.pi, (48, 12)).astype(np.float32)
    ref = reference_build(seq_str, ang)
    ours = np.asarray(geometry.build_coords(jnp.asarray(ang),
                                            jnp.asarray(ids)))
    err = np.abs(ours - ref).max()
    assert err < 1e-3, f"max coordinate error {err:.2e} A (garbage angles)"
