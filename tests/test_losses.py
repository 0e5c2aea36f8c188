"""Loss parity and property tests.

Differential testing against the reference torch implementation (mounted at
/root/reference) plus self-contained property tests mirroring the reference's
own loss test strategy (reference: tests/test_losses.py:11-228).
"""
import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from protein_transformer_tpu import losses as L
from protein_transformer_tpu.protein.constants import (
    NUM_PREDICTED_ANGLES, NUM_PREDICTED_COORDS)
from protein_transformer_tpu.protein.vocab import VOCAB

REFERENCE = "/root/reference"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted")


def _import_reference_losses():
    """Import the reference losses module, stubbing its wandb/prody deps."""
    for name in ("wandb", "prody"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.path.insert(0, REFERENCE)
    try:
        import protein_transformer.losses as ref_losses
    finally:
        sys.path.remove(REFERENCE)
    return ref_losses


def make_angle_batch(rng, b=3, l=20, n_pad=4, n_nan=5):
    """Reference-convention angle batch: zeros = batch pad, NaN = missing."""
    true = rng.uniform(-0.99, 0.99,
                       (b, l, NUM_PREDICTED_ANGLES * 2)).astype(np.float32)
    pred = rng.uniform(-0.99, 0.99, true.shape).astype(np.float32)
    true[:, l - n_pad:, :] = 0.0
    for _ in range(n_nan):
        bi = rng.integers(b)
        li = rng.integers(l - n_pad)
        true[bi, li] = np.nan
    return pred, true


def masks_from_reference_convention(true):
    """Masks per the reference's two-stage filter (losses.py:208-214)."""
    row = (np.nan_to_num(true) != 0).any(axis=-1)
    elem = row[..., None] & ~np.isnan(true)
    clean = np.nan_to_num(true)
    return clean, elem


@needs_reference
@pytest.mark.parametrize("bb,sc", [(False, False), (True, False), (False, True)])
def test_mse_over_angles_parity(bb, sc):
    import torch
    ref_losses = _import_reference_losses()
    rng = np.random.default_rng(0)
    pred, true = make_angle_batch(rng)
    ref = ref_losses.mse_over_angles(
        torch.tensor(pred), torch.tensor(true), bb_only=bb, sc_only=sc).item()
    clean, mask = masks_from_reference_convention(true)
    ours = float(L.mse_over_angles(
        jnp.asarray(pred), jnp.asarray(clean), jnp.asarray(mask),
        bb_only=bb, sc_only=sc))
    assert abs(ours - ref) < 1e-5, f"{ours} vs {ref}"


@needs_reference
def test_drmsd_parity_unmasked():
    import torch
    ref_losses = _import_reference_losses()
    rng = np.random.default_rng(1)
    n = 70
    a = rng.normal(0, 10, (n, 3)).astype(np.float32)
    b = rng.normal(0, 10, (n, 3)).astype(np.float32)
    ref = ref_losses.drmsd(torch.tensor(a), torch.tensor(b)).item()
    ours = float(L.drmsd_masked(
        jnp.asarray(a), jnp.asarray(b), jnp.ones(n, bool)))
    assert abs(ours - ref) < 1e-3, f"{ours} vs {ref}"


@needs_reference
def test_drmsd_parity_masked_equals_compacted():
    """Masked dRMSD over the full array == reference dRMSD over the compacted
    valid atoms (the reference removes missing atoms before comparing,
    losses.py:74-79)."""
    import torch
    ref_losses = _import_reference_losses()
    rng = np.random.default_rng(2)
    n = 90
    a = rng.normal(0, 10, (n, 3)).astype(np.float32)
    b = rng.normal(0, 10, (n, 3)).astype(np.float32)
    mask = rng.random(n) > 0.3
    ref = ref_losses.drmsd(torch.tensor(a[mask]), torch.tensor(b[mask])).item()
    ours = float(L.drmsd_masked(jnp.asarray(a), jnp.asarray(b),
                                jnp.asarray(mask)))
    assert abs(ours - ref) < 1e-3, f"{ours} vs {ref}"


@needs_reference
def test_batch_drmsd_parity_end_to_end():
    """Full pipeline: predicted sin/cos -> coords -> dRMSD family, vs the
    reference's sequential per-protein path (losses.py:49-98,133-172)."""
    import torch
    ref_losses = _import_reference_losses()
    from tests.test_geometry import random_protein

    rng = np.random.default_rng(3)
    b, lmax = 3, 30
    lengths = [30, 24, 18]
    seqs = np.full((b, lmax), VOCAB.pad_id, np.int64)
    sincos = np.zeros((b, lmax, NUM_PREDICTED_ANGLES * 2), np.float32)
    true_crd = np.zeros((b, lmax * NUM_PREDICTED_COORDS, 3), np.float32)

    for i, li in enumerate(lengths):
        seq_str, ids, ang = random_protein(rng, li)
        seqs[i, :li] = ids
        sc = np.stack([np.cos(ang), np.sin(ang)], -1).reshape(li, -1)
        sincos[i, :li] = sc
        # true coords: perturbed angles run through the reference builder
        ang_t = (ang + rng.normal(0, 0.1, ang.shape)).astype(np.float32)
        from tests.test_geometry import reference_build
        crd = reference_build(seq_str, ang_t).reshape(-1, 3)
        true_crd[i, :crd.shape[0]] = crd
        # sprinkle missing atoms
        miss = rng.integers(0, crd.shape[0], 10)
        true_crd[i, miss] = np.nan

    res = ref_losses.compute_batch_drmsd(
        torch.tensor(sincos), torch.tensor(true_crd), torch.tensor(seqs),
        do_backward=False, pool=None)
    ref_d, ref_lnd, ref_bb, ref_lnbb = [float(x) for x in res]

    # Build explicit masks: atom exists if residue < length and coord not NaN.
    crd4 = true_crd.reshape(b, lmax, NUM_PREDICTED_COORDS, 3)
    res_valid = seqs != VOCAB.pad_id
    atom_mask = res_valid[:, :, None] & ~np.isnan(crd4).any(-1)
    ours = L.compute_batch_drmsd(
        jnp.asarray(sincos), jnp.asarray(np.nan_to_num(crd4)),
        jnp.asarray(seqs), jnp.asarray(atom_mask))
    assert abs(float(ours.drmsd) - ref_d) < 2e-3, (float(ours.drmsd), ref_d)
    assert abs(float(ours.ln_drmsd) - ref_lnd) < 1e-5
    assert abs(float(ours.drmsd_bb) - ref_bb) < 2e-3
    assert abs(float(ours.ln_drmsd_bb) - ref_lnbb) < 1e-5


def test_batch_drmsd_backbone_only_semantics():
    """backbone_only reproduces the reference's --backbone_loss behavior
    (losses.py:69-71): every statistic -- including the 'full' slots --
    equals the backbone-reduced computation."""
    from tests.test_geometry import random_protein
    rng = np.random.default_rng(7)
    b, lmax = 2, 20
    seqs = np.full((b, lmax), VOCAB.pad_id, np.int64)
    sincos = np.zeros((b, lmax, NUM_PREDICTED_ANGLES * 2), np.float32)
    crd4 = rng.normal(size=(b, lmax, NUM_PREDICTED_COORDS, 3)) \
        .astype(np.float32) * 5
    for i, li in enumerate((20, 14)):
        _, ids, ang = random_protein(rng, li)
        seqs[i, :li] = ids
        sincos[i, :li] = np.stack([np.cos(ang), np.sin(ang)],
                                  -1).reshape(li, -1)
    res_valid = seqs != VOCAB.pad_id
    atom_mask = np.repeat(res_valid[:, :, None], NUM_PREDICTED_COORDS, 2)
    args = (jnp.asarray(sincos), jnp.asarray(crd4), jnp.asarray(seqs),
            jnp.asarray(atom_mask))
    full = L.compute_batch_drmsd(*args)
    bb = L.compute_batch_drmsd(*args, backbone_only=True)
    # 'full' slots report backbone values...
    assert float(bb.drmsd) == pytest.approx(float(full.drmsd_bb), rel=1e-6)
    assert float(bb.ln_drmsd) == pytest.approx(float(full.ln_drmsd_bb),
                                               rel=1e-6)
    # ...and bb slots are unchanged
    assert float(bb.drmsd_bb) == pytest.approx(float(full.drmsd_bb),
                                               rel=1e-6)
    # genuinely-full differs from backbone on random coords
    assert abs(float(full.drmsd) - float(full.drmsd_bb)) > 1e-3


def test_combine_drmsd_mse():
    # Parity: losses.combine_drmsd_mse arithmetic (losses.py:15-23).
    for d, mse, w in [(1.0, 1.0, 0.5), (0.02, 0.01, 0.5), (3.0, 0.2, 0.8)]:
        got = float(L.combine_drmsd_mse(jnp.float32(d), jnp.float32(mse), w))
        want = w * (d / 0.02) + (1 - w) * (mse / 0.01)
        assert abs(got - want) < 1e-5


def test_drmsd_zero_on_identical():
    rng = np.random.default_rng(4)
    a = rng.normal(0, 5, (50, 3)).astype(np.float32)
    val = float(L.drmsd_masked(jnp.asarray(a), jnp.asarray(a),
                               jnp.ones(50, bool)))
    assert val < 1e-4


def test_drmsd_not_permutation_invariant():
    # Mirrors the reference's own property test (tests/test_losses.py:162-174).
    rng = np.random.default_rng(5)
    a = rng.normal(0, 5, (40, 3)).astype(np.float32)
    b = a[::-1].copy()
    val = float(L.drmsd_masked(jnp.asarray(a), jnp.asarray(b),
                               jnp.ones(40, bool)))
    assert val > 1e-2


def test_drmsd_vs_naive():
    """Differential test against a brute-force O(N^2) implementation,
    mirroring reference tests/test_losses.py:58-89 (lazy_drmsd)."""
    rng = np.random.default_rng(6)
    n = 37
    a = rng.normal(0, 8, (n, 3))
    b = rng.normal(0, 8, (n, 3))
    mask = rng.random(n) > 0.25
    diffs = []
    for i in range(n):
        for j in range(i + 1, n):
            if mask[i] and mask[j]:
                da = np.linalg.norm(a[i] - a[j])
                db = np.linalg.norm(b[i] - b[j])
                diffs.append((da - db) ** 2)
    want = np.sqrt(np.mean(diffs))
    got = float(L.drmsd_masked(jnp.asarray(a, jnp.float32),
                               jnp.asarray(b, jnp.float32),
                               jnp.asarray(mask)))
    assert abs(got - want) < 1e-3


def test_mse_zero_case():
    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, (2, 10, 24)).astype(np.float32)
    mask = np.ones_like(x, bool)
    assert float(L.mse_over_angles(jnp.asarray(x), jnp.asarray(x),
                                   jnp.asarray(mask))) == 0.0


def test_kabsch_rmsd_zero_after_rigid_motion():
    rng = np.random.default_rng(8)
    a = rng.normal(0, 5, (30, 3))
    # random rotation + translation
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    b = a @ q.T + rng.normal(0, 10, 3)
    assert L.kabsch_rmsd(a, b) < 1e-6


def test_golden_losses_fixture():
    """Frozen reference loss values (generated from the reference torch
    implementation; keeps parity coverage when the reference isn't mounted)."""
    path = os.path.join(os.path.dirname(__file__), "golden", "losses.npz")
    if not os.path.exists(path):
        pytest.skip("golden losses fixture not generated")
    g = np.load(path)
    clean, mask = masks_from_reference_convention(g["true"])
    got = float(L.mse_over_angles(jnp.asarray(g["pred"]), jnp.asarray(clean),
                                  jnp.asarray(mask)))
    assert abs(got - float(g["mse_full"])) < 1e-6
    got_bb = float(L.mse_over_angles(jnp.asarray(g["pred"]),
                                     jnp.asarray(clean), jnp.asarray(mask),
                                     bb_only=True))
    assert abs(got_bb - float(g["mse_bb"])) < 1e-6
    got_sc = float(L.mse_over_angles(jnp.asarray(g["pred"]),
                                     jnp.asarray(clean), jnp.asarray(mask),
                                     sc_only=True))
    assert abs(got_sc - float(g["mse_sc"])) < 1e-6
    got_d = float(L.drmsd_masked(jnp.asarray(g["a"]), jnp.asarray(g["b"]),
                                 jnp.asarray(g["mask"])))
    assert abs(got_d - float(g["drmsd"])) < 1e-4
