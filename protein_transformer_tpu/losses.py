"""Training and evaluation losses, fully on-device.

TPU-native rework of the reference losses (reference: losses.py:15-286).
The reference ships each protein of a batch to a forked CPU worker that
rebuilds coordinates with sequential NeRF, computes dRMSD, runs a local
``backward`` and stitches the angle-gradients back into the device graph
(losses.py:49-172). Here the coordinate rebuild (``protein.geometry``) and the
masked pairwise-distance reductions compile into the training step, so the
whole loss is one differentiable jit region with zero host round-trips.

Masking contract (replacing the reference's NaN/zero-padding conventions,
dataset.py:26-54 / docs ProjectNotes): arrays carry explicit boolean masks.
  * angle element mask: True where the target angle exists (residue is inside
    the protein and not a missing-residue NaN in the source data);
  * atom mask: (L, 14) True where the true coordinate exists.
Masked reductions reproduce the reference's compact-then-reduce semantics
exactly, because compaction preserves pairwise distances and index order.

Gradient-semantics note: when training on dRMSD-family losses, the reference
always injects the gradient of the *sum over proteins of per-protein
ln-dRMSD*, regardless of which scalar it reports (losses.py:91-92,166-167) --
and for the "combined" loss the dRMSD term's z-scale weight never reaches the
stitched gradient (train.py:78-86). This framework differentiates exactly the
scalar it optimizes (mean over proteins) by default, which changes only the
effective learning-rate scaling of those modes; ``--grad_semantics reference``
(config.grad_semantics) reproduces the reference's stitched-gradient behavior
bit-for-bit in the trainer (see training.trainer.compute_losses), and an A/B
on the dev dataset showed the two converge equivalently (STATUS.md round 3).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from protein_transformer_tpu.protein.constants import (
    NUM_PREDICTED_ANGLES, NUM_PREDICTED_COORDS, SC_ANGLES_START_POS)
from protein_transformer_tpu.protein.geometry import (
    build_coords_batch, inverse_trig_transform)

# Squared-distance clamp matching the reference (losses.py:252).
_DIST_CLAMP = 1e-30
# Row-block size for the tiled pairwise-distance reduction.
_DRMSD_BLOCK = 512
# Distance matmuls need full float32: TPU's default bfloat16 matmul precision
# would put ~4e-3 relative error on coordinates, far above the 1e-3 A gate.
_HIGHEST = jax.lax.Precision.HIGHEST


def mse_over_angles(pred: jax.Array, true: jax.Array, mask: jax.Array,
                    bb_only: bool = False, sc_only: bool = False) -> jax.Array:
    """Masked MSE between angle tensors (sin/cos 24-d or radian 12-d).

    pred/true: (B, L, A); mask: (B, L, A) True where the target element
    exists. Parity: losses.mse_over_angles (losses.py:175-214) -- the mean is
    taken over the selected *elements*, after optional backbone/sidechain
    slicing keyed on SC_ANGLES_START_POS.
    """
    a = pred.shape[-1]
    if a == NUM_PREDICTED_ANGLES * 2:
        split = SC_ANGLES_START_POS * 2
    elif a == NUM_PREDICTED_ANGLES:
        split = SC_ANGLES_START_POS
    else:
        raise ValueError(f"Unknown angle tensor shape {pred.shape}")
    if bb_only:
        pred, true, mask = pred[..., :split], true[..., :split], mask[..., :split]
    elif sc_only:
        pred, true, mask = pred[..., split:], true[..., split:], mask[..., split:]

    sq = jnp.where(mask, (pred - true) ** 2, 0.0)
    count = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(sq) / count


def pairwise_internal_dist(x: jax.Array) -> jax.Array:
    """All pairwise distances of (N, 3) points, clamped like the reference.

    Parity: losses.pairwise_internal_dist (losses.py:233-253). Used for tests
    and small inputs; the training path uses the tiled ``_drmsd_stats``.
    """
    sq = jnp.sum(x * x, axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * jnp.matmul(x, x.T, precision=_HIGHEST)
    return jnp.sqrt(jnp.clip(d2, _DIST_CLAMP))


def _dist_block(x_blk: jax.Array, x: jax.Array) -> jax.Array:
    """Distances from a row block (T, 3) to all points (N, 3) -> (T, N)."""
    sq_blk = jnp.sum(x_blk * x_blk, axis=-1)
    sq = jnp.sum(x * x, axis=-1)
    d2 = sq_blk[:, None] + sq[None, :] - 2.0 * jnp.matmul(x_blk, x.T, precision=_HIGHEST)
    return jnp.sqrt(jnp.clip(d2, _DIST_CLAMP))


def _drmsd_stats(a: jax.Array, b: jax.Array,
                 mask: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(sum of (Da_ij - Db_ij)^2, pair count) over valid upper-tri pairs.

    a, b: (N, 3); mask: (N,) bool. Tiled over row blocks with rematerialized
    distance computation so the (N, N) matrices never hit HBM whole and the
    backward pass recomputes them blockwise.
    """
    n = a.shape[0]
    block = min(_DRMSD_BLOCK, n)
    n_pad = ((n + block - 1) // block) * block
    pad = n_pad - n
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad, 3), a.dtype)])
        b = jnp.concatenate([b, jnp.zeros((pad, 3), b.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros((pad,), bool)])
    col_idx = jnp.arange(n_pad)
    fmask = mask.astype(a.dtype)

    @jax.checkpoint
    def body(carry, start):
        s, c = carry
        a_blk = jax.lax.dynamic_slice(a, (start, 0), (block, 3))
        b_blk = jax.lax.dynamic_slice(b, (start, 0), (block, 3))
        m_blk = jax.lax.dynamic_slice(fmask, (start,), (block,))
        da = _dist_block(a_blk, a)
        db = _dist_block(b_blk, b)
        row_idx = start + jnp.arange(block)
        pair_m = (m_blk[:, None] * fmask[None, :]
                  * (row_idx[:, None] < col_idx[None, :]))
        s = s + jnp.sum((da - db) ** 2 * pair_m)
        c = c + jnp.sum(pair_m)
        return (s, c), None

    starts = jnp.arange(0, n_pad, block)
    (s, c), _ = jax.lax.scan(body, (jnp.zeros((), a.dtype), jnp.zeros((), a.dtype)),
                             starts)
    return s, c


def drmsd_masked(a: jax.Array, b: jax.Array, mask: jax.Array,
                 impl: str = "xla") -> jax.Array:
    """Masked dRMSD = sqrt(mean over valid i<j pairs of (Da - Db)^2).

    Parity: losses.drmsd (losses.py:256-278) computed on the compacted valid
    atoms of a single protein. impl: "xla" (tiled scan, default) or "pallas"
    (fused kernel, TPU only).
    """
    if impl == "pallas":
        from protein_transformer_tpu.ops.drmsd_pallas import (
            drmsd_stats_pallas)
        s, c = drmsd_stats_pallas(a, b, mask)
    else:
        s, c = _drmsd_stats(a, b, mask)
    # clamp before sqrt: at s == 0 (identical/empty point sets -- e.g. padded
    # dummy batch rows) sqrt's infinite slope would emit NaN cotangents even
    # under zero downstream weights. The 1e-15 value floor is far below any
    # physical dRMSD.
    return jnp.sqrt(jnp.maximum(s / jnp.maximum(c, 1.0), _DIST_CLAMP))


class DrmsdResults(NamedTuple):
    """Per-batch mean dRMSD statistics (each a scalar)."""
    drmsd: jax.Array
    ln_drmsd: jax.Array
    drmsd_bb: jax.Array
    ln_drmsd_bb: jax.Array


def _per_protein_drmsd(pred_crd: jax.Array, true_crd: jax.Array,
                       atom_mask: jax.Array, impl: str = "xla",
                       backbone_only: bool = False) -> tuple[jax.Array, ...]:
    """dRMSD stats for one protein: (L, 14, 3) coords, (L, 14) atom mask.

    backbone_only reproduces the reference's --backbone_loss behavior
    (losses.py:69-71): coordinates are reduced to the backbone BEFORE any
    dRMSD, so the 'full' statistics equal the backbone ones and the
    O((14L)^2) full-atom sweep is never built.
    """
    # Backbone = first 3 slots (N, CA, C) of each residue
    # (structure_utils.get_backbone_from_full_coords:19-32). Compact to the
    # 3L backbone atoms before the pair sweep -- compaction preserves pair
    # order and distances, and the (3L)^2 sweep does ~22x less distance work
    # than masking 11/14 slots of the full (14L)^2 sweep. Keeping full and
    # bb as SEPARATE kernels also lets XLA dead-code-eliminate whichever
    # backward carries no gradient (e.g. the full-atom backward under
    # --backbone_loss); a fused two-mask kernel was measured 3 ms/step
    # slower on the dm=1024/L=500 backbone config for exactly that reason.
    a_bb = pred_crd[:, :3, :].reshape(-1, 3)
    b_bb = true_crd[:, :3, :].reshape(-1, 3)
    m_bb = atom_mask[:, :3].reshape(-1)
    bb = drmsd_masked(a_bb, b_bb, m_bb, impl)
    n_atoms_bb = jnp.maximum(jnp.sum(m_bb), 1)
    if backbone_only:
        return bb, bb / n_atoms_bb, bb, bb / n_atoms_bb
    n = pred_crd.shape[0] * NUM_PREDICTED_COORDS
    a = pred_crd.reshape(n, 3)
    b = true_crd.reshape(n, 3)
    m = atom_mask.reshape(n)
    full = drmsd_masked(a, b, m, impl)
    n_atoms = jnp.maximum(jnp.sum(m), 1)
    return full, full / n_atoms, bb, bb / n_atoms_bb


def compute_batch_drmsd(pred_sincos: jax.Array, true_crd: jax.Array,
                        seq: jax.Array, atom_mask: jax.Array,
                        protein_mask: jax.Array | None = None,
                        impl: str = "xla",
                        pred_crd: jax.Array | None = None,
                        with_per_protein: bool = False,
                        backbone_only: bool = False):
    """Batch-mean dRMSD family losses, differentiable end-to-end.

    pred_sincos: (B, L, 24) model output; true_crd: (B, L, 14, 3) with
    missing atoms zero-filled; seq: (B, L) AA ids; atom_mask: (B, L, 14);
    protein_mask: optional (B,) bool marking real rows -- padded dummy rows
    (added for static batch shapes) are excluded from the batch mean.

    Replaces the reference's CPU-pool gradient stitching
    (losses.py:133-172): angles -> coordinates (on-device NeRF) -> masked
    pairwise reductions, averaged over the batch as in losses.py:169-172.
    with_per_protein additionally returns the unreduced (B,) statistics
    (used by the reference-faithful gradient-semantics mode).
    backbone_only: reference --backbone_loss semantics -- every statistic
    (including the 'full' slots) is computed on backbone-reduced
    coordinates (reference losses.py:69-71).
    """
    if pred_crd is None:
        angles = inverse_trig_transform(pred_sincos)
        pred_crd = build_coords_batch(angles, seq)
    per_protein = functools.partial(_per_protein_drmsd, impl=impl,
                                    backbone_only=backbone_only)
    full, ln, bb, ln_bb = jax.vmap(per_protein)(
        pred_crd, true_crd, atom_mask)
    if protein_mask is None:
        mean = jnp.mean
    else:
        w = protein_mask.astype(full.dtype)
        denom = jnp.maximum(jnp.sum(w), 1.0)
        mean = lambda v: jnp.sum(v * w) / denom
    res = DrmsdResults(mean(full), mean(ln), mean(bb), mean(ln_bb))
    if with_per_protein:
        return res, DrmsdResults(full, ln, bb, ln_bb)
    return res


def combine_drmsd_mse(d: jax.Array, mse: jax.Array, w: float = 0.5,
                      lndrmsd_norm: float = 0.02,
                      mse_norm: float = 0.01) -> jax.Array:
    """z-scaled combination of ln-dRMSD and angle MSE.

    Parity: losses.combine_drmsd_mse (losses.py:15-23).
    """
    return w * (d / lndrmsd_norm) + (1 - w) * (mse / mse_norm)


def kabsch_rmsd_masked(a: jax.Array, b: jax.Array, w: jax.Array) -> jax.Array:
    """On-device superposition RMSD of masked point sets (eval metric).

    a, b: (N, 3); w: (N,) 0/1 weights. Weighted Kabsch: align a onto b over
    the selected points and return their RMSD. Replaces the reference's
    host-side ProDy call (losses.py:281-286) with a jit-friendly 3x3 SVD.
    """
    w = w.astype(a.dtype)
    total = jnp.maximum(jnp.sum(w), 1.0)
    am = jnp.sum(a * w[:, None], 0) / total
    bm = jnp.sum(b * w[:, None], 0) / total
    ac = (a - am) * w[:, None]
    bc = (b - bm) * w[:, None]
    h = jnp.matmul(ac.T, bc, precision=_HIGHEST)
    u, _s, vt = jnp.linalg.svd(h)
    d = jnp.sign(jnp.linalg.det(jnp.matmul(u, vt, precision=_HIGHEST)))
    rot = jnp.matmul(u * jnp.array([1.0, 1.0, 1.0], a.dtype).at[2].set(d),
                     vt, precision=_HIGHEST)
    aligned = jnp.matmul(a - am, rot, precision=_HIGHEST)
    diff = (aligned - (b - bm)) * w[:, None]
    return jnp.sqrt(jnp.sum(diff ** 2) / total)


def batch_rmsd_jax(pred_crd: jax.Array, true_crd: jax.Array,
                   atom_mask: jax.Array,
                   protein_mask: jax.Array | None = None) -> jax.Array:
    """Mean per-protein masked superposition RMSD over a batch (on device)."""
    b = pred_crd.shape[0]
    a = pred_crd.reshape(b, -1, 3)
    t = true_crd.reshape(b, -1, 3)
    m = atom_mask.reshape(b, -1)
    vals = jax.vmap(kabsch_rmsd_masked)(a, t, m)
    if protein_mask is None:
        return jnp.mean(vals)
    w = protein_mask.astype(vals.dtype)
    return jnp.sum(vals * w) / jnp.maximum(jnp.sum(w), 1.0)


def kabsch_rmsd(a: np.ndarray, b: np.ndarray) -> float:
    """Superposition RMSD of two (N, 3) point sets (host-side, eval only).

    Replaces the reference's ProDy calcTransformation/calcRMSD call
    (losses.py:281-286) with a direct Kabsch alignment of a onto b.
    """
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    ac = a - a.mean(0)
    bc = b - b.mean(0)
    h = ac.T @ bc
    u, _s, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(u @ vt))
    rot = u @ np.diag([1.0, 1.0, d]) @ vt
    diff = ac @ rot - bc
    return float(np.sqrt((diff ** 2).sum() / a.shape[0]))


def batch_rmsd(pred_crd: np.ndarray, true_crd: np.ndarray,
               atom_mask: np.ndarray) -> float:
    """Mean per-protein superposition RMSD over a batch (host-side)."""
    vals = []
    for p, t, m in zip(pred_crd, true_crd, atom_mask):
        sel = m.reshape(-1).astype(bool)
        if sel.sum() < 3:
            continue
        vals.append(kabsch_rmsd(p.reshape(-1, 3)[sel], t.reshape(-1, 3)[sel]))
    return float(np.mean(vals)) if vals else 0.0
