"""On-device all-atom structure building (angles -> cartesian coordinates).

TPU-native replacement for the reference's sequential Python builder
(reference: protein/StructureBuilder.py:12-236, protein/Structure.py:12-20).
Instead of a per-residue object graph run in forked CPU worker processes
(reference losses.py:133-172), the whole reconstruction is jit-compatible,
differentiable, and vectorizable with ``jax.vmap`` over a batch:

1. Backbone mainchain (N, CA, C)*L: a single NeRF chain of 3L-3 extensions,
   computed with parallel prefix composition of per-residue rigid transforms
   (``ops.nerf.chain_positions_grouped``) -- O(log L) depth on device.
2. Carbonyl oxygens: one independent NeRF placement per residue (vectorized).
3. Sidechains: up to 10 chained NeRF placements per residue, driven entirely
   by dense per-AA tables (``_ff14sb``); sequential only *within* a residue
   (static-bound fori_loop over slots), vectorized across residues and batch.

Conventions match the reference: angles are (L, 12) radians in the order
[phi, psi, omega, theta1(n-ca-c), theta2(ca-c-n), theta3(c-n-ca), chi0..chi5];
output is (L, 14, 3) with unused atom slots zero-filled
(StructureBuilder.py:233-236); the first residue's CB torsion frame uses the
second residue's N (StructureBuilder.py:55-69,205-216); terminal oxygens are
not special-cased.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from protein_transformer_tpu.ops.nerf import (
    chain_positions_grouped, frame_from_points, nerf)
from protein_transformer_tpu.protein import _ff14sb as ff
from protein_transformer_tpu.protein.constants import (
    NUM_PREDICTED_ANGLES, NUM_PREDICTED_COORDS, SC_ANGLES_START_POS)

# Backbone constants (AMBER ff14SB; see _ff14sb.BB_CONST provenance).
_L_CN = ff.BB_CONST["c-n"]
_L_NCA = ff.BB_CONST["n-ca"]
_L_CAC = ff.BB_CONST["ca-c"]
_L_CO = ff.BB_CONST["c-o"]
_ANG_CACO = ff.BB_CONST["ca-c-o"]


def build_backbone(angles: jax.Array) -> jax.Array:
    """Mainchain + oxygen coordinates for one protein.

    angles: (L, 12) radians. Returns (L, 4, 3): N, CA, C, O per residue.
    Parity: StructureBuilder.build_bb / init_bb (StructureBuilder.py:147-191).
    """
    L = angles.shape[0]
    dtype = angles.dtype

    # Seed residue 0 in the z=.001 plane (StructureBuilder.py:181-187).
    n0 = jnp.array([0.0, 0.0, 0.001], dtype)
    ca0 = n0 + jnp.array([_L_NCA, 0.0, 0.0], dtype)
    t13 = jnp.pi - angles[0, 3]
    c0 = ca0 + _L_CAC * jnp.stack(
        [jnp.cos(t13), jnp.sin(t13), jnp.zeros((), dtype)])

    # Chain extensions for residues 1..L-1; three atoms each:
    #   N_i : len c-n,  theta = ang_{i-1}[4], chi = psi_{i-1}
    #   CA_i: len n-ca, theta = ang_{i-1}[5], chi = omega_{i-1}
    #   C_i : len ca-c, theta = ang_i[3],     chi = phi_i
    prev, cur = angles[:-1], angles[1:]
    thetas = jnp.stack([prev[:, 4], prev[:, 5], cur[:, 3]], axis=1)
    chis = jnp.stack([prev[:, 1], prev[:, 2], cur[:, 0]], axis=1)
    lengths = jnp.broadcast_to(
        jnp.array([_L_CN, _L_NCA, _L_CAC], dtype), (L - 1, 3))

    r0 = frame_from_points(n0, ca0, c0)
    ext = chain_positions_grouped(r0, c0, lengths, thetas, chis)  # (L-1, 3, 3)

    mainchain = jnp.concatenate(
        [jnp.stack([n0, ca0, c0])[None], ext]).reshape(L, 3, 3)
    n, ca, c = mainchain[:, 0], mainchain[:, 1], mainchain[:, 2]

    # Oxygens: nerf(N, CA, C, c-o, ca-c-o, psi - pi) for every residue
    # (StructureBuilder.py:169-173,188-190).
    o = nerf(n, ca, c,
             jnp.full((L,), _L_CO, dtype),
             jnp.full((L,), _ANG_CACO, dtype),
             angles[:, 1] - jnp.pi)
    return jnp.concatenate([mainchain, o[:, None, :]], axis=1)


def _sidechain_impl() -> str:
    """Sidechain builder implementation: 'xla' (default) or 'pallas'
    (opt-in via PTT_SIDECHAIN_IMPL=pallas).

    The env var is read at TRACE time: set it before the first jit of a
    function that builds coordinates -- an already-compiled executable
    keeps whichever path it traced (the var is not part of jit cache
    keys). For the config-driven equivalent pattern see cfg.drmsd_impl.

    Measured on TPU v5e at B=8 L=256 (fwd / fwd+bwd): XLA select-sum path
    0.09 / 0.27 ms vs fused Pallas mega-kernel 0.81 / 1.32 ms. The slot
    chain's (1, L) row ops fill 1/8 of the VPU sublanes and are too small
    to amortize kernel launches, while XLA fuses the unrolled slots across
    the whole (B*L) surface — so the portable path stays the default and
    the kernel remains an opt-in experiment (ops/sidechain_pallas.py)."""
    import os
    impl = os.environ.get("PTT_SIDECHAIN_IMPL", "auto")
    return "xla" if impl == "auto" else impl


def build_sidechains(bb: jax.Array, angles: jax.Array,
                     seq: jax.Array) -> jax.Array:
    """Sidechain atoms for one protein given its backbone.

    bb: (L, 4, 3) backbone N/CA/C/O; angles: (L, 12); seq: (L,) AA ids.
    Returns (L, 14, 3) full coordinates, unused slots zero-filled.
    Parity: StructureBuilder.build_sc (StructureBuilder.py:193-231).
    """
    L = bb.shape[0]
    dtype = bb.dtype
    aa = jnp.clip(seq, 0, ff.SC_NUM_ATOMS.shape[0] - 1)

    n_sc = jnp.asarray(ff.SC_NUM_ATOMS)[aa]                  # (L,)
    blen = jnp.asarray(ff.SC_BOND_LEN, dtype)[aa]            # (L, 10)
    bang = jnp.asarray(ff.SC_BOND_ANG, dtype)[aa]            # (L, 10)
    ttype = jnp.asarray(ff.SC_TORSION_TYPE)[aa]              # (L, 10)
    tconst = jnp.asarray(ff.SC_TORSION_CONST, dtype)[aa]     # (L, 10)
    tsrc = jnp.asarray(ff.SC_TORSION_SRC)[aa]                # (L, 10)
    toff = jnp.asarray(ff.SC_TORSION_PI_OFFSET, dtype)[aa]   # (L, 10)
    frame = jnp.asarray(ff.SC_FRAME_IDX)[aa]                 # (L, 10, 3)

    # Residue 0's first sidechain atom is framed by (next-N, C, CA) instead of
    # (prev-C, N, CA) (StructureBuilder.py:205-216). Both use buffer slot 14
    # as anchor; only the middle frame atom differs (C vs N).
    first_res_frame = jnp.array([ff.ANCHOR_IDX, 2, 1], np.int32)
    frame = frame.at[0, 0].set(first_res_frame)

    # Anchor per residue: N of residue 1 for residue 0, else C of residue i-1.
    # A lone residue (L=1) has no neighbour to borrow from; fall back to its
    # own C so the build is defined (the pipeline's MIN_LENGTH=2 means the
    # trainer never hits this; predict tooling on L=1 gets a best-effort CB).
    if L == 1:
        anchor = bb[:, 2]
    else:
        anchor = jnp.concatenate([bb[1:2, 0], bb[:-1, 2]], axis=0)  # (L, 3)

    # Resolved torsions: predicted chi (indexed by *source slot*, matching the
    # reference's ang[6 + slot] lookup) or chemical constant, minus the
    # statically-resolved pi offset for 'inferred' planar atoms
    # (StructureBuilder.py:220-224).
    chi_idx = jnp.clip(SC_ANGLES_START_POS + tsrc, 0, NUM_PREDICTED_ANGLES - 1)
    chi_oh = jax.nn.one_hot(chi_idx, NUM_PREDICTED_ANGLES, dtype=dtype)
    chi_vals = jnp.sum(chi_oh * angles[:, None, :], axis=-1)  # (L, 10)
    torsions = jnp.where(ttype == ff.TORSION_PRED, chi_vals, tconst) - toff

    if _sidechain_impl() == "pallas":
        from protein_transformer_tpu.ops.sidechain_pallas import (
            build_sidechain_points)
        return build_sidechain_points(bb, anchor, torsions, blen, bang,
                                      n_sc, frame)
    return _build_sidechains_xla(bb, anchor, torsions, blen, bang, n_sc,
                                 frame)


def _build_sidechains_xla(bb, anchor, torsions, blen, bang, n_sc, frame):
    """Portable XLA slot chain (CPU/GPU fallback and kernel-parity oracle)."""
    L = bb.shape[0]
    dtype = bb.dtype
    # Frame-atom selection as one-hot elementwise select-sums rather
    # than gathers: a gather's VJP is a scatter-add, which dominated the
    # round-1 step time (~3 ms of sidechain backward); the select-sum's VJP is
    # the same select-sum transposed, all VPU elementwise work. No MXU matmul
    # here on purpose: TPU default matmul precision (bf16) would cost ~3e-2 A.
    frame_oh = jax.nn.one_hot(frame, 15, dtype=dtype)        # (L, 10, 3, 15)

    # Point buffer: 0..3 backbone, 4..13 sidechain (build order), 14 anchor.
    buf = jnp.zeros((L, 15, 3), dtype)
    buf = buf.at[:, :4].set(bb)
    buf = buf.at[:, 14].set(anchor)

    # Sequential only across the <=10 slots (each atom's frame may use
    # earlier sidechain atoms). Fully unrolled: 10 static slots of fused
    # elementwise work differentiate far better than a scanned loop.
    for slot in range(ff.MAX_SC_ATOMS):
        # (L, 3, 15, 1) x (L, 1, 15, 3) -> (L, 3, 3) frame atoms a, b, c.
        abc = jnp.sum(frame_oh[:, slot][..., None] * buf[:, None, :, :],
                      axis=2)
        pt = nerf(abc[:, 0], abc[:, 1], abc[:, 2],
                  blen[:, slot], bang[:, slot], torsions[:, slot])
        pt = jnp.where((slot < n_sc)[:, None], pt, 0.0)
        buf = buf.at[:, 4 + slot].set(pt)
    return buf[:, :NUM_PREDICTED_COORDS]


def build_coords(angles: jax.Array, seq: jax.Array) -> jax.Array:
    """All-atom coordinates for one protein: (L, 12) + (L,) -> (L, 14, 3).

    Differentiable end-to-end; vmap over the leading axis for batches.
    Parity: Structure.generate_coords (Structure.py:12-20), with the
    reference's (L*14, 3) flat layout reshaped to (L, 14, 3).
    """
    bb = build_backbone(angles)
    return build_sidechains(bb, angles, seq)


# Batch version: (B, L, 12), (B, L) -> (B, L, 14, 3).
build_coords_batch = jax.vmap(build_coords)


def inverse_trig_transform(sincos: jax.Array) -> jax.Array:
    """(..., L, 24) sin/cos pairs -> (..., L, 12) radians via atan2.

    Parity: losses.inverse_trig_transform (losses.py:26-36); the reference
    interleaves as [cos, sin] per angle.
    """
    shaped = sincos.reshape(*sincos.shape[:-1], NUM_PREDICTED_ANGLES, 2)
    return jnp.arctan2(shaped[..., 1], shaped[..., 0])


def trig_transform(radians: jax.Array) -> jax.Array:
    """(..., L, 12) radians -> (..., L, 24) interleaved [cos, sin] pairs."""
    stacked = jnp.stack([jnp.cos(radians), jnp.sin(radians)], axis=-1)
    return stacked.reshape(*radians.shape[:-1], NUM_PREDICTED_ANGLES * 2)
