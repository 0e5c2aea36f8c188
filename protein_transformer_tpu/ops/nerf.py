"""Vectorized NeRF (natural extension reference frame) primitives.

The reference places atoms one at a time with a Python-level NeRF routine
(reference: protein/Structure.py:23-65) inside a per-residue object graph
(protein/StructureBuilder.py:147-231). On TPU we instead express chain
extension as rigid-frame algebra:

* ``nerf``: a batched closed-form placement of atom d from frame atoms
  (a, b, c) plus (bond length, bond angle, torsion). Broadcasts over any
  leading dims; used for sidechain atoms and carbonyl oxygens, where all
  residues are independent once the backbone exists (vmap over residues).

* ``extension_transform``: the local rigid transform of a single chain
  extension, which depends only on (length, theta, chi). Composing these with
  ``jax.lax.associative_scan`` computes every backbone mainchain atom of a
  protein in O(log L) depth instead of a 3L-step sequential scan -- the
  TPU-native replacement for the reference's sequential NeRF bottleneck.

Derivation: a NeRF step places d = c + M @ v with local displacement
v = (-l*cos(t), l*sin(t)*cos(x), l*sin(t)*sin(x)) in the frame M built from
(a, b, c). Because the frame after the step is built from (b, c, d), and in
frame-local coordinates (c - b) is the x axis while (d - c) is M-local v, the
new frame is M' = M @ R with R a closed-form function of (t, x) only. The
whole mainchain is then a product of per-atom rigid transforms.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Matches torch.nn.functional.normalize's zero-norm guard, which the reference
# relies on (Structure.py:44-50).
_NORM_EPS = 1e-12

# Geometry matmuls must run in full float32: the TPU default matmul precision
# is bfloat16, whose ~4e-3 relative error would swamp the 1e-3 A coordinate
# parity gate after a few frame compositions.
_HIGHEST = jax.lax.Precision.HIGHEST


def normalize(v: jax.Array, axis: int = -1) -> jax.Array:
    """v / max(|v|, eps), written so the zero-vector branch has zero gradient.

    Degenerate frames occur at masked/padded positions (e.g. empty sidechain
    slots); ``sqrt`` at 0 would emit NaN cotangents that poison the whole
    batch gradient even though the values are masked out downstream. Clamping
    the *squared* norm keeps both value and gradient finite and is exactly
    equivalent to torch.nn.functional.normalize for |v| >= eps.
    """
    n2 = jnp.sum(v * v, axis=axis, keepdims=True)
    return v * jax.lax.rsqrt(jnp.maximum(n2, _NORM_EPS * _NORM_EPS))


def nerf(a: jax.Array, b: jax.Array, c: jax.Array,
         length: jax.Array, theta: jax.Array, chi: jax.Array) -> jax.Array:
    """Place the 4th atom given 3 frame atoms and internal coordinates.

    Arguments broadcast over leading dims: a/b/c are (..., 3); length, theta
    (bond angle, radians), chi (torsion, radians) are (...,).

    Behavioral parity with reference Structure.py:23-65 (same frame
    construction and local displacement), evaluated in float32.
    """
    w_hat = normalize(b - a)
    x_hat = normalize(c - b)
    z_hat = normalize(jnp.cross(w_hat, x_hat))
    y_hat = jnp.cross(z_hat, x_hat)

    length = length[..., None]
    theta = theta[..., None]
    chi = chi[..., None]
    d = (-length * jnp.cos(theta) * x_hat
         + length * jnp.sin(theta) * jnp.cos(chi) * y_hat
         + length * jnp.sin(theta) * jnp.sin(chi) * z_hat)
    return c + d


def extension_transform(length: jax.Array, theta: jax.Array,
                        chi: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Local rigid transform (R, t) of one chain-extension step.

    Returns R: (..., 3, 3), t: (..., 3) such that composing transforms along
    the chain reproduces sequential NeRF placement exactly (in exact
    arithmetic). Columns of R are the new frame's axes expressed in the old
    frame; t is the local displacement of the new atom.
    """
    ct, st = jnp.cos(theta), jnp.sin(theta)
    cx, sx = jnp.cos(chi), jnp.sin(chi)
    zeros = jnp.zeros_like(ct)
    # Columns: u = normalize(v) (new x axis), z' = (e_x x u)/|e_x x u|,
    # y' = z' x u. |e_x x u| = |sin(theta)| -- NOT sin(theta) -- so the
    # closed-formed division by sin(theta) must carry its sign or the y'/z'
    # axes flip for theta < 0. Physical bond angles are always in (0, pi),
    # but an UNTRAINED model predicts arbitrary thetas, and sequential NeRF
    # (reference Structure.py:44-52, which normalizes explicitly) keeps its
    # handedness there; without the sign this scan silently diverged from
    # it for every structure an early-training model emits.
    sg = jnp.where(st < 0, -1.0, 1.0).astype(ct.dtype)
    r = jnp.stack([
        jnp.stack([-ct, -sg * st, zeros], axis=-1),
        jnp.stack([st * cx, -sg * ct * cx, -sg * sx], axis=-1),
        jnp.stack([st * sx, -sg * ct * sx, sg * cx], axis=-1),
    ], axis=-2)  # (..., 3, 3) rows stacked -> [row_i][col_j]
    t = jnp.stack([-length * ct, length * st * cx, length * st * sx], axis=-1)
    return r, t


def compose_rigid(left: tuple[jax.Array, jax.Array],
                  right: tuple[jax.Array, jax.Array]) -> tuple[jax.Array, jax.Array]:
    """(Ra, ta) o (Rb, tb) = (Ra @ Rb, ta + Ra @ tb); associative."""
    ra, ta = left
    rb, tb = right
    r = jnp.einsum("...ij,...jk->...ik", ra, rb, precision=_HIGHEST)
    t = ta + jnp.einsum("...ij,...j->...i", ra, tb, precision=_HIGHEST)
    return r, t


def chain_positions_grouped(r0: jax.Array, t0: jax.Array,
                            lengths: jax.Array, thetas: jax.Array,
                            chis: jax.Array) -> jax.Array:
    """Backbone-chain positions with per-residue transform pre-composition.

    lengths/thetas/chis: (K, G) internal coordinates -- K residue steps of G
    chained extensions each (G=3 for the N/CA/C mainchain). Equivalent to a
    flat prefix-composition scan over the (K*G,) extension chain, but the
    associative scan runs over K pre-composed residue transforms instead of
    K*G atom transforms: ~G x less scan work and ~G x fewer fusion ops, which
    matters because the builder's cost is op-dispatch-bound, not FLOP-bound.

    Returns (K, G, 3) global positions of every extended atom.
    """
    k, g = lengths.shape
    dtype = lengths.dtype
    r, t = extension_transform(lengths, thetas, chis)  # (K, G, 3, 3), (K, G, 3)

    # Prefix-compose the G extensions inside each residue step: cum[a] is
    # E1 o ... o E(a+1), so cum[G-1] is the whole residue's transform.
    cum = [(r[:, 0], t[:, 0])]
    for a in range(1, g):
        cum.append(compose_rigid(cum[-1], (r[:, a], t[:, a])))
    local_t = jnp.stack([c[1] for c in cum], axis=1)   # (K, G, 3)

    # Prefix transforms across residue steps; P_prev[i] = P_0 o ... o P_{i-1}
    # (identity for i=0).
    pr, pt = jax.lax.associative_scan(compose_rigid, cum[-1])
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (1, 3, 3))
    pr_prev = jnp.concatenate([eye, pr[:-1]])
    pt_prev = jnp.concatenate([jnp.zeros((1, 3), dtype), pt[:-1]])

    # Atom a of residue step i sits at P_prev_i o (E1..E(a+1)) applied to the
    # origin: pt_prev + pr_prev @ local_t, then mapped through the seed frame.
    local = pt_prev[:, None, :] + jnp.einsum(
        "kij,kaj->kai", pr_prev, local_t, precision=_HIGHEST)
    return t0 + jnp.einsum("ij,kaj->kai", r0, local, precision=_HIGHEST)


def frame_from_points(a: jax.Array, b: jax.Array, c: jax.Array) -> jax.Array:
    """Orthonormal frame (columns x, y, z) from 3 seed atoms, origin at c."""
    w_hat = normalize(b - a)
    x_hat = normalize(c - b)
    z_hat = normalize(jnp.cross(w_hat, x_hat))
    y_hat = jnp.cross(z_hat, x_hat)
    return jnp.stack([x_hat, y_hat, z_hat], axis=-1)
