"""Pallas TPU mega-kernel: fused sidechain construction (forward + VJP).

The XLA sidechain path (protein/geometry.build_sidechains) is 10 unrolled
slots of one-hot select-sums + NeRF placements over a (L, 15, 3) point
buffer; each slot materializes a fresh buffer and its VJP doubles the op
soup (reference hot loop: protein/StructureBuilder.py:193-231). This kernel
runs the whole slot chain -- frame selection, NeRF placement, liveness
masking -- in ONE VMEM-resident pass per protein, plus a matching custom-VJP
backward kernel that replays the frames from the saved point buffer and
accumulates gradients slot-by-slot in reverse.

Layout: residues ride the 128-wide lane dimension. Every point/row is a
(1, Lp) lane vector; all math (cross products, normalize, NeRF trig) is
elementwise VPU work. The slot loop is statically unrolled (slot s can only
reference buffer entries < 4+s and the anchor slot 14, so the candidate set
shrinks the select-sum by ~40% vs a full 15-way select).

Gradient semantics match the XLA path exactly: normalize() clamps the
squared norm at eps^2 (zero-gradient branch for degenerate frames), dead
slots (slot >= n_sc) contribute zero value and zero gradient, and bond
length/angle tables are constants (their cotangents are dropped).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_EPS2 = 1e-24  # matches ops.nerf._NORM_EPS ** 2

MAX_SC_ATOMS = 10
_N_PTS = 15    # 0..3 backbone, 4..13 sidechain slots, 14 anchor


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _cross(u, v):
    """Component-tuple cross product; u, v are 3-tuples of (1, Lp) rows."""
    return (u[1] * v[2] - u[2] * v[1],
            u[2] * v[0] - u[0] * v[2],
            u[0] * v[1] - u[1] * v[0])


def _dot(u, v):
    return u[0] * v[0] + u[1] * v[1] + u[2] * v[2]


def _normalize(v):
    r = jax.lax.rsqrt(jnp.maximum(_dot(v, v), _EPS2))
    return (v[0] * r, v[1] * r, v[2] * r)


def _normalize_vjp(v, g):
    """VJP of _normalize at v: g_v = r*g - [n2>eps^2] * (v.g) * r^3 * v."""
    n2 = _dot(v, v)
    r = jax.lax.rsqrt(jnp.maximum(n2, _EPS2))
    live = (n2 > _EPS2).astype(g[0].dtype)
    coef = live * _dot(v, g) * (r * r * r)
    return (r * g[0] - coef * v[0],
            r * g[1] - coef * v[1],
            r * g[2] - coef * v[2])


def _candidates(slot: int) -> list[int]:
    """Buffer entries slot `slot`'s frame atoms can legally reference:
    backbone + already-built sidechain atoms + the anchor (slot 14)."""
    return list(range(4 + slot)) + [14]


def _select_frame(pts, fidx_ref, slot: int):
    """One-hot select the (a, b, c) frame points for `slot`."""
    abc = []
    for f in range(3):
        idx = fidx_ref[3 * slot + f:3 * slot + f + 1, :]
        acc = None
        for k in _candidates(slot):
            m = (idx == float(k)).astype(idx.dtype)
            term = (m * pts[k][0], m * pts[k][1], m * pts[k][2])
            acc = term if acc is None else (acc[0] + term[0],
                                            acc[1] + term[1],
                                            acc[2] + term[2])
        abc.append(acc)
    return abc


def _frame_axes(a, b, c):
    """NeRF frame axes from points (same math as ops.nerf.nerf)."""
    w = (b[0] - a[0], b[1] - a[1], b[2] - a[2])
    x = (c[0] - b[0], c[1] - b[1], c[2] - b[2])
    w_hat = _normalize(w)
    x_hat = _normalize(x)
    z_raw = _cross(w_hat, x_hat)
    z_hat = _normalize(z_raw)
    y_hat = _cross(z_hat, x_hat)
    return w, x, w_hat, x_hat, z_raw, z_hat, y_hat


def _fwd_kernel(pts_ref, geom_ref, fidx_ref, nsc_ref, out_ref):
    """All 10 sidechain slots of one protein in one VMEM pass.

    pts_ref: (45, Lp) -- 15 points x 3 components (sidechain rows zero).
    geom_ref: (30, Lp) -- rows 0..9 torsions, 10..19 bond lengths,
    20..29 bond angles. fidx_ref: (30, Lp) float frame indices (3 per slot).
    nsc_ref: (1, Lp) float sidechain atom counts. out_ref: (30, Lp) built
    sidechain points (10 x 3 components).
    """
    pts = [(pts_ref[3 * k:3 * k + 1, :],
            pts_ref[3 * k + 1:3 * k + 2, :],
            pts_ref[3 * k + 2:3 * k + 3, :]) for k in range(_N_PTS)]
    nsc = nsc_ref[0:1, :]
    for s in range(MAX_SC_ATOMS):
        a, b, c = _select_frame(pts, fidx_ref, s)
        _, _, _, x_hat, _, z_hat, y_hat = _frame_axes(a, b, c)
        tor = geom_ref[s:s + 1, :]
        ln = geom_ref[10 + s:11 + s, :]
        ang = geom_ref[20 + s:21 + s, :]
        u1 = -ln * jnp.cos(ang)
        lst = ln * jnp.sin(ang)
        u2 = lst * jnp.cos(tor)
        u3 = lst * jnp.sin(tor)
        live = (nsc > float(s)).astype(ln.dtype)
        pt = tuple(
            live * (c[i] + u1 * x_hat[i] + u2 * y_hat[i] + u3 * z_hat[i])
            for i in range(3))
        pts[4 + s] = pt
        for i in range(3):
            out_ref[3 * s + i:3 * s + i + 1, :] = pt[i]


def _bwd_kernel(pts_ref, geom_ref, fidx_ref, nsc_ref, gout_ref,
                gpts_ref, gtor_ref):
    """Reverse the slot chain: cotangents for the point buffer + torsions.

    pts_ref here is the COMPLETE (45, Lp) buffer (backbone + built
    sidechains + anchor) saved by the forward pass -- slot s's frame only
    references entries < 4+s, so the final buffer reproduces every frame.
    gout_ref: (42, Lp) output cotangent (14 points). gpts_ref: (45, Lp)
    cotangents of the input buffer (backbone rows 0..11, anchor 42..44).
    gtor_ref: (10, Lp) torsion cotangents.
    """
    pts = [(pts_ref[3 * k:3 * k + 1, :],
            pts_ref[3 * k + 1:3 * k + 2, :],
            pts_ref[3 * k + 2:3 * k + 3, :]) for k in range(_N_PTS)]
    nsc = nsc_ref[0:1, :]
    zero = jnp.zeros_like(nsc)
    g = [[gout_ref[3 * k + i:3 * k + i + 1, :] for i in range(3)]
         for k in range(14)]
    g.append([zero, zero, zero])  # anchor receives no direct output grad

    for s in reversed(range(MAX_SC_ATOMS)):
        live = (nsc > float(s)).astype(zero.dtype)
        gp = (live * g[4 + s][0], live * g[4 + s][1], live * g[4 + s][2])
        a, b, c = _select_frame(pts, fidx_ref, s)
        w, x, w_hat, x_hat, z_raw, z_hat, y_hat = _frame_axes(a, b, c)
        tor = geom_ref[s:s + 1, :]
        ln = geom_ref[10 + s:11 + s, :]
        ang = geom_ref[20 + s:21 + s, :]
        u1 = -ln * jnp.cos(ang)
        lst = ln * jnp.sin(ang)
        u2 = lst * jnp.cos(tor)
        u3 = lst * jnp.sin(tor)

        # pt = live * (c + u1 x^ + u2 y^ + u3 z^)
        ub2 = _dot(gp, y_hat)
        ub3 = _dot(gp, z_hat)
        gtor_ref[s:s + 1, :] = -u3 * ub2 + u2 * ub3

        g_x_hat = tuple(u1 * gp[i] for i in range(3))
        g_y_hat = tuple(u2 * gp[i] for i in range(3))
        g_z_hat = tuple(u3 * gp[i] for i in range(3))
        # y_hat = cross(z_hat, x_hat)
        cz = _cross(x_hat, g_y_hat)
        cx = _cross(g_y_hat, z_hat)
        g_z_hat = tuple(g_z_hat[i] + cz[i] for i in range(3))
        g_x_hat = tuple(g_x_hat[i] + cx[i] for i in range(3))
        # z_hat = normalize(z_raw); z_raw = cross(w_hat, x_hat)
        g_zraw = _normalize_vjp(z_raw, g_z_hat)
        g_w_hat = _cross(x_hat, g_zraw)
        cx2 = _cross(g_zraw, w_hat)
        g_x_hat = tuple(g_x_hat[i] + cx2[i] for i in range(3))
        # w_hat = normalize(w); x_hat = normalize(x)
        g_w = _normalize_vjp(w, g_w_hat)
        g_x = _normalize_vjp(x, g_x_hat)
        # w = b - a; x = c - b; pt += live * c
        ga = tuple(-g_w[i] for i in range(3))
        gb = tuple(g_w[i] - g_x[i] for i in range(3))
        gc = tuple(gp[i] + g_x[i] for i in range(3))

        for f, gv in ((0, ga), (1, gb), (2, gc)):
            idx = fidx_ref[3 * s + f:3 * s + f + 1, :]
            for k in _candidates(s):
                m = (idx == float(k)).astype(idx.dtype)
                g[k] = [g[k][i] + m * gv[i] for i in range(3)]

    for k in range(_N_PTS):
        for i in range(3):
            gpts_ref[3 * k + i:3 * k + i + 1, :] = g[k][i]


# ---------------------------------------------------------------------------
# Host-side wrappers: packing, padding, custom VJP
# ---------------------------------------------------------------------------

def _pack_rows(bb, anchor, torsions, blen, bang, nsc_f, fidx_f):
    """(L, ...) per-residue arrays -> lane-major (rows, Lp) kernel operands."""
    L = bb.shape[0]
    Lp = _round_up(max(L, _LANES), _LANES)
    pad = [(0, Lp - L)]

    def rowsT(x, rows):  # (L, rows) -> (rows, Lp)
        return jnp.pad(x.reshape(L, rows).T, [(0, 0)] + pad)

    pts = jnp.concatenate([
        rowsT(bb, 12),                       # points 0..3
        jnp.zeros((30, Lp), bb.dtype),       # slots 4..13 (built in-kernel)
        rowsT(anchor, 3),                    # point 14
    ])
    geom = jnp.concatenate([rowsT(torsions, 10), rowsT(blen, 10),
                            rowsT(bang, 10)])
    fidx = rowsT(fidx_f, 30)
    nsc = jnp.pad(nsc_f[None, :], [(0, 0)] + pad)
    return pts, geom, fidx, nsc, Lp


def _run_fwd(bb, anchor, torsions, blen, bang, nsc_f, fidx_f):
    L = bb.shape[0]
    pts, geom, fidx, nsc, Lp = _pack_rows(bb, anchor, torsions, blen, bang,
                                          nsc_f, fidx_f)
    sc = pl.pallas_call(
        _fwd_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((30, Lp), bb.dtype),
    )(pts, geom, fidx, nsc)
    # (L, 14, 3) output: backbone rows from the input, sidechains from the
    # kernel. Rows are (point, component)-major, so transpose back.
    out_rows = jnp.concatenate([pts[:12], sc])          # (42, Lp)
    out = out_rows[:, :L].T.reshape(L, 14, 3)
    # rows 12..41 of pts are zeros (slots built in-kernel) -- keep only the
    # backbone and anchor rows as residuals; backward rebuilds the full
    # buffer from these + the kernel's own output
    residuals = (pts[:12], pts[42:45], sc, geom, fidx, nsc)
    return out, residuals


@jax.custom_vjp
def _sc_build_p(bb, anchor, torsions, blen, bang, nsc_f, fidx_f):
    """Differentiable fused sidechain build: (L,4,3),(L,3),(L,10)x3,(L,),(L,30)
    -> (L,14,3). Gradients flow to bb/anchor/torsions only."""
    out, _ = _run_fwd(bb, anchor, torsions, blen, bang, nsc_f, fidx_f)
    return out


def _sc_build_fwd(bb, anchor, torsions, blen, bang, nsc_f, fidx_f):
    out, res = _run_fwd(bb, anchor, torsions, blen, bang, nsc_f, fidx_f)
    return out, res


def _sc_build_bwd(res, g_out):
    bb_rows, anchor_rows, sc, geom, fidx, nsc = res
    L, dtype = g_out.shape[0], g_out.dtype
    Lp = bb_rows.shape[1]
    # Full point buffer residual: inputs + built sidechain rows.
    pts_full = jnp.concatenate([bb_rows, sc, anchor_rows])
    g_rows = jnp.pad(g_out.reshape(L, 42).T, [(0, 0), (0, Lp - L)])
    g_pts, g_tor = pl.pallas_call(
        _bwd_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((45, Lp), dtype),
                   jax.ShapeDtypeStruct((10, Lp), dtype)),
    )(pts_full, geom, fidx, nsc, g_rows)
    g_bb = g_pts[:12, :L].T.reshape(L, 4, 3)
    g_anchor = g_pts[42:45, :L].T
    g_torsions = g_tor[:, :L].T
    zeros10 = jnp.zeros((L, 10), dtype)
    return (g_bb, g_anchor, g_torsions, zeros10, zeros10,
            jnp.zeros((L,), dtype), jnp.zeros((L, 30), dtype))


_sc_build_p.defvjp(_sc_build_fwd, _sc_build_bwd)


def build_sidechain_points(bb: jax.Array, anchor: jax.Array,
                           torsions: jax.Array, blen: jax.Array,
                           bang: jax.Array, n_sc: jax.Array,
                           frame_idx: jax.Array) -> jax.Array:
    """Fused sidechain build for one protein (vmap over batch).

    bb: (L, 4, 3) backbone N/CA/C/O. anchor: (L, 3) previous-C (next-N for
    residue 0). torsions/blen/bang: (L, 10) resolved internal coordinates.
    n_sc: (L,) int sidechain atom counts. frame_idx: (L, 10, 3) int buffer
    indices of each slot's frame atoms. Returns (L, 14, 3) full coordinates
    with dead slots zero-filled -- bit-compatible layout with the XLA path
    (protein/geometry.build_sidechains).
    """
    dtype = bb.dtype
    return _sc_build_p(bb, anchor, torsions, blen, bang,
                       n_sc.astype(dtype),
                       frame_idx.reshape(frame_idx.shape[0], 30)
                       .astype(dtype))
