#!/usr/bin/env python
"""Microbenchmark + parity harness for dRMSD Pallas kernel variants.

Runs the current production kernel (ops.drmsd_pallas) against candidate
rewrites on the real TPU and prints per-variant fwd / fwd+bwd step times at
the two workload shapes that matter (flagship L=256 and ladder L=500, B=8
vmapped). Used to decide kernel changes by measurement; CPU `--interpret`
mode checks parity only.

Variant notes (all computed per (TILE, TILE) grid cell, upper-tri):
  cur     : production kernel -- diff-form distances, rsqrt both sides,
            per-axis g=coef*diff row/col reductions.
  sqrt1   : forward computes (Da-Db)^2 = d2a + d2b - 2*sqrt(d2a*d2b)
            elementwise -- ONE transcendental per element instead of two.
  mxu     : distances via the norm+cross-term form with the 3-deep
            contraction on the MXU; gradient contraction as two small
            matmuls (coef @ points) instead of six VPU reduction sweeps.
"""
from __future__ import annotations

import argparse
import time

import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from protein_transformer_tpu.ops import drmsd_pallas as dp

_TILE = dp._TILE
_CLAMP = dp._DIST_CLAMP
_HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------- variants
def _fwd_kernel_sqrt1(pa_ref, pb_ref, m_ref, out_ref):
    ti = pl.program_id(0)
    tj = pl.program_id(1)

    @pl.when((ti == 0) & (tj == 0))
    def _():
        out_ref[0, 0] = 0.0
        out_ref[0, 1] = 0.0

    @pl.when(tj >= ti)
    def _():
        pi = pl.ds(ti * _TILE, _TILE)
        pj = pl.ds(tj * _TILE, _TILE)

        def d2_tile(p):
            d2 = jnp.zeros((_TILE, _TILE), jnp.float32)
            for c in range(3):
                diff = p[c, pi][:, None] - p[c, pj][None, :]
                d2 = d2 + diff * diff
            return jnp.maximum(d2, _CLAMP)

        d2a = d2_tile(pa_ref)
        d2b = d2_tile(pb_ref)
        # (Da - Db)^2 == d2a + d2b - 2 sqrt(d2a d2b): one transcendental
        # instead of two; elementwise form keeps the cancellation local.
        elem = (d2a + d2b) - 2.0 * jnp.sqrt(d2a * d2b)
        w = dp._pair_mask(m_ref, ti, tj)
        out_ref[0, 0] += jnp.sum(elem * w)
        out_ref[0, 1] += jnp.sum(w)


def _d2_mxu(p_ref, pi, pj):
    xi = p_ref[:, pi]                    # (3, T)
    xj = p_ref[:, pj]
    ni = jnp.sum(xi * xi, axis=0)        # (T,)
    nj = jnp.sum(xj * xj, axis=0)
    cross = jax.lax.dot_general(
        xi, xj, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI)  # (T, T)
    return jnp.maximum(ni[:, None] + nj[None, :] - 2.0 * cross, _CLAMP)


def _fwd_kernel_mxu(pa_ref, pb_ref, m_ref, out_ref):
    ti = pl.program_id(0)
    tj = pl.program_id(1)

    @pl.when((ti == 0) & (tj == 0))
    def _():
        out_ref[0, 0] = 0.0
        out_ref[0, 1] = 0.0

    @pl.when(tj >= ti)
    def _():
        pi = pl.ds(ti * _TILE, _TILE)
        pj = pl.ds(tj * _TILE, _TILE)
        d2a = _d2_mxu(pa_ref, pi, pj)
        d2b = _d2_mxu(pb_ref, pi, pj)
        elem = (d2a + d2b) - 2.0 * jnp.sqrt(d2a * d2b)
        w = dp._pair_mask(m_ref, ti, tj)
        out_ref[0, 0] += jnp.sum(elem * w)
        out_ref[0, 1] += jnp.sum(w)


def _bwd_kernel_mxu(pa_ref, pb_ref, m_ref, out_ref):
    """d/da of the pair-sum, MXU contraction form.

    ga[k] = sum_j coef_kj (a_k - a_j)  (coef symmetric)
          = a_k * rowsum(coef) - coef @ a
    computed per upper-tri tile pair; row block gets the row form, column
    block the transposed form.
    """
    ti = pl.program_id(0)
    tj = pl.program_id(1)

    @pl.when((ti == 0) & (tj == 0))
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    @pl.when(tj >= ti)
    def _():
        pi = pl.ds(ti * _TILE, _TILE)
        pj = pl.ds(tj * _TILE, _TILE)
        d2a = _d2_mxu(pa_ref, pi, pj)
        d2b = _d2_mxu(pb_ref, pi, pj)
        ra = jax.lax.rsqrt(d2a)
        w = dp._pair_mask(m_ref, ti, tj)
        # coef = 2 w (Da - Db)/Da = 2 w (1 - sqrt(d2b) * rsqrt(d2a))
        coef = 2.0 * w * (1.0 - jnp.sqrt(d2b) * ra)
        xa_i = pa_ref[:, pi]             # (3, T)
        xa_j = pa_ref[:, pj]
        rs = jnp.sum(coef, axis=1)       # (T,)
        cs = jnp.sum(coef, axis=0)       # (T,)
        # coef @ xa_j^T -> (T_i, 3); contract j on coef dim1 x xa_j dim1
        mj = jax.lax.dot_general(
            coef, xa_j, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)  # (T, 3)
        mi = jax.lax.dot_general(
            coef, xa_i, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)  # (T, 3)
        out_ref[:, pi] += xa_i * rs[None, :] - mj.T
        out_ref[:, pj] += xa_j * cs[None, :] - mi.T


def _call_fwd(kernel, a, b, mask, interpret):
    pa, pb, m, n_pad = dp._pad_inputs(a, b, mask)
    n_tiles = n_pad // _TILE
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.float32),
        interpret=interpret,
    )(pa, pb, m[None, :])
    return out[0, 0], out[0, 1]


def _call_bwd(kernel, a, b, mask, interpret):
    pa, pb, m, n_pad = dp._pad_inputs(a, b, mask)
    n_tiles = n_pad // _TILE
    ga = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pa, pb, m[None, :])
    return ga.T[: a.shape[0]]


# ---------------------------------------------------------------- harness
def parity(interpret: bool):
    rng = np.random.default_rng(0)
    n = 700
    a = jnp.asarray(rng.normal(0, 30, (n, 3)), jnp.float32)
    b = jnp.asarray(a + rng.normal(0, 1, (n, 3)), jnp.float32)
    mask = jnp.asarray(rng.random(n) > 0.2)
    s0, c0 = dp.drmsd_stats_pallas(a, b, mask)
    want_s = float(s0)
    for name, k in [("sqrt1", _fwd_kernel_sqrt1), ("mxu", _fwd_kernel_mxu)]:
        s, c = _call_fwd(k, a, b, mask.astype(jnp.float32), interpret)
        rel = abs(float(s) - want_s) / max(abs(want_s), 1e-9)
        print(f"fwd {name}: s={float(s):.6f} want={want_s:.6f} rel={rel:.2e} "
              f"count_ok={float(c) == float(c0)}")
        assert rel < 1e-5, name
    # bwd parity vs production VJP
    ga0 = jax.grad(
        lambda x: dp.drmsd_stats_pallas(x, b, mask)[0])(a)
    ga1 = _call_bwd(_bwd_kernel_mxu, a, b, mask.astype(jnp.float32),
                    interpret)
    scale = float(jnp.max(jnp.abs(ga0)))
    err = float(jnp.max(jnp.abs(ga0 - ga1)))
    print(f"bwd mxu: maxerr={err:.3e} scale={scale:.3e} rel={err/scale:.2e}")
    assert err < 1e-4 * max(scale, 1.0)
    print("parity OK")


def bench(shapes=((256, 8), (500, 8))):
    for L, B in shapes:
        n = L * 14
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.normal(0, 30, (B, n, 3)), jnp.float32)
        b = jnp.asarray(a + rng.normal(0, 1, (B, n, 3)), jnp.float32)
        mask = jnp.asarray(rng.random((B, n)) > 0.1).astype(jnp.float32)

        def timeit(f, *args):
            g = jax.jit(f)
            r = g(*args)
            jax.block_until_ready(r)
            t0 = time.time()
            for _ in range(20):
                r = g(*args)
            jax.block_until_ready(r)
            return (time.time() - t0) / 20 * 1e3

        fwd_cur = lambda a, b, m: jax.vmap(
            lambda x, y, w: dp.drmsd_stats_pallas(x, y, w)[0])(a, b, m)
        fwd_sq = lambda a, b, m: jax.vmap(
            lambda x, y, w: _call_fwd(_fwd_kernel_sqrt1, x, y, w, False)[0])(
                a, b, m)
        fwd_mx = lambda a, b, m: jax.vmap(
            lambda x, y, w: _call_fwd(_fwd_kernel_mxu, x, y, w, False)[0])(
                a, b, m)
        g_cur = jax.vmap(jax.grad(
            lambda x, y, w: dp.drmsd_stats_pallas(x, y, w)[0]))
        bwd_mx = lambda a, b, m: jax.vmap(
            lambda x, y, w: _call_bwd(_bwd_kernel_mxu, x, y, w, False))(
                a, b, m)

        print(f"-- L={L} B={B} (N={n})")
        print(f"  fwd  cur  : {timeit(fwd_cur, a, b, mask):7.2f} ms")
        print(f"  fwd  sqrt1: {timeit(fwd_sq, a, b, mask):7.2f} ms")
        print(f"  fwd  mxu  : {timeit(fwd_mx, a, b, mask):7.2f} ms")
        print(f"  bwd  cur  : {timeit(g_cur, a, b, mask):7.2f} ms")
        print(f"  bwd  mxu  : {timeit(bwd_mx, a, b, mask):7.2f} ms")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpreter parity check only")
    ap.add_argument("--parity", action="store_true")
    args = ap.parse_args()
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
        import functools
        pl.pallas_call = functools.partial(pl.pallas_call, interpret=True)
        dp.pl.pallas_call = pl.pallas_call
        parity(True)
    else:
        if args.parity:
            parity(False)
        bench()
