"""Fused sidechain Pallas kernel tests in interpreter mode (CPU-runnable).

The kernel's compiled-mode numerics are additionally verified on real TPU
hardware against the XLA slot chain (tools/bench mirror); these tests keep
the kernel logic — forward slot chain, liveness masking, hand-derived VJP —
covered in CI without TPU access. The oracle is the portable XLA path
(protein/geometry._build_sidechains_xla), itself golden-gated against the
reference torch builder (StructureBuilder.py:193-231) in test_geometry.py.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protein_transformer_tpu.protein import geometry as G


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    import functools
    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    yield


@pytest.fixture
def pallas_impl(monkeypatch):
    monkeypatch.setenv("PTT_SIDECHAIN_IMPL", "pallas")
    yield


def _random_protein(seed, L=50):
    rng = np.random.default_rng(seed)
    angles = jnp.asarray(rng.uniform(-np.pi, np.pi, (L, 12)), jnp.float32)
    seq = jnp.asarray(rng.integers(0, 20, (L,)), jnp.int32)
    return angles, seq


def _both_impls(fn, monkeypatch):
    monkeypatch.setenv("PTT_SIDECHAIN_IMPL", "xla")
    want = fn()
    monkeypatch.setenv("PTT_SIDECHAIN_IMPL", "pallas")
    got = fn()
    return want, got


def test_fwd_matches_xla(monkeypatch):
    angles, seq = _random_protein(0, L=37)
    want, got = _both_impls(lambda: G.build_coords(angles, seq), monkeypatch)
    assert float(jnp.max(jnp.abs(got - want))) < 1e-5


def test_fwd_all_amino_acids(monkeypatch):
    # every AA id appears, including multi-branch residues (ILE/THR/TRP)
    angles, _ = _random_protein(1, L=40)
    seq = jnp.asarray(np.arange(40) % 20, jnp.int32)
    want, got = _both_impls(lambda: G.build_coords(angles, seq), monkeypatch)
    assert float(jnp.max(jnp.abs(got - want))) < 1e-5
    # dead slots must be EXACTLY zero, not merely parity-close: the kernel's
    # liveness mask is its own code path
    from protein_transformer_tpu.protein import _ff14sb as ff
    n_sc = np.asarray(ff.SC_NUM_ATOMS)[np.asarray(seq)]     # (L,)
    got_np = np.asarray(got)
    for i in range(len(n_sc)):
        assert (got_np[i, 4 + int(n_sc[i]):14] == 0.0).all(), i


def test_grad_matches_xla(monkeypatch):
    angles, seq = _random_protein(2, L=45)

    def loss():
        def f(ang):
            crd = G.build_coords(ang, seq)
            return jnp.sum(jnp.sin(crd * 0.3))
        return jax.grad(f)(angles)

    want, got = _both_impls(loss, monkeypatch)
    scale = float(jnp.max(jnp.abs(want)))
    err = float(jnp.max(jnp.abs(got - want)))
    assert err < 1e-4 * max(scale, 1.0), (err, scale)


def test_vmap_batch(monkeypatch, pallas_impl):
    B, L = 3, 30
    rng = np.random.default_rng(3)
    angs = jnp.asarray(rng.uniform(-np.pi, np.pi, (B, L, 12)), jnp.float32)
    seqs = jnp.asarray(rng.integers(0, 20, (B, L)), jnp.int32)
    got = G.build_coords_batch(angs, seqs)
    monkeypatch.setenv("PTT_SIDECHAIN_IMPL", "xla")
    want = G.build_coords_batch(angs, seqs)
    assert float(jnp.max(jnp.abs(got - want))) < 1e-5


def test_padded_lanes_are_inert(monkeypatch):
    # L=50 pads to 128 lanes; padded lanes must not perturb values or grads
    angles, seq = _random_protein(4, L=50)

    def g():
        def f(ang):
            return jnp.sum(G.build_coords(ang, seq) ** 2)
        return jax.grad(f)(angles)

    want, got = _both_impls(g, monkeypatch)
    assert np.all(np.isfinite(np.asarray(got)))
    scale = float(jnp.max(jnp.abs(want)))
    assert float(jnp.max(jnp.abs(got - want))) < 1e-4 * max(scale, 1.0)
