#!/usr/bin/env python
"""Micro-benchmark of the angles->coords builder (fwd and fwd+bwd) on TPU.

Used to attribute and tune the geometry share of the train step
(VERDICT round 1: ~6 ms of the 15.9 ms step was geometry op soup).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, steps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps * 1e3  # ms


def main():
    from protein_transformer_tpu.protein.geometry import build_coords_batch

    b = int(os.environ.get("B", "8"))
    l = int(os.environ.get("L", "256"))
    rng = np.random.default_rng(0)
    angles = jnp.asarray(rng.uniform(-np.pi, np.pi, (b, l, 12)), jnp.float32)
    seq = jnp.asarray(rng.integers(0, 20, (b, l)), jnp.int32)

    fwd = jax.jit(build_coords_batch)

    def loss(a):
        return jnp.sum(build_coords_batch(a, seq) ** 2)

    grad = jax.jit(jax.grad(loss))

    t_f = timeit(fwd, angles, seq)
    t_g = timeit(grad, angles)
    print(f"B={b} L={l}  fwd {t_f:.3f} ms   fwd+bwd {t_g:.3f} ms "
          f"({b*l/ (t_g/1e3):,.0f} res/s grad)")


if __name__ == "__main__":
    main()
