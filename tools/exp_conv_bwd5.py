#!/usr/bin/env python
"""Ground-truth conv timing: long chained windows ended by a DATA FETCH.

block_until_ready appears unreliable over the axon tunnel (exp_conv_bwd4
measured 147 GFLOP in 25 us). A fetch of the final result's bytes cannot
resolve before the computation actually ran, so (fetch(end) - t0) / N over
a long chain bounds the true per-call device time.
"""
from __future__ import annotations

import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from protein_transformer_tpu.utils import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp
import flax.linen as nn

B, L, DM = 4, 500, 1024
KS = (21, 11, 3)

t_start = time.time()


def stamp(msg):
    print(f"[{time.time() - t_start:7.1f}s] {msg}", flush=True)


stamp(f"devices: {jax.devices()}")


class ConvStack(nn.Module):
    @nn.compact
    def __call__(self, x):
        for k in KS:
            x = nn.Conv(DM, (k,), padding="SAME",
                        kernel_init=nn.initializers.xavier_uniform())(x)
        return x / (1e-6 + jnp.sqrt(jnp.mean(x * x)))


rng = jax.random.PRNGKey(0)
x0 = jax.random.normal(rng, (B, L, DM), jnp.float32)
m = ConvStack()
params = m.init(rng, x0)
fwd = jax.jit(lambda p, a: m.apply(p, a)).lower(params, x0).compile()

x = fwd(params, x0)
_ = np.asarray(x[0, 0, :3])
stamp("compiled + warm")


def timed_chain(n, label):
    global x
    t0 = time.time()
    for _ in range(n):
        x = fwd(params, x)
    probe = np.asarray(x[0, 0, :3])  # real bytes: cannot arrive early
    dt = time.time() - t0
    stamp(f"{label}: n={n} total={dt:.3f}s -> {dt / n * 1e3:.3f} ms/call "
          f"(probe={probe[0]:.4f})")
    return dt / n


timed_chain(50, "chain+fetch 50")
timed_chain(200, "chain+fetch 200")
timed_chain(800, "chain+fetch 800")

# fwd+bwd version
def loss(p, a):
    return jnp.sum(m.apply(p, a) ** 2)


gx = jax.grad(loss, argnums=1)
g = jax.jit(lambda p, a: (lambda gg: gg / (1e-6 + jnp.sqrt(jnp.mean(gg * gg))))
            (gx(p, a))).lower(params, x0).compile()
x = g(params, x0)
_ = np.asarray(x[0, 0, :3])
stamp("grad compiled + warm")


def timed_chain_g(n, label):
    global x
    t0 = time.time()
    for _ in range(n):
        x = g(params, x)
    probe = np.asarray(x[0, 0, :3])
    dt = time.time() - t0
    stamp(f"{label}: n={n} total={dt:.3f}s -> {dt / n * 1e3:.3f} ms/call "
          f"(probe={probe[0]:.4f})")


timed_chain_g(50, "grad chain+fetch 50")
timed_chain_g(200, "grad chain+fetch 200")
