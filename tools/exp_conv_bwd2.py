#!/usr/bin/env python
"""Careful re-measurement of the conv front-end at config-5 shapes."""
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

print("devices:", jax.devices(), flush=True)


class ConvStack(nn.Module):
    @nn.compact
    def __call__(self, x):
        for k in KS:
            x = nn.Conv(DM, (k,), padding="SAME",
                        kernel_init=nn.initializers.xavier_uniform())(x)
        return x


def time_it(fn, *args, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    # big-window timing: one sync per window, window long enough that the
    # fixed sync cost (~1 tunnel RTT ~26ms) is amortized
    for k in (50,):
        t0 = time.time()
        o = None
        for _ in range(k):
            o = fn(*args)
        jax.block_until_ready(o)
        dt = (time.time() - t0) / k * 1e3
        print(f"{label:28s} k={k:3d}  {dt:7.3f} ms/call", flush=True)


rng = jax.random.PRNGKey(0)
x = jax.random.normal(rng, (B, L, DM), jnp.float32)
m = ConvStack()
params = m.init(rng, x)

fwd = jax.jit(lambda p, a: m.apply(p, a))
lowered = fwd.lower(params, x).compile()
ca = lowered.cost_analysis()
ca = ca[0] if isinstance(ca, list) else ca
print("fwd flops(cost_analysis):", ca.get("flops"), flush=True)
time_it(fwd, params, x, label="conv fwd")


def loss(p, a):
    return jnp.sum(m.apply(p, a) ** 2)


g = jax.jit(jax.grad(loss))
lg = g.lower(params, x).compile()
ca = lg.cost_analysis()
ca = ca[0] if isinstance(ca, list) else ca
print("fwd+bwd flops(cost_analysis):", ca.get("flops"), flush=True)
time_it(g, params, x, label="conv fwd+bwd")
