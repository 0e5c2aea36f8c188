#!/usr/bin/env python
"""Instrumented single-op probe: where does chained dispatch time go?"""
from __future__ import annotations

import sys
import os
import time

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
jax.block_until_ready(x0)
stamp("input ready")

m = ConvStack()
params = m.init(rng, x0)
jax.block_until_ready(params)
stamp("params ready")

fwd = jax.jit(lambda p, a: m.apply(p, a))
c = fwd.lower(params, x0).compile()
stamp("compiled")

x = c(params, x0)
jax.block_until_ready(x)
stamp("warmup call done")

# identical-args window (the exp2 method)
t0 = time.time()
o = None
for _ in range(20):
    o = c(params, x0)
jax.block_until_ready(o)
stamp(f"20 identical calls: {(time.time() - t0) / 20 * 1e3:.3f} ms/call")

# chained window
t0 = time.time()
for i in range(20):
    x = c(params, x)
    if i < 3:
        stamp(f"  chained dispatch {i} returned")
jax.block_until_ready(x)
stamp(f"20 chained calls: {(time.time() - t0) / 20 * 1e3:.3f} ms/call")

# chained with per-call sync
t0 = time.time()
for _ in range(10):
    x = c(params, x)
    jax.block_until_ready(x)
stamp(f"10 chained+synced calls: {(time.time() - t0) / 10 * 1e3:.3f} ms/call")
