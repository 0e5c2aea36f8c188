#!/usr/bin/env python
"""Attribute config-5's backward excess: conv front-end vs encoder stack.

Benches fwd and fwd+bwd in isolation at config-5 shapes (B=4, L=500,
dm=1024, dff=4096, nl=6, convs 21/11/3 @ 1024ch) for:
  - conv stack alone (flax nn.Conv, as shipped)
  - conv stack as unfold->matmul (candidate rewrite)
  - encoder stack alone
"""
from __future__ import annotations

import functools
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

B, L, DM, DFF, NL = 4, 500, 1024, 4096, 6
KS = (21, 11, 3)


class ConvStack(nn.Module):
    @nn.compact
    def __call__(self, x):
        for k in KS:
            x = nn.Conv(DM, (k,), padding="SAME",
                        kernel_init=nn.initializers.xavier_uniform())(x)
        return x


class UnfoldConvStack(nn.Module):
    """Same op, lowered as pad -> stacked shifts -> one matmul per layer."""
    @nn.compact
    def __call__(self, x):
        for k in KS:
            w = self.param(f"w{k}", nn.initializers.xavier_uniform(),
                           (k * DM, DM))
            b = self.param(f"b{k}", nn.initializers.zeros, (DM,))
            p = k // 2
            xp = jnp.pad(x, ((0, 0), (p, p), (0, 0)))
            cols = [xp[:, i:i + L, :] for i in range(k)]
            xu = jnp.concatenate(cols, axis=-1)  # (B, L, k*DM)
            x = xu @ w + b
        return x


class EncStack(nn.Module):
    @nn.compact
    def __call__(self, x, mask):
        from protein_transformer_tpu.models.transformer import EncoderLayer
        for _ in range(NL):
            x = EncoderLayer(DM, DFF, 8, 0.1, True, jnp.float32)(
                x, mask, True)
        return x


def bench(fn, *args, label=""):
    out = fn(*args)
    jax.block_until_ready(out)

    def window(k):
        o = None
        t0 = time.time()
        for _ in range(k):
            o = fn(*args)
        jax.block_until_ready(o)
        return time.time() - t0

    k = 10
    samples = []
    for _ in range(6):
        t1, t2 = window(k), window(2 * k)
        samples.append((t2 - t1) / k)
    p50 = float(np.median(samples)) * 1e3
    print(f"{label:28s} {p50:7.2f} ms", flush=True)
    return p50


def main():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, L, DM), jnp.float32)
    mask = jnp.ones((B, 1, 1, L), bool)

    for name, Mod, args in [("conv(nn.Conv)", ConvStack, (x,)),
                            ("conv(unfold-matmul)", UnfoldConvStack, (x,))]:
        m = Mod()
        params = m.init(rng, *args)

        fwd = jax.jit(lambda p, *a: m.apply(p, *a))
        bench(fwd, params, *args, label=f"{name} fwd")

        def loss(p, *a):
            return jnp.sum(m.apply(p, *a) ** 2)
        g = jax.jit(jax.grad(loss))
        bench(g, params, *args, label=f"{name} fwd+bwd")

    m = EncStack()
    params = m.init(rng, x, mask)
    fwd = jax.jit(lambda p: m.apply(p, x, mask))
    bench(fwd, params, label="encoder fwd")

    def loss(p):
        return jnp.sum(m.apply(p, x, mask) ** 2)
    g = jax.jit(jax.grad(loss))
    bench(g, params, label="encoder fwd+bwd")


if __name__ == "__main__":
    main()
