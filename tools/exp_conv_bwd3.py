#!/usr/bin/env python
"""Config-5 conv front-end timing with CHAINED calls.

exp_conv_bwd2.py showed repeated dispatches of the same (executable, args)
pair complete impossibly fast (153 GFLOP in 0.098 ms) -- identical calls are
evidently deduped somewhere below jit on this platform. Here every call's
input depends on the previous call's output, so each execution is forced.
This matches the real trainer, whose params change every step.
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

B, L, DM, DFF, NL = 4, 500, 1024, 4096, 6
KS = (21, 11, 3)

print("devices:", jax.devices(), flush=True)


class ConvStack(nn.Module):
    @nn.compact
    def __call__(self, x):
        for k in KS:
            x = nn.Conv(DM, (k,), padding="SAME",
                        kernel_init=nn.initializers.xavier_uniform())(x)
        # keep magnitudes bounded so the chain can iterate forever
        return x / (1e-6 + jnp.sqrt(jnp.mean(x * x)))


class UnfoldConvStack(nn.Module):
    """Same op lowered as pad -> stacked shifts -> one matmul per layer."""
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
        return x / (1e-6 + jnp.sqrt(jnp.mean(x * x)))


class EncStack(nn.Module):
    @nn.compact
    def __call__(self, x, mask):
        from protein_transformer_tpu.models.transformer import EncoderLayer
        for _ in range(NL):
            x = EncoderLayer(DM, DFF, 8, 0.1, True, jnp.float32)(
                x, mask, True)
        return x / (1e-6 + jnp.sqrt(jnp.mean(x * x)))


def bench_chained(step, x0, label=""):
    """step: x -> x (jitted). Chains k calls; paired-window differencing."""
    x = step(x0)
    jax.block_until_ready(x)

    def window(k, x):
        t0 = time.time()
        for _ in range(k):
            x = step(x)
        jax.block_until_ready(x)
        return time.time() - t0, x

    k = 10
    samples = []
    for _ in range(5):
        t1, x = window(k, x)
        t2, x = window(2 * k, x)
        samples.append((t2 - t1) / k)
    p50 = float(np.median(samples)) * 1e3
    print(f"{label:28s} {p50:7.2f} ms", flush=True)
    return p50


def run(name, Mod, with_mask=False):
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (B, L, DM), jnp.float32)
    mask = jnp.ones((B, 1, 1, L), bool)
    m = Mod()
    args0 = (x0, mask) if with_mask else (x0,)
    params = m.init(rng, *args0)

    if with_mask:
        fwd = jax.jit(lambda a: m.apply(params, a, mask))

        def lossg(a):
            return jnp.sum(m.apply(params, a, mask) ** 2)
    else:
        fwd = jax.jit(lambda a: m.apply(params, a))

        def lossg(a):
            return jnp.sum(m.apply(params, a) ** 2)

    bench_chained(fwd, x0, label=f"{name} fwd")

    raw_g = jax.grad(lossg)
    # chain through the gradient: next input = normalized input-gradient
    g = jax.jit(lambda a: raw_g(a) / (1e-6 + jnp.sqrt(
        jnp.mean(raw_g(a) ** 2))) if False else
        (lambda gg: gg / (1e-6 + jnp.sqrt(jnp.mean(gg * gg))))(raw_g(a)))
    bench_chained(g, x0, label=f"{name} fwd+bwd(dx)")

    ca = jax.jit(raw_g).lower(x0).compile().cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    print(f"{name} fwd+bwd flops: {ca.get('flops'):.3e}", flush=True)


run("conv(nn.Conv)", ConvStack)
run("conv(unfold-matmul)", UnfoldConvStack)
run("encoder", EncStack, with_mask=True)
