#!/usr/bin/env python
"""Flash vs XLA encoder self-attention A/B on the real TPU.

Two levels, each printed as one JSON line:
  1. op-level: masked self-attention fwd and fwd+bwd at ladder shapes
     (numeric max-abs-diff on VALID rows + p50 per impl, dependency-
     chained paired windows);
  2. eval-step level: the Trainer's full jitted eval step (model fwd +
     all dRMSD-family metrics) with attention_impl xla vs flash, at the
     reference B=4 shape and a batched-inference B=32 shape.

Usage: python tools/bench_attention.py [--level op|eval|all]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from protein_transformer_tpu.utils import enable_compilation_cache
enable_compilation_cache()

SHAPES = [  # (b, h, l, dm)
    (8, 8, 256, 512),
    (4, 8, 500, 1024),
    (64, 8, 500, 1024),
]


def _p50(step, first, k=20, samples=6):
    """Per-iteration p50 of `step` (state -> state) via paired-window
    differencing: each call chains on the previous result, so a window of
    K dispatches executes serially on device; (T_2k - T_k)/k cancels the
    fixed ~26 ms tunnel sync/ramp cost that would otherwise dominate."""
    import jax

    def window(n):
        s = first
        for _ in range(3):
            s = step(s)
        jax.block_until_ready(s)
        t0 = time.perf_counter()
        for _ in range(n):
            s = step(s)
        jax.block_until_ready(s)
        return time.perf_counter() - t0

    out = []
    for _ in range(samples):
        t1, t2 = window(k), window(2 * k)
        out.append((t2 - t1) / k)
    return float(np.median(out))


def bench_op():
    import jax
    import jax.numpy as jnp
    from protein_transformer_tpu.ops.attention import flash_self_attention

    rows = []
    for b, h, l, dm in SHAPES:
        d = dm // h
        rng = np.random.default_rng(0)
        q, k, v = (jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
                   for _ in range(3))
        n_valid = np.maximum((rng.integers(l // 2, l + 1, b)), 1)
        valid = jnp.asarray(np.arange(l)[None] < n_valid[:, None])
        scale = 1.0 / np.sqrt(d)

        @jax.jit
        def xla(q, k, v):
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                preferred_element_type=jnp.float32) * scale
            scores = jnp.where(valid[:, None, None, :], scores,
                               jnp.finfo(jnp.float32).min)
            p = jax.nn.softmax(scores, axis=-1)
            return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v)

        @jax.jit
        def flash(q, k, v):
            return flash_self_attention(q, k, v, valid, sm_scale=scale)

        o_x, o_f = xla(q, k, v), flash(q, k, v)
        m = np.asarray(valid)[:, None, :, None]
        diff = float(np.max(np.abs(np.where(m, np.asarray(o_x - o_f), 0.0))))

        # fwd+bwd: grad wrt q,k,v of a valid-row reduction
        def mk_loss(f):
            return jax.jit(jax.grad(
                lambda q, k, v: jnp.sum(jnp.where(m, f(q, k, v), 0.0)),
                argnums=(0, 1, 2)))

        g_x, g_f = mk_loss(xla), mk_loss(flash)
        gx, gf = g_x(q, k, v), g_f(q, k, v)
        gdiff = float(max(np.max(np.abs(np.asarray(a - b)))
                          for a, b in zip(gx, gf)))

        # chain q through the op so a dispatch window executes serially
        rows.append({
            "level": "op", "b": b, "h": h, "l": l, "dm": dm,
            "fwd_max_abs_diff": diff, "grad_max_abs_diff": gdiff,
            "xla_fwd_ms": round(_p50(lambda s: xla(s, k, v), q) * 1e3, 3),
            "flash_fwd_ms": round(_p50(lambda s: flash(s, k, v), q) * 1e3,
                                  3),
            "xla_fwdbwd_ms": round(_p50(lambda s: g_x(s, k, v)[0], q) * 1e3,
                                   3),
            "flash_fwdbwd_ms": round(_p50(lambda s: g_f(s, k, v)[0],
                                          q) * 1e3, 3),
        })
        print(json.dumps(rows[-1]), flush=True)
    return rows


def bench_eval_step(b=4, l=500, dm=1024):
    """Full jitted eval step (model + metrics) A/B."""
    import jax
    from protein_transformer_tpu.config import TrainConfig
    from protein_transformer_tpu.training.trainer import Trainer
    from protein_transformer_tpu.data.synthetic import make_dataset
    from protein_transformer_tpu.data.dataset import collate
    from protein_transformer_tpu.parallel.mesh import shard_batch

    out = {"level": "eval_step", "b": b, "l": l, "dm": dm}
    metrics = {}
    for impl in ("xla", "flash"):
        cfg = TrainConfig(
            model="conv-enc|21,11,3|1,1,1", d_model=dm, d_ff=4 * dm,
            n_heads=8, n_layers=6, loss="lndrmsd", backbone_loss=True,
            optimizer="adam", lr_scheduling="noam", dropout=0.1,
            max_seq_len=l, bucket_sizes=(l,), batch_size=b, train_only=True,
            name=f"attnbench-{impl}", out_dir="/tmp/bench_runs",
            attention_impl=impl)
        data = make_dataset(n_train=b, n_eval=2, min_len=l - 1, max_len=l,
                            seed=0)
        tr = Trainer(cfg, data=data)
        state = tr.init_state()
        step = tr._eval_step_fn()
        batch = collate(tr.dm.train, np.arange(b), cfg.bucket_sizes,
                        tr.dm.max_seq_len, batch_multiple=tr.dm.batch_multiple)
        bd = shard_batch(batch, tr.mesh)

        # unchained dispatches still execute in order on the device
        # queue; paired windows cancel the fixed sync cost
        def window(n):
            r = step(state.params, bd)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            for _ in range(n):
                r = step(state.params, bd)
            jax.block_until_ready(r)
            return time.perf_counter() - t0

        k = 20
        obs = []
        for _ in range(6):
            t1, t2 = window(k), window(2 * k)
            obs.append((t2 - t1) / k)
        dt = float(np.median(obs))
        metrics[impl] = dt
        out[f"{impl}_eval_ms"] = round(dt * 1e3, 2)
        del tr
        jax.clear_caches()
    out["speedup"] = round(metrics["xla"] / metrics["flash"], 3)
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--level", default="all", choices=["op", "eval", "all"])
    args = ap.parse_args()
    if args.level in ("op", "all"):
        bench_op()
    if args.level in ("eval", "all"):
        bench_eval_step(b=4)
        bench_eval_step(b=32)


if __name__ == "__main__":
    main()
