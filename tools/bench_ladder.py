#!/usr/bin/env python
"""Config-ladder step benchmark (BASELINE.md ladder) on the real TPU.

Measures the raw jitted train step (same method as bench.py main) for the
BASELINE.md config ladder entries that exercise distinct regimes:

  1. enc-only dm=64 nl=2, mse            (B=8, L=64)   -- tiny CPU-class
  2. conv-enc dm=256, mse + noam          (B=8, L=256)  -- conv front-end
  3. enc-only dm=256, drmsd               (B=8, L=256)  -- NeRF in-step
  4. conv-enc dm=512 nl=6, combined       (B=8, L=256)  -- flagship (bench.py)
  5. conv-enc dm=1024, lndrmsd+backbone   (B=4, L=500)  -- big-model ladder top

Usage: python tools/bench_ladder.py [--configs 5] [--steps 30]
"""
from __future__ import annotations

import argparse
import json
import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from protein_transformer_tpu.utils import enable_compilation_cache
enable_compilation_cache()

LADDER = {
    1: dict(model="enc-only", d_model=64, d_ff=256, n_heads=2, n_layers=2,
            loss="mse", b=8, l=64, backbone_loss=False),
    2: dict(model="conv-enc|21,11,3|1,1,1", d_model=256, d_ff=1024,
            n_heads=8, n_layers=4, loss="mse", b=8, l=256,
            backbone_loss=False),
    3: dict(model="enc-only", d_model=256, d_ff=1024, n_heads=8, n_layers=4,
            loss="drmsd", b=8, l=256, backbone_loss=False),
    4: dict(model="conv-enc|21,11,3|1,1,1", d_model=512, d_ff=2048,
            n_heads=8, n_layers=6, loss="combined", b=8, l=256,
            backbone_loss=False),
    5: dict(model="conv-enc|21,11,3|1,1,1", d_model=1024, d_ff=4096,
            n_heads=8, n_layers=6, loss="lndrmsd", b=4, l=500,
            backbone_loss=True),
}


def bench_config(idx: int, steps: int, dtype: str = "float32",
                 b_override: int | None = None,
                 probe_max_batch: bool = False,
                 dropout: float = 0.1, optimizer: str = "adam",
                 clip: float = 1.0) -> dict:
    import jax
    import jax.numpy as jnp

    from protein_transformer_tpu.config import TrainConfig
    from protein_transformer_tpu.training.trainer import Trainer
    from protein_transformer_tpu.data.synthetic import make_dataset
    from protein_transformer_tpu.data.dataset import collate
    from protein_transformer_tpu.parallel.mesh import shard_batch
    from protein_transformer_tpu.training import flops as F

    spec = LADDER[idx]
    b, l = b_override or spec["b"], spec["l"]
    cfg = TrainConfig(
        model=spec["model"], d_model=spec["d_model"], d_ff=spec["d_ff"],
        n_heads=spec["n_heads"], n_layers=spec["n_layers"], loss=spec["loss"],
        backbone_loss=spec["backbone_loss"], optimizer=optimizer, clip=clip,
        lr_scheduling="noam", dropout=dropout, max_seq_len=l,
        bucket_sizes=(l,),
        batch_size=b, train_only=True, name=f"ladder{idx}",
        out_dir="/tmp/bench_runs", compute_dtype=dtype)
    data = make_dataset(n_train=min(b, 64), n_eval=2, min_len=l - 1,
                        max_len=l, seed=0)
    trainer = Trainer(cfg, data=data)
    if probe_max_batch:
        # The framework's own operating point: 0.8x the HBM OOM frontier
        # (reference -adbs semantics, train.py:532-551), not the reference's
        # CPU-era B. The probe runs in a SUBPROCESS (the reference's own
        # child-process design): measuring in the process that just OOMed
        # repeatedly produced collapsed paired-window timings (r5 campaign:
        # 1.33 "ms"/step for a 200 ms step), so the bench process itself
        # must never have hit RESOURCE_EXHAUSTED.
        import subprocess
        from protein_transformer_tpu.data.dataset import bucket_batch_size
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--configs",
             str(idx), "--dtype", dtype, "--probe-only"],
            capture_output=True, text=True)
        lines = [ln for ln in p.stdout.splitlines() if ln.startswith("MAXB=")]
        if p.returncode != 0 or not lines:
            raise RuntimeError(f"probe subprocess failed: {p.stderr[-500:]}")
        b = max(1, int(0.8 * int(lines[-1].split("=")[1])))
        # land on the collate shape lattice so padded == real rows
        while bucket_batch_size(b, trainer.dm.batch_multiple) != b:
            b -= 1
        cfg.batch_size = b
        del trainer
        trainer = Trainer(cfg, data=data)
    state = trainer.init_state()
    step_fn = trainer._train_step_fn()
    batch = collate(trainer.dm.train,
                    np.resize(np.arange(len(trainer.dm.train)), b),
                    cfg.bucket_sizes, trainer.dm.max_seq_len,
                    batch_multiple=trainer.dm.batch_multiple)
    assert batch.seq.shape == (b, l), batch.seq.shape
    batch_dev = shard_batch(batch, trainer.mesh)
    lr_scale = jnp.float32(1.0)

    params, opt_state, step_no = state.params, state.opt_state, state.step
    for _ in range(2):
        params, opt_state, step_no, out, _ = step_fn(
            params, opt_state, step_no, batch_dev, trainer.rng, lr_scale)
        jax.block_until_ready((params, out))

    # Paired-window differencing (same as bench.py main): time a K-step and
    # a 2K-step window, each ending in one blocking sync; (T2-T1)/K cancels
    # the fixed per-window sync/dispatch cost (~1 tunnel RTT) exactly.
    def window(k):
        nonlocal params, opt_state, step_no, out
        t0 = time.time()
        for _ in range(k):
            params, opt_state, step_no, out, _ = step_fn(
                params, opt_state, step_no, batch_dev, trainer.rng, lr_scale)
        jax.block_until_ready(out)
        return time.time() - t0

    k = max(5, steps // 10)
    samples = []
    debug = bool(os.environ.get("PTT_BENCH_DEBUG"))
    for _ in range(8):
        t1, t2 = window(k), window(2 * k)
        samples.append((t2 - t1) / k)
        if debug:
            print(f"[debug] k={k} t1={t1 * 1e3:.1f}ms t2={t2 * 1e3:.1f}ms "
                  f"-> {samples[-1] * 1e3:.2f} ms/step", file=sys.stderr)
    dt = float(np.median(samples))
    p95 = float(np.percentile(samples, 95))
    return {"config": idx, "loss": spec["loss"], "b": b, "l": l,
            "dtype": dtype, "dropout": dropout, "optimizer": optimizer,
            "clip": clip, "step_ms": round(dt * 1e3, 2),
            "step_ms_p95": round(p95 * 1e3, 2),
            "res_per_sec": round(b * l / dt, 1),
            "tflops_per_step": round(F.train_step_flops(cfg, b, l) / 1e12, 4),
            "mfu": round(F.mfu(cfg, b, l, dt,
                               n_chips=jax.device_count()), 4)}


def probe_only(idx: int, dtype: str) -> None:
    """OOM-probe the config's HBM frontier and print MAXB=<raw max>.

    Runs as a subprocess of --max-batch so the measuring process never
    experiences RESOURCE_EXHAUSTED itself."""
    from protein_transformer_tpu.config import TrainConfig
    from protein_transformer_tpu.training.trainer import Trainer
    from protein_transformer_tpu.data.synthetic import make_dataset
    from protein_transformer_tpu.training.batch_probe import (
        probe_trainer_batch_size)

    spec = LADDER[idx]
    b, l = spec["b"], spec["l"]
    cfg = TrainConfig(
        model=spec["model"], d_model=spec["d_model"], d_ff=spec["d_ff"],
        n_heads=spec["n_heads"], n_layers=spec["n_layers"], loss=spec["loss"],
        backbone_loss=spec["backbone_loss"], optimizer="adam",
        lr_scheduling="noam", dropout=0.1, max_seq_len=l, bucket_sizes=(l,),
        batch_size=b, train_only=True, name=f"ladder{idx}probe",
        out_dir="/tmp/bench_runs", compute_dtype=dtype)
    data = make_dataset(n_train=min(b, 64), n_eval=2, min_len=l - 1,
                        max_len=l, seed=0)
    trainer = Trainer(cfg, data=data)
    raw = probe_trainer_batch_size(trainer, length=l, start=max(b, 1),
                                   keep_fraction=1.0)
    print(f"MAXB={raw}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=int, nargs="*", default=[1, 3, 4, 5])
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--batch", type=int, default=None,
                    help="override the config's batch size")
    ap.add_argument("--max-batch", action="store_true",
                    help="probe the HBM frontier (-adbs) and bench at 0.8x")
    ap.add_argument("--probe-only", action="store_true",
                    help="internal: print MAXB=<raw frontier> and exit")
    ap.add_argument("--dropout", type=float, default=0.1,
                    help="ablation override (step-time decomposition)")
    ap.add_argument("--optimizer", default="adam",
                    choices=["adam", "sgd"], help="ablation override")
    ap.add_argument("--clip", type=float, default=1.0,
                    help="ablation override; 0 disables global-norm clip")
    args = ap.parse_args()
    if args.probe_only:
        for idx in args.configs:
            probe_only(idx, args.dtype)
        return
    for idx in args.configs:
        print(json.dumps(bench_config(idx, args.steps, args.dtype,
                                      b_override=args.batch,
                                      probe_max_batch=args.max_batch,
                                      dropout=args.dropout,
                                      optimizer=args.optimizer,
                                      clip=args.clip)),
              flush=True)


if __name__ == "__main__":
    main()
