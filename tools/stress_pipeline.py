#!/usr/bin/env python
"""Input-pipeline stress test at production (CASP12) dataset scale.

Measures, on a dataset of --n_train chains (default 24k, ~CASP12's
training-set order of magnitude; reference README.md:237 cites a ~3 GB
.pt), each stage a training run pays once or per epoch:

  gen        one-time dataset generation (tools/gen_scale_data.py)
  load       cold shard read -> raw dict
  split      ProteinSplit/BinnedDataset build (per-protein python loop)
  store      DeviceStore flat-array build + device upload
  plan       one full epoch of sampler batch planning (no compute)
  collate    one full epoch of host collate (the non-device-data path)

Prints one JSON line per stage. Anything superlinear between --n_train
values is a pipeline bug.

Usage: python tools/stress_pipeline.py [--n_train 24000] [--out /tmp/stress]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def stage(name, t0, **extra):
    row = {"stage": name, "seconds": round(time.time() - t0, 3), **extra}
    print(json.dumps(row), flush=True)
    return time.time()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_train", type=int, default=24000)
    ap.add_argument("--n_eval", type=int, default=1000)
    ap.add_argument("--out", default="/tmp/stress_data")
    ap.add_argument("--skip_gen", action="store_true",
                    help="reuse an existing --out dataset")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU jax (generation + store build)")
    args = ap.parse_args()

    if args.cpu:
        os.environ["PTT_FORCE_CPU"] = "1"
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    t0 = time.time()
    if not args.skip_gen:
        env = dict(os.environ, JAX_PLATFORMS="cpu", PTT_FORCE_CPU="1")
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "gen_scale_data.py"),
             "--out", args.out, "--n_train", str(args.n_train),
             "--n_eval", str(args.n_eval)],
            check=True, env=env)
        t0 = stage("gen", t0, n_train=args.n_train)

    from protein_transformer_tpu.config import TrainConfig
    from protein_transformer_tpu.data.dataset import (
        DataModule, load_dataset)
    from protein_transformer_tpu.data import device_store as DS

    raw = load_dataset(args.out)
    n_res = sum(len(s) for s in raw["train"]["seq"])
    t0 = stage("load", t0, n_res=n_res,
               mb=round(sum(os.path.getsize(os.path.join(args.out, f))
                            for f in os.listdir(args.out)) / 1e6, 1))

    cfg = TrainConfig(name="stress", out_dir="/tmp/stress_runs",
                      batch_size=8, train_only=False).finalize()
    dm = DataModule(raw, cfg)
    t0 = stage("split", t0, n_train=len(dm.train),
               n_splits=1 + len(dm.eval_splits))

    store = DS.DeviceStore(dm.train, mesh=None)
    jax.block_until_ready(store.store["seq"])
    t0 = stage("store", t0,
               gb=round(DS.store_nbytes(dm.train) / 1e9, 3))

    rng = np.random.default_rng(0)
    plans = 0
    n_planned = 0
    for idx in dm.train_index_batches(rng):
        plan = DS.plan_batch(dm.train, idx, cfg.bucket_sizes,
                             dm.max_seq_len, dm.batch_multiple)
        plans += 1
        n_planned += plan.n_real
    t0 = stage("plan", t0, batches=plans, proteins=n_planned)

    rng = np.random.default_rng(0)
    n_collated = 0
    for batch in dm.train_batches(rng):
        n_collated += int(batch.protein_mask.sum())
    t0 = stage("collate", t0, batches=plans, proteins=n_collated,
               res_per_sec=round(n_res / max(time.time() - t0, 1e-9)))


if __name__ == "__main__":
    main()
