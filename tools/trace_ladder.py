#!/usr/bin/env python
"""Capture a jax.profiler trace of N warm steps of a ladder config.

Usage: python tools/trace_ladder.py --config 5 --dtype bfloat16 --steps 10
Then:  python tools/analyze_trace.py /tmp/jax_trace_ladder --by source --steps 10
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from protein_transformer_tpu.utils import enable_compilation_cache
enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--logdir", default="/tmp/jax_trace_ladder")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tools.bench_ladder import LADDER
    from protein_transformer_tpu.config import TrainConfig
    from protein_transformer_tpu.training.trainer import Trainer
    from protein_transformer_tpu.data.synthetic import make_dataset
    from protein_transformer_tpu.data.dataset import collate
    from protein_transformer_tpu.parallel.mesh import shard_batch

    spec = LADDER[args.config]
    b, l = args.batch or spec["b"], spec["l"]
    cfg = TrainConfig(
        model=spec["model"], d_model=spec["d_model"], d_ff=spec["d_ff"],
        n_heads=spec["n_heads"], n_layers=spec["n_layers"], loss=spec["loss"],
        backbone_loss=spec["backbone_loss"], optimizer="adam",
        lr_scheduling="noam", dropout=0.1, max_seq_len=l, bucket_sizes=(l,),
        batch_size=b, train_only=True, name=f"trace{args.config}",
        out_dir="/tmp/bench_runs", compute_dtype=args.dtype)
    data = make_dataset(n_train=min(b, 64), n_eval=2, min_len=l - 1,
                        max_len=l, seed=0)
    trainer = Trainer(cfg, data=data)
    state = trainer.init_state()
    step_fn = trainer._train_step_fn()
    batch = collate(trainer.dm.train,
                    np.resize(np.arange(len(trainer.dm.train)), b),
                    cfg.bucket_sizes, trainer.dm.max_seq_len,
                    batch_multiple=trainer.dm.batch_multiple)
    batch_dev = shard_batch(batch, trainer.mesh)
    lr_scale = jnp.float32(1.0)

    params, opt_state, step_no = state.params, state.opt_state, state.step
    for _ in range(3):
        params, opt_state, step_no, out, _ = step_fn(
            params, opt_state, step_no, batch_dev, trainer.rng, lr_scale)
        jax.block_until_ready((params, out))

    with jax.profiler.trace(args.logdir):
        for _ in range(args.steps):
            params, opt_state, step_no, out, _ = step_fn(
                params, opt_state, step_no, batch_dev, trainer.rng, lr_scale)
        jax.block_until_ready(out)
    print(f"trace written to {args.logdir} ({args.steps} steps)")


if __name__ == "__main__":
    main()
