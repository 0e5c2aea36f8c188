#!/usr/bin/env python
"""Isolate the trainer-loop device-step rate: fused store-step windows with
(a) per-step numpy index upload (current loop), (b) pre-uploaded device
indices, (c) variant a + per-step copy_to_host_async (the full loop recipe).
Times K-step windows ending in one sync, like bench.py.

NOTE on interpreting the numbers: the plans produced here come from the
residue-budget sampler, which at L=256 packs ~15 proteins per batch and
pads to B=16 -- twice the raw bench's B=8. The fused step at ~13.3 ms is a
B=16 step (~295k res/s, i.e. *better* per-residue than the 7.4 ms B=8 raw
step), not a regression; /tmp-era session logs that read it as "+5 ms of
gather cost" were wrong (same-process A/B at matched B=8: fused 7.41 ms vs
host-batch 7.31 ms, optimization_barrier neutral).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))
from protein_transformer_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from protein_transformer_tpu.config import TrainConfig  # noqa: E402
from protein_transformer_tpu.training.trainer import Trainer  # noqa: E402
from protein_transformer_tpu.data.synthetic import make_dataset  # noqa: E402

b, l = 8, 256
cfg = TrainConfig(
    model="conv-enc|21,11,3|1,1,1", d_model=512, d_ff=2048, n_heads=8,
    n_layers=6, loss="combined", optimizer="adam", lr_scheduling="noam",
    dropout=0.1, max_seq_len=l, bucket_sizes=(l,), batch_size=b,
    train_only=True, name="exp_store", out_dir="/tmp/bench_runs",
    compute_dtype="float32")
data = make_dataset(n_train=16, n_eval=2, min_len=l - 1, max_len=l, seed=0)
tr = Trainer(cfg, data=data)
assert tr.train_store is not None
state = tr.init_state()
step_fn = tr._train_store_step_fn()
store = tr.train_store

plans = []
rng_np = np.random.default_rng(0)
for _ in range(4):
    for _m, (_s, plan) in zip(range(8), tr._device_stream(
            tr.dm.train, store, tr.dm.train_index_batches(
                np.random.default_rng(int(rng_np.integers(1 << 30)))))):
        plans.append(plan[1])
lb = plans[0].lb
idx_np = [p.idx_padded for p in plans if p.lb == lb]
idx_dev = [jax.device_put(i) for i in idx_np]
lr = jnp.float32(1.0)

params, opt_state, step_no = state.params, state.opt_state, state.step
for _ in range(2):
    params, opt_state, step_no, out, _ = step_fn(
        params, opt_state, step_no, store.store, idx_np[0], tr.rng, lr, lb=lb)
    jax.block_until_ready(out)


def window(k, idxs, async_copy):
    global params, opt_state, step_no
    t0 = time.time()
    for i in range(k):
        params, opt_state, step_no, out, _ = step_fn(
            params, opt_state, step_no, store.store, idxs[i % len(idxs)],
            tr.rng, lr, lb=lb)
        if async_copy:
            out.copy_to_host_async()
    jax.block_until_ready(out)
    return time.time() - t0


K = int(os.environ.get("K", "15"))
for name, idxs, ac in (("numpy idx", idx_np, False),
                       ("device idx", idx_dev, False),
                       ("numpy idx + async copy", idx_np, True),
                       ("device idx + async copy", idx_dev, True)):
    samples = []
    for _ in range(4):
        t1, t2 = window(K, idxs, ac), window(2 * K, idxs, ac)
        samples.append((t2 - t1) / K)
    print(f"{name:28s} p50 {1e3 * float(np.median(samples)):6.2f} ms/step"
          f"  (samples {[f'{1e3 * s:.2f}' for s in samples]})")
