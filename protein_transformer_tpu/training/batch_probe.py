"""Automatic maximum-batch-size determination.

TPU-native rework of the reference's OOM-probing subprocess (reference:
scripts/determine_largest_batchsize.py:18-141, train.py:532-551): the
reference forks a child process that doubles the batch size until CUDA OOM
and reports the answer through its exit code (to sidestep CUDA teardown).
On TPU no subprocess is needed: compiling + running one step at a candidate
(B, L) either fits HBM or raises RESOURCE_EXHAUSTED, which XLA surfaces as a
catchable exception; doubling then binary search finds the frontier, and a
safety fraction of it is kept (0.8, as in train.py:532).
"""
from __future__ import annotations

from typing import Callable

DEFAULT_KEEP_FRACTION = 0.8


def _is_oom(exc: Exception) -> bool:
    text = str(exc)
    return ("RESOURCE_EXHAUSTED" in text or "Out of memory" in text
            or "out of memory" in text.lower())


def find_largest_batch_size(try_batch: Callable[[int], None],
                            start: int = 1, max_batch: int = 4096,
                            keep_fraction: float = DEFAULT_KEEP_FRACTION,
                            verbose: bool = True) -> int:
    """Largest b for which try_batch(b) succeeds, scaled by keep_fraction.

    try_batch(b) must compile and execute one full training step at batch
    size b and raise on OOM; any other exception propagates.
    """
    # doubling phase
    b = start
    largest_ok = 0
    while b <= max_batch:
        try:
            try_batch(b)
            largest_ok = b
            if verbose:
                print(f"[batch-probe] b={b} fits")
            b *= 2
        except Exception as e:
            if not _is_oom(e):
                raise
            if verbose:
                print(f"[batch-probe] b={b} OOM")
            break
    if largest_ok == 0:
        raise RuntimeError("even the starting batch size does not fit")
    # binary search between largest_ok and the first failure
    lo, hi = largest_ok, min(b, max_batch + 1)
    while lo + 1 < hi:
        mid = (lo + hi) // 2
        try:
            try_batch(mid)
            lo = mid
            if verbose:
                print(f"[batch-probe] b={mid} fits")
        except Exception as e:
            if not _is_oom(e):
                raise
            hi = mid
            if verbose:
                print(f"[batch-probe] b={mid} OOM")
    result = max(1, int(lo * keep_fraction))
    if verbose:
        print(f"[batch-probe] max={lo}, using {result}")
    return result


def probe_trainer_batch_size(trainer, length: int | None = None,
                             **kwargs) -> int:
    """Probe the largest batch for a Trainer's configured model/loss."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from protein_transformer_tpu.data.dataset import collate
    from protein_transformer_tpu.parallel.mesh import shard_batch

    length = length or trainer.dm.max_seq_len
    state = trainer.init_state()
    ds = trainer.dm.train

    if trainer.train_store is not None:
        # probe the PRODUCTION executable: on the device-data path training
        # runs the fused gather+step, whose live set includes the gather
        # temporaries alongside the resident store -- probing the host-batch
        # step there would report a slightly optimistic maximum
        store_step = trainer._train_store_step_fn()
        store = trainer.train_store

        def try_batch(b):
            idx = np.resize(np.arange(len(ds)), b)
            plan = trainer._DS.plan_batch(ds, idx, (length,), length,
                                          trainer.dm.batch_multiple)
            params = jax.tree.map(jnp.copy, state.params)
            opt_state = jax.tree.map(jnp.copy, state.opt_state)
            _p, _o, _s, out, _pred = store_step(
                params, opt_state, state.step, store.store,
                plan.idx_padded, trainer.rng, jnp.float32(1.0),
                lb=plan.lb)
            jax.block_until_ready(out)

        return find_largest_batch_size(try_batch, **kwargs)

    step_fn = trainer._train_step_fn()

    def try_batch(b):
        idx = np.resize(np.arange(len(ds)), b)
        batch = collate(ds, idx, (length,), length,
                        batch_multiple=trainer.dm.batch_multiple)
        bd = shard_batch(batch, trainer.mesh)
        # the train step donates its state buffers; probe with copies so the
        # template state survives repeated tries
        params = jax.tree.map(jnp.copy, state.params)
        opt_state = jax.tree.map(jnp.copy, state.opt_state)
        _p, _o, _s, out, _pred = step_fn(params, opt_state, state.step, bd,
                                         trainer.rng, jnp.float32(1.0))
        jax.block_until_ready(out)

    return find_largest_batch_size(try_batch, **kwargs)
