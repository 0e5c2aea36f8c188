"""Multi-host (multi-process) SPMD initialization and data sharding.

The reference has no distributed backend at all (SURVEY 2.4/5.8: no process
groups, no NCCL/MPI -- one process, one device). This framework's single-jit
SPMD step already scales to every device `jax.devices()` can see; this module
adds the multi-host glue so that holds across processes/slices:

* ``initialize_from_env``: `jax.distributed.initialize` gated on environment
  variables, so single-process runs (tests, the v5e-8 target, CI) pay nothing
  and a multi-host launch just sets the standard coordinator variables.
  Collectives then ride ICI within a slice and DCN across slices, laid out by
  the compiler from the same mesh + shardings as the single-host path.

* ``process_local_rows`` / ``make_global_batch``: every process samples the
  SAME global batch (the host sampler is seeded identically), then feeds only
  the contiguous row block owned by its addressable devices. Global batch
  content is therefore bit-identical to the single-process run at any process
  count -- process count is an execution detail, not a semantics change.
"""
from __future__ import annotations

import os

import jax
import numpy as np

_ENV_COORD = "PTT_COORDINATOR"          # host:port of process 0
_ENV_NPROC = "PTT_NUM_PROCESSES"
_ENV_PID = "PTT_PROCESS_ID"

_initialized = False


def initialize_from_env() -> tuple[int, int]:
    """Initialize `jax.distributed` when a coordinator is configured.

    Reads PTT_COORDINATOR / PTT_NUM_PROCESSES / PTT_PROCESS_ID (same triple
    as jax.distributed.initialize's arguments; standard JAX auto-detection
    environments like GKE/Slurm can instead set PTT_DISTRIBUTED=1 to call
    initialize() with no arguments). No-op when unset or single-process, and
    idempotent across Trainer constructions.

    Returns (process_index, process_count).
    """
    global _initialized
    coord = os.environ.get(_ENV_COORD)
    nproc = int(os.environ.get(_ENV_NPROC, "0") or 0)
    auto = os.environ.get("PTT_DISTRIBUTED", "") not in ("", "0", "false")
    if not _initialized and (auto or (coord and nproc > 1)):
        if coord and nproc > 1:
            pid = os.environ.get(_ENV_PID)
            if pid is None:
                raise RuntimeError(
                    f"{_ENV_PID} must be set (0..{nproc - 1}) when "
                    f"{_ENV_COORD}/{_ENV_NPROC} configure a multi-process "
                    "run")
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=nproc,
                process_id=int(pid))
        else:
            jax.distributed.initialize()
        _initialized = True
    return jax.process_index(), jax.process_count()


def process_local_rows(n_rows: int,
                       process_index: int | None = None,
                       process_count: int | None = None) -> slice:
    """The contiguous block of global-batch rows this process feeds.

    Batch rows are sharded over the 'data' mesh axis, whose devices follow
    `jax.devices()` order -- grouped by ascending process index. So process p
    of P owns rows [p*n/P, (p+1)*n/P). n_rows must divide evenly: the collate
    path already pads batches to a multiple of the data-axis size, which is
    itself a multiple of the process count.
    """
    p = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    if n_rows % n:
        raise ValueError(f"batch rows {n_rows} not divisible by "
                         f"process count {n}")
    per = n_rows // n
    return slice(p * per, (p + 1) * per)


def make_global_batch(x: np.ndarray, sharding) -> jax.Array:
    """Assemble a globally-sharded device array from host data.

    Single-process: a plain device_put with the sharding. Multi-process:
    every process passes the same full global array (identically-seeded
    samplers); only the locally-owned row block is actually transferred.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    rows = process_local_rows(x.shape[0])
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(x[rows]), x.shape)
