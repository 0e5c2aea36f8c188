"""Device mesh + sharding helpers (SPMD).

The reference is single-process/single-device; its only parallelism is a CPU
worker pool for the dRMSD loss (reference: train.py:360-365, SURVEY 2.4).
Here scaling is SPMD over a ``jax.sharding.Mesh``: parameters and optimizer
state replicated, batches sharded over the 'data' axis, gradient psums
inserted by the compiler and riding ICI. A 'model' axis is reserved in the
mesh-shape config for tensor-parallel sharding of large dm configs.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Sequence[int] = (-1,),
              axes: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    """Build a mesh over available devices; -1 infers that axis size.

    An inferred axis must divide the device count evenly and an explicit
    shape must fit -- silently idling devices (or a zero-size axis) hides
    a throughput bug and, multi-process, can strand a process whose
    devices fall outside the mesh."""
    devices = devices if devices is not None else jax.devices()
    shape = list(shape)
    n = len(devices)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        if known <= 0 or n % known != 0:
            raise ValueError(
                f"mesh shape {shape} cannot be inferred over {n} devices: "
                f"the fixed axes ({known}) must divide the device count")
        shape[shape.index(-1)] = n // known
    total = int(np.prod(shape))
    if total > n:
        raise ValueError(f"mesh shape {shape} needs {total} devices, "
                         f"only {n} available")
    if total < n:
        print(f"[mesh] warning: shape {shape} uses {total} of {n} devices; "
              f"{n - total} idle")
    mesh_devices = np.asarray(devices[:total]).reshape(shape)
    return Mesh(mesh_devices, tuple(axes))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Optional[Mesh]):
    """Device-put a host Batch with the leading axis sharded over 'data'.

    All array fields go through ONE device_put call (a pytree put): each
    host->device call costs a link round trip regardless of payload, so
    seven per-field puts would pay seven RTTs per batch. Works across
    processes: each host transfers only the row block owned by its
    addressable devices (parallel.distributed.make_global_batch)."""
    import dataclasses
    from protein_transformer_tpu.parallel.distributed import make_global_batch
    if mesh is None:
        return batch
    sh = batch_sharding(mesh)
    names = [f.name for f in dataclasses.fields(batch)
             if hasattr(getattr(batch, f.name), "shape")]
    if jax.process_count() > 1:
        put = {n: make_global_batch(np.asarray(getattr(batch, n)), sh)
               for n in names}
    else:
        arrays = jax.device_put([np.asarray(getattr(batch, n))
                                 for n in names], sh)
        put = dict(zip(names, arrays))
    return dataclasses.replace(batch, **put)


def replicate_tree(tree, mesh: Optional[Mesh]):
    """Replicate a host pytree across the mesh.

    Works multi-process: every process holds the identical full host value
    (identically-seeded/loaded data), and make_array_from_callback hands each
    addressable device its (full) copy -- jax.device_put alone cannot target
    a sharding that spans non-addressable devices."""
    if mesh is None:
        return tree
    sh = replicated(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, sh)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx: x[idx])
    return jax.tree.map(put, tree)
