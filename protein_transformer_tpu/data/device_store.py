"""Device-resident dataset store: batch assembly ON the TPU.

The host collate path (data/dataset.collate) builds each padded batch with
numpy and ships ~0.6 MB per step through the host->device link; on a slow
host or a high-latency link that dominates the step time (measured: the
flagship real-loop step spent ~9 ms/step in collate + device_put against an
8.3 ms device step). TPU-first alternative: upload every split ONCE as flat
ragged residue-major arrays (offsets + lengths), then assemble each batch
with a jitted gather -- per step the host ships only a (B,) index vector.

Mask/padding semantics are identical to collate (differential-tested in
tests/test_device_store.py): rows beyond a protein's length are batch
padding, masked angle/coordinate entries arrive pre-zeroed, `protein_mask`
marks real rows, dead rows gather protein 0 but are fully masked out.

Reference parity: this replaces the torch DataLoader + collate of
reference dataset.py:26-54 (same Batch contract), not a new feature
surface. Multi-process runs participate: the store replicates globally
(parallel.mesh.replicate_tree via make_array_from_callback) and the per-step
index vector is handed to pjit as numpy, which replicates it onto the global
mesh -- every process plans the same batches from identically-seeded
samplers, so the gathered global batch is bit-identical to single-process.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from protein_transformer_tpu.data.dataset import (
    Batch, ProteinSplit, bucket_batch_size, bucket_length)
from protein_transformer_tpu.protein.constants import (
    NUM_PREDICTED_ANGLES, NUM_PREDICTED_COORDS)
from protein_transformer_tpu.protein.vocab import VOCAB

# bytes per residue across all store arrays (seq 4 + ang 96 + ang_mask 24 +
# crd 168 + crd_mask 14); used for the auto-enable memory estimate
_BYTES_PER_RES = 4 + 24 * 4 + 24 + 14 * 3 * 4 + 14


def store_nbytes(split: ProteinSplit) -> int:
    """Estimated device bytes for a split's store."""
    return int(split.lens.sum()) * _BYTES_PER_RES + len(split) * 8


@dataclasses.dataclass
class BatchPlan:
    """Host-side plan for one batch: which rows, at which bucket shape."""
    idx_padded: np.ndarray   # (Bb,) int32, -1 marks a padding row
    lb: int                  # bucket length (static per compile)
    n_res: int               # real residues (throughput metric)
    n_real: int              # real proteins in the batch


def plan_batch(split: ProteinSplit, indices: np.ndarray,
               length_buckets: Sequence[int], max_seq_len: int,
               batch_multiple: int = 1) -> BatchPlan:
    """The shape/bookkeeping half of collate, without materializing data."""
    lens = np.minimum(split.lens[np.asarray(indices)], max_seq_len)
    lb = bucket_length(int(lens.max()), length_buckets, max_seq_len)
    n_real = len(indices)
    b = bucket_batch_size(n_real, batch_multiple)
    idx = np.full((b,), -1, np.int32)
    idx[:n_real] = indices
    return BatchPlan(idx, lb, int(lens.sum()), n_real)


def _gather_impl(store: dict, idx: jax.Array, *, lb: int, pad_id: int):
    """Assemble one padded batch from the flat store. idx: (Bb,) int32,
    -1 = dead row. Returns the six Batch array fields."""
    live_row = idx >= 0
    cidx = jnp.where(live_row, idx, 0)
    off = store["offsets"][cidx]                      # (B,)
    ln = store["lens"][cidx]                          # (B,)
    pos = jnp.arange(lb, dtype=jnp.int32)[None, :]    # (1, L)
    valid = (pos < ln[:, None]) & live_row[:, None]   # (B, L)
    n_res_total = store["seq"].shape[0]
    rows = jnp.clip(off[:, None] + pos, 0, n_res_total - 1)

    seq = jnp.where(valid, store["seq"][rows], pad_id)
    ang = jnp.where(valid[..., None], store["ang"][rows], 0.0)
    ang_mask = store["ang_mask"][rows] & valid[..., None]
    crd = jnp.where(valid[..., None, None], store["crd"][rows], 0.0)
    crd_mask = store["crd_mask"][rows] & valid[..., None]
    return seq, ang, ang_mask, crd, crd_mask, live_row


_gather = jax.jit(_gather_impl, static_argnames=("lb", "pad_id"))


class DeviceStore:
    """One split resident on device + jitted batch gather.

    mesh: optional jax Mesh -- the store is replicated; gathered batches
    come out row-sharded over the 'data' axis (same layout shard_batch
    produces for host batches).
    """

    def __init__(self, split: ProteinSplit, mesh=None):
        self.split = split
        self.mesh = mesh
        n = len(split)
        lens = np.minimum(split.lens, split.max_seq_len).astype(np.int32)
        offsets = np.zeros(n, np.int32)
        if n:
            offsets[1:] = np.cumsum(lens)[:-1]
        seq_f = np.zeros(int(lens.sum()), np.int32)
        ang_f = np.zeros((int(lens.sum()), NUM_PREDICTED_ANGLES * 2),
                         np.float32)
        angm_f = np.zeros_like(ang_f, dtype=bool)
        crd_f = np.zeros((int(lens.sum()), NUM_PREDICTED_COORDS, 3),
                         np.float32)
        crdm_f = np.zeros((int(lens.sum()), NUM_PREDICTED_COORDS), bool)
        for i in range(n):
            li, o = int(lens[i]), int(offsets[i])
            seq_f[o:o + li] = split.seq_enc[i][:li]
            # split.angs/crds arrive pre-zero-filled (ProteinSplit.__init__)
            ang_f[o:o + li] = split.angs[i][:li]
            angm_f[o:o + li] = split.ang_masks[i][:li]
            crd_f[o:o + li] = split.crds[i][:li * NUM_PREDICTED_COORDS] \
                .reshape(li, NUM_PREDICTED_COORDS, 3)
            crdm_f[o:o + li] = split.crd_masks[i][:li]

        host = {"seq": seq_f, "ang": ang_f, "ang_mask": angm_f,
                "crd": crd_f, "crd_mask": crdm_f,
                "offsets": offsets, "lens": lens}
        if mesh is not None:
            from protein_transformer_tpu.parallel.mesh import replicate_tree
            self.store = replicate_tree(host, mesh)
        else:
            self.store = jax.device_put(host)
        self._gather = _gather
        if mesh is not None:
            from protein_transformer_tpu.parallel.mesh import batch_sharding
            sh = batch_sharding(mesh)
            self._gather = jax.jit(
                _gather_impl, static_argnames=("lb", "pad_id"),
                out_shardings=(sh,) * 6)

    def batch(self, plan: BatchPlan) -> Batch:
        """Assemble the planned batch on device (async dispatch, no host
        data motion beyond the index vector). The index vector goes in as
        numpy: pjit replicates it onto the gather's mesh, which is what
        makes this path work under multi-process too (an explicit
        jnp.asarray would commit it to local device 0 only)."""
        fields = self._gather(self.store, plan.idx_padded,
                              lb=plan.lb, pad_id=VOCAB.pad_id)
        return Batch(*fields, n_res=plan.n_res)


class LazyBatch:
    """Batch facade for host bookkeeping on the fused device path.

    The trainer's fused store-step gathers the batch INSIDE the training
    jit (one dispatch per step instead of gather + step), so no device
    Batch object exists on the host. Loop bookkeeping only needs the cheap
    host fields (n_res, protein_mask); array fields materialize on demand
    via one extra gather dispatch -- which only happens on the rare
    structure-logging / wandb-histogram cadences.
    """

    def __init__(self, store: "DeviceStore", plan: BatchPlan):
        self._store, self._plan = store, plan
        self.n_res = plan.n_res
        self.protein_mask = plan.idx_padded >= 0
        self._dev: Batch | None = None

    def _materialize(self) -> Batch:
        if self._dev is None:
            self._dev = self._store.batch(self._plan)
        return self._dev

    @property
    def seq(self):
        return self._materialize().seq

    @property
    def ang(self):
        return self._materialize().ang

    @property
    def ang_mask(self):
        return self._materialize().ang_mask

    @property
    def crd(self):
        return self._materialize().crd

    @property
    def crd_mask(self):
        return self._materialize().crd_mask


def auto_enabled(cfg, splits: Sequence[ProteinSplit],
                 process_count: int = 1, has_mesh: bool = True) -> bool:
    """Decide the device-data path: explicit flag wins; 'auto' enables when
    the resident footprint fits the budget. Multi-process runs participate
    too (the store replicates globally via make_array_from_callback and the
    per-step index vector rides pjit's numpy replication) but need a mesh to
    address the non-local devices."""
    mode = getattr(cfg, "device_data", "auto")
    if process_count > 1 and not has_mesh:
        if mode in (True, "true", "on"):
            print("[device_data] forced off: multi-process without a mesh "
                  "cannot build a globally-replicated store")
        return False
    if mode in (True, "true", "on"):
        return True
    if mode in (False, "false", "off"):
        return False
    budget = getattr(cfg, "device_data_max_mb", 4096) * 1024 * 1024
    return sum(store_nbytes(s) for s in splits) <= budget
