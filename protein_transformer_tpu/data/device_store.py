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
surface. Multi-process runs participate: the per-step index vector is
handed to pjit as numpy, which replicates it onto the global mesh --
every process plans the same batches from identically-seeded samplers,
so the gathered global batch is bit-identical to single-process.

Scaling: when the mesh's 'data' axis spans more than one device the store
is SHARDED over it instead of replicated -- proteins are greedily binned
into balanced per-device residue blocks, each device gathers the batch
rows it owns from its local block inside a shard_map, and one
psum_scatter over 'data' (a batch-sized collective, ~0.6 MB at the
flagship shape, riding ICI) assembles the row-sharded global batch. Per
-device HBM is ~1/N of the dataset, so the device-data fast path
survives CASP12-scale datasets on a pod instead of burning N x footprint
or falling back to host collate.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

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

# store keys that scale with dataset size (sharded over 'data'); the
# per-protein metadata (owner/offsets/lens, ~12 B/protein) stays replicated
_DATA_KEYS = ("seq", "ang", "ang_mask", "crd", "crd_mask")


def _partition_shards(lens: np.ndarray, n_shards: int):
    """Greedy balanced residue binning: proteins -> n_shards device blocks.

    Longest-first into the currently lightest bin (deterministic: stable
    sort, lowest-bin tie-break), so every process computes the identical
    layout. Returns (owner (n,), local_offset (n,), cap) where cap is the
    padded per-shard residue count (max bin fill)."""
    n = len(lens)
    owner = np.zeros(n, np.int32)
    local = np.zeros(n, np.int32)
    fill = np.zeros(n_shards, np.int64)
    for i in np.argsort(-lens, kind="stable"):
        s = int(np.argmin(fill))
        owner[i] = s
        local[i] = fill[s]
        fill[s] += int(lens[i])
    return owner, local, max(int(fill.max()) if n else 0, 1)


def _sharded_gather_impl(store: dict, idx: jax.Array, *, lb: int,
                         pad_id: int, mesh) -> tuple:
    """Batch gather from a 'data'-sharded store.

    Each device gathers the batch rows whose proteins live in its local
    residue block (others contribute zeros), then ONE psum_scatter over
    'data' sums the contributions and leaves each device holding exactly
    its row shard of the batch -- output layout identical to
    parallel.mesh.batch_sharding. Communication: one batch-sized
    reduce-scatter per step over ICI; per-device store bytes ~1/N."""
    from jax.experimental.shard_map import shard_map

    n_data = mesh.shape["data"]
    specs = {k: (P("data") if k in _DATA_KEYS else P(None))
             for k in store}

    def impl(st, idx_rep):
        d = jax.lax.axis_index("data")
        b = idx_rep.shape[0]
        live = idx_rep >= 0
        cidx = jnp.where(live, idx_rep, 0)
        own = (st["owner"][cidx] == d) & live              # (B,)
        off = st["offsets"][cidx]                          # local offsets
        ln = st["lens"][cidx]
        pos = jnp.arange(lb, dtype=jnp.int32)[None, :]
        valid = (pos < ln[:, None]) & live[:, None]        # (B, L)
        pick = valid & own[:, None]
        cap = st["seq"].shape[0]
        rows = jnp.clip(off[:, None] + pos, 0, cap - 1)

        def scat(x):
            return jax.lax.psum_scatter(x, "data", scatter_dimension=0,
                                        tiled=True)

        first = (d == 0)
        seq = scat(jnp.where(pick, st["seq"][rows], 0)
                   + jnp.where(first & ~valid, pad_id, 0).astype(jnp.int32))
        ang = scat(jnp.where(pick[..., None], st["ang"][rows], 0.0))
        ang_mask = scat((st["ang_mask"][rows] & pick[..., None])
                        .astype(jnp.int32)).astype(bool)
        crd = scat(jnp.where(pick[..., None, None], st["crd"][rows], 0.0))
        crd_mask = scat((st["crd_mask"][rows] & pick[..., None])
                        .astype(jnp.int32)).astype(bool)
        shard_rows = b // n_data
        live_local = jax.lax.dynamic_slice_in_dim(live, d * shard_rows,
                                                  shard_rows)
        return seq, ang, ang_mask, crd, crd_mask, live_local

    return shard_map(impl, mesh=mesh, in_specs=(specs, P(None)),
                     out_specs=P("data"))(store, idx)


def gather_batch_fields(store: dict, idx, *, lb: int, pad_id: int,
                        mesh=None) -> tuple:
    """Gather dispatch usable inside an enclosing jit: sharded store dicts
    carry per-protein 'owner' metadata, replicated stores don't."""
    if "owner" in store:
        return _sharded_gather_impl(store, idx, lb=lb, pad_id=pad_id,
                                    mesh=mesh)
    return _gather_impl(store, idx, lb=lb, pad_id=pad_id)


def _put_sharded(host: dict, mesh) -> dict:
    """Place a store: data arrays sharded over 'data', metadata replicated.

    Multi-process-safe: make_array_from_callback hands each addressable
    device its block of the host array (device_put alone cannot target a
    sharding spanning non-addressable devices)."""
    out = {}
    for k, x in host.items():
        sh = NamedSharding(mesh, P("data") if k in _DATA_KEYS else P())
        if jax.process_count() == 1:
            out[k] = jax.device_put(x, sh)
        else:
            out[k] = jax.make_array_from_callback(
                x.shape, sh, functools.partial(lambda x, idx: x[idx], x))
    return out


class DeviceStore:
    """One split resident on device + jitted batch gather.

    mesh: optional jax Mesh. With a multi-device 'data' axis the store is
    SHARDED over it (per-device bytes ~1/N, see _sharded_gather_impl);
    otherwise it is replicated. Either way gathered batches come out
    row-sharded over 'data' (same layout shard_batch produces for host
    batches). ``sharded`` forces the layout (tests / explicit control).
    """

    def __init__(self, split: ProteinSplit, mesh=None,
                 sharded: bool | None = None):
        self.split = split
        self.mesh = mesh
        n_data = mesh.shape.get("data", 1) if mesh is not None else 1
        if sharded is None:
            sharded = n_data > 1
        self.sharded = bool(sharded) and mesh is not None
        n = len(split)
        lens = np.minimum(split.lens, split.max_seq_len).astype(np.int32)

        if self.sharded:
            owner, offsets, cap = _partition_shards(lens, n_data)
            total = n_data * cap
            base = owner.astype(np.int64) * cap + offsets
        else:
            owner = None
            offsets = np.zeros(n, np.int32)
            if n:
                offsets[1:] = np.cumsum(lens)[:-1]
            total = int(lens.sum())
            base = offsets.astype(np.int64)

        # Vectorized fill: one fancy-indexed assignment per array instead of
        # n per-protein slice copies (the loop cost 13 s at a 26k-chain
        # CASP12-scale split, tools/stress_pipeline.py; this is ~10x less).
        # rows[j] = destination row of the j-th residue in concatenation
        # order; split.angs/crds arrive pre-zero-filled
        # (ProteinSplit.__init__).
        seq_f = np.zeros(total, np.int32)
        ang_f = np.zeros((total, NUM_PREDICTED_ANGLES * 2), np.float32)
        angm_f = np.zeros_like(ang_f, dtype=bool)
        crd_f = np.zeros((total, NUM_PREDICTED_COORDS, 3), np.float32)
        crdm_f = np.zeros((total, NUM_PREDICTED_COORDS), bool)
        if n:
            rows = np.concatenate(
                [base[i] + np.arange(int(lens[i])) for i in range(n)])
            seq_f[rows] = np.concatenate(
                [split.seq_enc[i][:int(lens[i])] for i in range(n)])
            ang_f[rows] = np.concatenate(
                [split.angs[i][:int(lens[i])] for i in range(n)])
            angm_f[rows] = np.concatenate(
                [split.ang_masks[i][:int(lens[i])] for i in range(n)])
            crd_f[rows] = np.concatenate(
                [split.crds[i][:int(lens[i]) * NUM_PREDICTED_COORDS]
                 for i in range(n)]).reshape(-1, NUM_PREDICTED_COORDS, 3)
            crdm_f[rows] = np.concatenate(
                [split.crd_masks[i][:int(lens[i])] for i in range(n)])

        host = {"seq": seq_f, "ang": ang_f, "ang_mask": angm_f,
                "crd": crd_f, "crd_mask": crdm_f,
                "offsets": offsets, "lens": lens}
        if self.sharded:
            host["owner"] = owner
            self.store = _put_sharded(host, mesh)
            self._gather = jax.jit(
                functools.partial(_sharded_gather_impl, mesh=mesh),
                static_argnames=("lb", "pad_id"))
        elif mesh is not None:
            from protein_transformer_tpu.parallel.mesh import (
                batch_sharding, replicate_tree)
            self.store = replicate_tree(host, mesh)
            sh = batch_sharding(mesh)
            self._gather = jax.jit(
                _gather_impl, static_argnames=("lb", "pad_id"),
                out_shardings=(sh,) * 6)
        else:
            self.store = jax.device_put(host)
            self._gather = _gather

    def device_nbytes(self) -> int:
        """Per-device resident bytes (ONE device's shards)."""
        dev = jax.devices()[0] if self.mesh is None else \
            self.mesh.devices.flat[0]
        total = 0
        for arr in self.store.values():
            for s in arr.addressable_shards:
                if s.device == dev:
                    total += s.data.nbytes
        return total

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
                 process_count: int = 1, has_mesh: bool = True,
                 n_data: int = 1) -> bool:
    """Decide the device-data path: explicit flag wins; 'auto' enables when
    the PER-DEVICE resident footprint fits the budget -- the store shards
    over the 'data' axis when it spans >1 device, so the budget applies to
    the ~1/n_data shard, not the whole dataset. Multi-process runs
    participate (sharded build via make_array_from_callback, per-step index
    vector rides pjit's numpy replication) but need a mesh to address the
    non-local devices."""
    mode = getattr(cfg, "device_data", "auto")
    if process_count > 1 and not has_mesh:
        if mode in (True, "true", "on"):
            print("[device_data] forced off: multi-process without a mesh "
                  "cannot build a globally-addressed store")
        return False
    if mode in (True, "true", "on"):
        return True
    if mode in (False, "false", "off"):
        return False
    budget = getattr(cfg, "device_data_max_mb", 4096) * 1024 * 1024
    per_device = sum(store_nbytes(s) for s in splits) / max(n_data, 1)
    return per_device <= budget
