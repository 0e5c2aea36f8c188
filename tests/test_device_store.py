"""Device-resident data path: gather parity vs collate + trainer e2e.

The DeviceStore assembles batches on device from flat ragged arrays
(data/device_store.py); these tests prove the result is element-identical
to the host collate path (data/dataset.collate) -- same padding, masks,
zero-fill, and protein_mask semantics -- and that a Trainer run over the
device path reproduces the host path's losses exactly.
"""
import numpy as np
import pytest

import jax

from protein_transformer_tpu.config import TrainConfig
from protein_transformer_tpu.data.dataset import BinnedDataset, collate
from protein_transformer_tpu.data.device_store import (
    DeviceStore, auto_enabled, plan_batch, store_nbytes)
from protein_transformer_tpu.data.synthetic import make_dataset


def _split(n=12, min_len=8, max_len=40, seed=0, max_seq_len=32):
    data = make_dataset(n_train=n, n_eval=2, min_len=min_len,
                        max_len=max_len, seed=seed)
    tr = data["train"]
    return BinnedDataset(tr["seq"], tr["ang"], tr["crd"],
                         max_seq_len=max_seq_len)


BUCKETS = (16, 24, 32)


@pytest.mark.parametrize("with_mesh", [False, True])
def test_gather_matches_collate(with_mesh):
    split = _split()
    mesh = None
    if with_mesh:
        from protein_transformer_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
    store = DeviceStore(split, mesh)
    # as in Trainer: rows pad to a multiple of the data-axis size
    bm = mesh.shape["data"] if with_mesh else 1
    rng = np.random.default_rng(0)
    for trial in range(6):
        k = int(rng.integers(1, 7))
        idx = rng.integers(0, len(split), size=k)
        plan = plan_batch(split, idx, BUCKETS, split.max_seq_len,
                          batch_multiple=bm)
        got = store.batch(plan)
        want = collate(split, idx, BUCKETS, split.max_seq_len,
                       batch_multiple=bm)
        assert got.n_res == want.n_res
        for f in ("seq", "ang", "ang_mask", "crd", "crd_mask",
                  "protein_mask"):
            g, w = np.asarray(getattr(got, f)), getattr(want, f)
            assert g.shape == w.shape, (f, g.shape, w.shape)
            assert np.array_equal(g, w), (trial, f)


def test_plan_batch_shapes():
    split = _split()
    plan = plan_batch(split, np.array([0, 1, 2]), BUCKETS,
                      split.max_seq_len, batch_multiple=4)
    assert plan.idx_padded.shape[0] % 4 == 0
    assert plan.n_real == 3
    assert (plan.idx_padded[3:] == -1).all()
    assert plan.n_res == int(np.minimum(split.lens[:3],
                                        split.max_seq_len).sum())


def test_auto_enabled_gating():
    split = _split()
    cfg_auto = TrainConfig(name="t", out_dir="/tmp/t")
    assert auto_enabled(cfg_auto, [split], process_count=1)
    # multi-process participates (globally-replicated store) given a mesh;
    # without one the non-local devices are unaddressable -> host path
    assert auto_enabled(cfg_auto, [split], process_count=2, has_mesh=True)
    assert not auto_enabled(cfg_auto, [split], process_count=2,
                            has_mesh=False)
    import dataclasses
    cfg_off = dataclasses.replace(cfg_auto, device_data="false")
    assert not auto_enabled(cfg_off, [split], process_count=1)
    cfg_on = dataclasses.replace(cfg_auto, device_data="true")
    assert auto_enabled(cfg_on, [split], process_count=1)
    assert auto_enabled(cfg_on, [split], process_count=2, has_mesh=True)
    assert not auto_enabled(cfg_on, [split], process_count=2,
                            has_mesh=False)
    cfg_tiny = dataclasses.replace(cfg_auto, device_data_max_mb=0)
    assert not auto_enabled(cfg_tiny, [split], process_count=1)
    assert store_nbytes(split) > 0


def test_fused_store_step_matches_host_step(tmp_path):
    """The fused gather+step jit (_train_store_step_fn) must produce the
    SAME packed metrics as the host-batch step (_train_step_fn) run on the
    standalone-gathered batch -- guarding _gathered_batch's field order,
    shardings, and mask semantics."""
    import jax.numpy as jnp
    from protein_transformer_tpu.training.trainer import Trainer

    data = make_dataset(n_train=8, n_eval=2, min_len=10, max_len=24, seed=2)
    cfg = TrainConfig(
        model="enc-only", d_model=16, d_ff=32, n_heads=2, n_layers=1,
        loss="combined", batch_size=4, max_seq_len=24, bucket_sizes=(24,),
        epochs=1, name="fused", out_dir=str(tmp_path), device_data="true",
        dropout=0.0, train_only=True, seed=5)
    tr = Trainer(cfg, data=data)
    assert tr.train_store is not None
    state = tr.init_state()
    _meta, (store, plan) = next(tr._device_stream(
        tr.dm.train, tr.train_store,
        tr.dm.train_index_batches(np.random.default_rng(0))))

    def fresh_state():
        return (jax.tree.map(jnp.copy, state.params),
                jax.tree.map(jnp.copy, state.opt_state))

    p1, o1 = fresh_state()
    _p, _o, _s, out_host, _ = tr._train_step_fn()(
        p1, o1, state.step, store.batch(plan), tr.rng, jnp.float32(1.0))
    p2, o2 = fresh_state()
    _p, _o, _s, out_fused, _ = tr._train_store_step_fn()(
        p2, o2, state.step, store.store, jnp.asarray(plan.idx_padded),
        tr.rng, jnp.float32(1.0), lb=plan.lb)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_host),
                               rtol=1e-6, atol=1e-7)


def test_trainer_device_path_matches_host(tmp_path):
    """Same config + seed: device-data and host-collate paths produce the
    same per-epoch training metrics."""
    from protein_transformer_tpu.training.trainer import Trainer

    data = make_dataset(n_train=8, n_eval=3, min_len=10, max_len=24, seed=1)
    losses = {}
    for mode in ("true", "false"):
        cfg = TrainConfig(
            model="enc-only", d_model=16, d_ff=32, n_heads=2, n_layers=1,
            loss="mse", batch_size=4, max_seq_len=24, bucket_sizes=(24,),
            epochs=2, name=f"dev_{mode}", out_dir=str(tmp_path),
            device_data=mode, seed=3)
        tr = Trainer(cfg, data=data)
        assert tr.use_device_data == (mode == "true")
        state = tr.train(tr.init_state())
        assert state is not None
        losses[mode] = tr.metrics["train"]["epoch-mse-full"]
    assert np.isfinite(losses["true"])
    assert losses["true"] == pytest.approx(losses["false"], rel=1e-6)


# ---------------- sharded store (per-device bytes ~ 1/N) ----------------


def test_sharded_store_footprint_is_fraction_of_replicated():
    from protein_transformer_tpu.parallel.mesh import make_mesh
    split = _split(n=32, min_len=8, max_len=32)
    mesh = make_mesh()
    n = mesh.shape["data"]
    assert n == 8
    sharded = DeviceStore(split, mesh, sharded=True)
    replicated = DeviceStore(split, mesh, sharded=False)
    assert sharded.sharded and not replicated.sharded
    s_bytes, r_bytes = sharded.device_nbytes(), replicated.device_nbytes()
    # greedy binning pads each shard to the heaviest bin; with 32 proteins
    # over 8 shards the padding is bounded by one protein length per shard
    assert s_bytes < r_bytes / (n / 2), (s_bytes, r_bytes)


def test_sharded_gather_matches_replicated_and_collate():
    from protein_transformer_tpu.parallel.mesh import make_mesh
    split = _split(n=20)
    mesh = make_mesh()
    bm = mesh.shape["data"]
    sharded = DeviceStore(split, mesh, sharded=True)
    replicated = DeviceStore(split, mesh, sharded=False)
    rng = np.random.default_rng(7)
    for trial in range(5):
        k = int(rng.integers(1, 2 * bm))
        idx = rng.integers(0, len(split), size=k)
        plan = plan_batch(split, idx, BUCKETS, split.max_seq_len,
                          batch_multiple=bm)
        got = sharded.batch(plan)
        ref = replicated.batch(plan)
        want = collate(split, idx, BUCKETS, split.max_seq_len,
                       batch_multiple=bm)
        for f in ("seq", "ang", "ang_mask", "crd", "crd_mask",
                  "protein_mask"):
            g = np.asarray(getattr(got, f))
            assert np.array_equal(g, np.asarray(getattr(ref, f))), (trial, f)
            assert np.array_equal(g, getattr(want, f)), (trial, f)
        # output layout matches shard_batch's row sharding
        assert got.seq.sharding.spec == ref.seq.sharding.spec


def test_partition_shards_balanced_and_deterministic():
    from protein_transformer_tpu.data.device_store import _partition_shards
    lens = np.array([100, 10, 90, 20, 80, 30, 70, 40], np.int64)
    o1, l1, cap1 = _partition_shards(lens, 4)
    o2, l2, cap2 = _partition_shards(lens, 4)
    assert np.array_equal(o1, o2) and np.array_equal(l1, l2)
    fills = np.bincount(o1, weights=lens, minlength=4)
    assert cap1 == int(fills.max())
    assert fills.max() <= 2 * fills.min()  # greedy keeps bins balanced
    # local offsets tile each protein disjointly within its shard
    for s in range(4):
        mine = np.where(o1 == s)[0]
        spans = sorted((int(l1[i]), int(l1[i] + lens[i])) for i in mine)
        for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
            assert a1 <= b0


def test_auto_enabled_budget_is_per_device():
    import dataclasses
    split = _split(n=32)
    # pick a budget between the full footprint and its 1/8 shard
    total_mb = store_nbytes(split) / (1024 * 1024)
    cfg = TrainConfig(name="t", out_dir="/tmp/t",
                      device_data_max_mb=total_mb / 4)
    # the whole dataset busts the budget on one device...
    assert not auto_enabled(cfg, [split], n_data=1)
    # ...but fits once sharded 8 ways
    assert auto_enabled(cfg, [split], n_data=8)
