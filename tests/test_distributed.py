"""Multi-host readiness: env-gated init + per-process batch row ownership,
plus a REAL 2-process integration run over a localhost coordinator."""
import os

import numpy as np
import pytest

import jax

from protein_transformer_tpu.parallel.distributed import (
    initialize_from_env, make_global_batch, process_local_rows)
from protein_transformer_tpu.parallel.mesh import batch_sharding, make_mesh


def test_initialize_noop_single_process(monkeypatch):
    monkeypatch.delenv("PTT_COORDINATOR", raising=False)
    monkeypatch.delenv("PTT_DISTRIBUTED", raising=False)
    pi, pc = initialize_from_env()
    assert (pi, pc) == (0, 1)


def test_process_rows_disjoint_and_covering():
    # simulate each process of a P-process run computing its own block
    for n_proc in (1, 2, 4, 8):
        rows = 16
        blocks = [process_local_rows(rows, p, n_proc) for p in range(n_proc)]
        seen = []
        for blk in blocks:
            idx = list(range(rows))[blk]
            assert not set(idx) & set(seen), "overlapping process blocks"
            seen.extend(idx)
        assert seen == list(range(rows)), "blocks do not cover the batch"


def test_process_rows_requires_divisibility():
    with pytest.raises(ValueError):
        process_local_rows(10, 0, 4)


def test_make_global_batch_single_process_roundtrip():
    mesh = make_mesh((-1,), ("data",))
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    arr = make_global_batch(x, batch_sharding(mesh))
    np.testing.assert_array_equal(np.asarray(arr), x)
    assert len(arr.sharding.device_set) == len(jax.devices())


_WORKER = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
# join the cluster BEFORE any computation (make_dataset builds coords on
# device); same call the Trainer makes, idempotent there
from protein_transformer_tpu.parallel.distributed import initialize_from_env
initialize_from_env()
from protein_transformer_tpu.config import TrainConfig
from protein_transformer_tpu.data.synthetic import make_dataset
from protein_transformer_tpu.training.trainer import Trainer

out_dir = sys.argv[1]
mesh_shape = tuple(json.loads(sys.argv[2])) if len(sys.argv) > 2 else (-1,)
mesh_axes = ("data", "model") if len(mesh_shape) == 2 else ("data",)
cfg = TrainConfig(model="enc-only", d_model=16, d_ff=32, n_heads=2,
                  n_layers=1, batch_size=8, epochs=1, loss="mse",
                  optimizer="adam", learning_rate=1e-3,
                  lr_scheduling="plateau", bucket_sizes=(16,),
                  max_seq_len=16, out_dir=out_dir, name="dist", dropout=0.0,
                  train_only=True, early_stopping=0, log_structure_step=0,
                  mesh_shape=mesh_shape, mesh_axes=mesh_axes)
data = make_dataset(n_train=16, n_eval=2, min_len=8, max_len=16, seed=0)
tr = Trainer(cfg, data=data)
assert len(jax.devices()) == 8, jax.devices()
# the device-resident data path must stay active under multi-process
# (globally-replicated store + pjit-replicated index vectors), not fall
# back to host collate
assert tr.use_device_data and tr.train_store is not None, "device data off"
state = tr.train()
tp = dict(zip(tr.mesh.axis_names, tr.mesh.devices.shape)).get("model", 1)
if tp > 1:
    # at least one weight matrix must actually be sharded over 'model'
    def uses_model_axis(spec):
        for ax in spec:
            axs = ax if isinstance(ax, tuple) else (ax,)
            if "model" in [a for a in axs if a]:
                return True
        return False
    sharded = [p for p in jax.tree_util.tree_leaves(state.params)
               if uses_model_axis(p.sharding.spec)]
    assert sharded, "no parameter is TP-sharded under the model axis"
print("NPROC", tr.process_count, "PIDX", tr.process_index,
      "DEVDATA", tr.use_device_data)
"""


def _read_batch_losses(csv_path):
    import csv as _csv
    with open(csv_path) as f:
        rows = [r for r in _csv.DictReader(f) if r["granularity"] == "batch"]
    return [float(r["rmse"]) for r in rows]


def test_two_process_training_matches_single_process(tmp_path):
    """REAL 2-process jax.distributed run (localhost coordinator, 4 virtual
    CPU devices per process = 8 global) trains with per-batch losses equal to
    the single-process 8-device run: process count is an execution detail,
    not a semantics change."""
    import socket
    import subprocess
    import sys as _sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    def env_for(pid, n_dev):
        env = dict(os.environ, PTT_FORCE_CPU="1",
                   XLA_FLAGS=f"--xla_force_host_platform_device_count={n_dev}")
        env.pop("JAX_PLATFORMS", None)
        if pid is not None:
            env.update(PTT_COORDINATOR=f"127.0.0.1:{port}",
                       PTT_NUM_PROCESSES="2", PTT_PROCESS_ID=str(pid))
        return env

    out2 = str(tmp_path / "two")
    procs = [subprocess.Popen(
        [_sys.executable, "-c", _WORKER, out2], env=env_for(pid, 4),
        cwd="/root/repo", stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1200)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("2-process run timed out on this host")
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    assert "NPROC 2" in outs[0] + outs[1]

    out1 = str(tmp_path / "one")
    r = subprocess.run([_sys.executable, "-c", _WORKER, out1],
                       env=env_for(None, 8), cwd="/root/repo",
                       capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]

    losses2 = _read_batch_losses(os.path.join(out2, "dist", "dist.train"))
    losses1 = _read_batch_losses(os.path.join(out1, "dist", "dist.train"))
    assert len(losses2) == len(losses1) > 0
    np.testing.assert_allclose(losses2, losses1, rtol=2e-4, atol=1e-6)


def test_four_process_dp_tp_training_matches_single_process(tmp_path):
    """REAL 4-process jax.distributed run under a dp x tp (4x2) mesh: 2
    virtual CPU devices per process (TP pairs intra-process, DP across the
    process grid -- the layout a v5e pod slice uses with TP riding the
    fastest ICI). Per-batch losses must equal the single-process 8-device
    run on the SAME mesh, and at least one weight must be truly TP-sharded
    (asserted inside the worker)."""
    import json as _json
    import socket
    import subprocess
    import sys as _sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    def env_for(pid, n_dev, n_proc):
        env = dict(os.environ, PTT_FORCE_CPU="1",
                   XLA_FLAGS=f"--xla_force_host_platform_device_count={n_dev}")
        env.pop("JAX_PLATFORMS", None)
        if pid is not None:
            env.update(PTT_COORDINATOR=f"127.0.0.1:{port}",
                       PTT_NUM_PROCESSES=str(n_proc),
                       PTT_PROCESS_ID=str(pid))
        return env

    mesh_arg = _json.dumps([-1, 2])
    out4 = str(tmp_path / "four")
    procs = [subprocess.Popen(
        [_sys.executable, "-c", _WORKER, out4, mesh_arg],
        env=env_for(pid, 2, 4), cwd="/root/repo", stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for pid in range(4)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1200)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("4-process run timed out on this host")
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    assert "NPROC 4" in "".join(outs)

    out1 = str(tmp_path / "one")
    r = subprocess.run([_sys.executable, "-c", _WORKER, out1, mesh_arg],
                       env=env_for(None, 8, 1), cwd="/root/repo",
                       capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]

    losses4 = _read_batch_losses(os.path.join(out4, "dist", "dist.train"))
    losses1 = _read_batch_losses(os.path.join(out1, "dist", "dist.train"))
    assert len(losses4) == len(losses1) > 0
    np.testing.assert_allclose(losses4, losses1, rtol=2e-4, atol=1e-6)
