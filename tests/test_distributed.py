"""Multi-host readiness: env-gated init + per-process batch row ownership."""
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
