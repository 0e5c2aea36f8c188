"""Orbax checkpointing with the reference's best/interval policy.

Policy parity (reference: train.py:189-271): save under 'best' when the
monitored loss improves on its history; save under 'latest' when
``checkpoint_time_interval`` hours have elapsed since the last checkpoint;
resume from 'best' by default, ``restart`` skips loading, ``restart_opt``
loads weights but a fresh optimizer. Array state (params, optimizer state,
step) goes through orbax; host-side scalar state (epoch, elapsed time,
plateau/early-stopping machines, loss history) goes to a JSON sidecar, since
its structure varies across epochs.
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, modifier: str) -> str:
        return os.path.join(self.directory, modifier)

    def save(self, modifier: str, arrays: dict, meta: dict) -> None:
        # orbax save is a collective in multi-process runs -- every process
        # calls it; the JSON sidecar is written by process 0 only.
        self._ckptr.save(self._path(modifier), arrays, force=True)
        self._ckptr.wait_until_finished()
        import jax
        if jax.process_index() == 0:
            with open(self._path(modifier) + ".meta.json", "w") as f:
                json.dump(meta, f, default=float)

    def restore(self, modifier: str,
                template: dict) -> Optional[tuple[dict, dict]]:
        path = self._path(modifier)
        if not os.path.exists(path):
            return None
        arrays = self._ckptr.restore(path, template)
        meta_path = path + ".meta.json"
        meta = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        return arrays, meta

    def restore_raw(self, modifier: str) -> Optional[tuple[dict, dict]]:
        """Restore without a structure template (returns plain array trees).
        Used by tooling (predict) that only needs params."""
        path = self._path(modifier)
        if not os.path.exists(path):
            return None
        arrays = self._ckptr.restore(path)
        meta_path = path + ".meta.json"
        meta = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        return arrays, meta

    def exists(self, modifier: str) -> bool:
        return os.path.exists(self._path(modifier))


def checkpoint_policy(cur_loss: float, loss_history: list,
                      last_chkpt_time: float,
                      time_interval_hours: float,
                      process_count: int = 1) -> Optional[str]:
    """Returns 'best', 'latest', or None (train.py:194-205).

    The time trigger reads the LOCAL wall clock; in multi-process runs the
    processes could disagree near the interval boundary and deadlock inside
    the collective orbax save, so process 0's decision is broadcast.
    """
    do_time = (time_interval_hours > 0 and
               (time.time() - last_chkpt_time) / 3600 > time_interval_hours)
    if process_count > 1:
        import numpy as np
        from jax.experimental import multihost_utils
        do_time = bool(multihost_utils.broadcast_one_to_all(
            np.asarray(do_time)))
    if len(loss_history) == 1 or (loss_history[:-1]
                                  and cur_loss < min(loss_history[:-1])):
        return "best"
    if do_time:
        return "latest"
    return None
