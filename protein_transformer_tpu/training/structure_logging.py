"""Async structure logging during training (reference: log.py:188-206,310-356).

Every ``log_structure_step`` train batches, the last batch item's predicted
angles are rebuilt to coordinates and written as pred/true PDB pairs under
``<out_dir>/structures/<name>/``. Writing happens on a background thread so
the device step never blocks on host I/O (the reference rebuilds coordinates
on the host inside the training loop). PyMOL gltf/png/pse export is not
reproduced -- PDB files are the portable artifact; wandb (optional) logs them
as Molecule objects.
"""
from __future__ import annotations

import os
import queue
import threading
import numpy as np

from protein_transformer_tpu.protein.pdb import PdbWriter
from protein_transformer_tpu.protein.vocab import VOCAB


class StructureLogger:
    def __init__(self, out_dir: str, wandb_run=None):
        self.dir = os.path.join(out_dir, "structures")
        os.makedirs(self.dir, exist_ok=True)
        self.wandb_run = wandb_run
        self._q: queue.Queue = queue.Queue(maxsize=4)
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            try:
                self._write(*item)
            except Exception as e:  # logging must never kill training
                print(f"[structure-log] failed: {e}")
            finally:
                self._q.task_done()

    def _write(self, step, name, seq_ids, pred_crd, true_crd, true_mask):
        sel = seq_ids != VOCAB.pad_id
        seq_str = VOCAB.ints2str(seq_ids[sel])
        li = int(sel.sum())
        sub = os.path.join(self.dir, name)
        os.makedirs(sub, exist_ok=True)
        pred_path = os.path.join(sub, f"{step:05d}_pred.pdb")
        PdbWriter(pred_crd[:li], seq_str).save_pdb(pred_path, title="pred")
        true_path = os.path.join(sub, "true.pdb")
        if not os.path.exists(true_path):
            masked = np.where(true_mask[:li, :, None], true_crd[:li], np.nan)
            PdbWriter(masked, seq_str).save_pdb(true_path, title="true")
        if self.wandb_run is not None:
            import wandb
            self.wandb_run.log({f"{name}_mol": wandb.Molecule(pred_path)},
                               commit=False)

    def log(self, step: int, name: str, seq_ids: np.ndarray,
            pred_crd: np.ndarray, true_crd: np.ndarray,
            true_mask: np.ndarray) -> None:
        """Enqueue one structure; drops silently if the writer is backed up."""
        try:
            self._q.put_nowait((step, name, np.asarray(seq_ids),
                                np.asarray(pred_crd), np.asarray(true_crd),
                                np.asarray(true_mask)))
        except queue.Full:
            pass

    def close(self):
        self._q.put(None)
        self._thread.join(timeout=5)
