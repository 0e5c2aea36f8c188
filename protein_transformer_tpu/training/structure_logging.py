"""Async structure logging during training (reference: log.py:188-206,310-356).

Every ``log_structure_step`` train batches, the last batch item's predicted
angles are rebuilt to coordinates and written as pred/true PDB pairs under
``<out_dir>/structures/<name>/``, plus a glTF binary (.glb) with real bond
topology -- the PyMOL-free equivalent of the reference's gltf export
(PDB_Creator.py:186-212). With ``save_pngs`` a matplotlib 3-D render of the
predicted-vs-true backbone traces is written too (reference: ray-traced PNG
via PyMOL, PDB_Creator.py:174-184). Writing happens on a background thread so
the device step never blocks on host I/O (the reference rebuilds coordinates
on the host inside the training loop). wandb (optional) logs Molecule +
Object3D (+ Image for PNGs), matching log.py:310-356.
"""
from __future__ import annotations

import os
import queue
import threading
import numpy as np

from protein_transformer_tpu.protein.gltf import save_glb, save_glb_scene
from protein_transformer_tpu.protein.pdb import PdbWriter
from protein_transformer_tpu.protein.vocab import VOCAB

# the true structure's color in the combined aligned scene (pred keeps the
# backbone/sidechain palette) -- the reference colors the two structures
# differently in its single PyMOL scene (PDB_Creator.py:186-212)
_TRUE_COLOR = (0.55, 0.55, 0.55, 1.0)


def kabsch_align(mobile: np.ndarray, target: np.ndarray):
    """Least-squares rigid alignment of mobile onto target ((N, 3) each).

    Returns (transform, rmsd) where transform(x) maps any (..., 3) points
    with the fitted rotation+translation. Same math as losses.kabsch_rmsd,
    but exposing the transform so a whole structure can be moved into the
    target's frame (reference: PDB_Creator.py:186-199 via PyMOL align)."""
    mu_m, mu_t = mobile.mean(0), target.mean(0)
    h = (mobile - mu_m).T @ (target - mu_t)
    u, _s, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    r = vt.T @ np.diag([1.0, 1.0, d]) @ u.T

    def transform(x):
        return (x - mu_m) @ r.T + mu_t

    rmsd = float(np.sqrt(np.mean(
        np.sum((transform(mobile) - target) ** 2, axis=-1))))
    return transform, rmsd


def render_structure_png(path: str, pred_crd: np.ndarray,
                         true_crd: np.ndarray | None = None,
                         true_mask: np.ndarray | None = None) -> None:
    """3-D backbone-trace render (pred solid, true dashed) to a PNG file."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")
    ca = pred_crd[:, 1]  # CA trace
    ax.plot(ca[:, 0], ca[:, 1], ca[:, 2], color="#4682B4", lw=2,
            label="pred")
    if true_crd is not None:
        tca = true_crd[:, 1].copy()
        if true_mask is not None:
            tca = np.where(true_mask[:, 1, None], tca, np.nan)
        ax.plot(tca[:, 0], tca[:, 1], tca[:, 2], color="#FFBF26", lw=2,
                ls="--", label="true")
    ax.set_axis_off()
    ax.legend(loc="upper right")
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)


class StructureLogger:
    def __init__(self, out_dir: str, wandb_run=None, save_pngs: bool = False):
        self.dir = os.path.join(out_dir, "structures")
        os.makedirs(self.dir, exist_ok=True)
        self.wandb_run = wandb_run
        self.save_pngs = save_pngs
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
        # device->host fetches happen HERE, on the worker thread: pred_crd
        # may arrive as a jax device array so the train loop never blocks on
        # the link RTT for an artifact fetch.
        seq_ids = np.asarray(seq_ids)
        pred_crd = np.asarray(pred_crd)
        true_crd = np.asarray(true_crd)
        true_mask = np.asarray(true_mask)
        sel = seq_ids != VOCAB.pad_id
        seq_str = VOCAB.ints2str(seq_ids[sel])
        li = int(sel.sum())
        sub = os.path.join(self.dir, name)
        os.makedirs(sub, exist_ok=True)
        pred_path = os.path.join(sub, f"{step:05d}_pred.pdb")
        PdbWriter(pred_crd[:li], seq_str).save_pdb(pred_path, title="pred")
        glb_path = os.path.join(sub, f"{step:05d}_pred.glb")
        save_glb(glb_path, pred_crd[:li], seq_ids[sel])
        true_path = os.path.join(sub, "true.pdb")
        if not os.path.exists(true_path):
            masked = np.where(true_mask[:li, :, None], true_crd[:li], np.nan)
            PdbWriter(masked, seq_str).save_pdb(true_path, title="true")
            save_glb(os.path.join(sub, "true.glb"), true_crd[:li],
                     seq_ids[sel], atom_mask=true_mask[:li])
        # ONE aligned scene: pred Kabsch-aligned onto true, both structures
        # in a single .glb, plus the alignment RMSD of this snapshot
        # (reference: PDB_Creator.py:186-212 single PyMOL scene + align)
        align_rmsd = None
        scene_path = os.path.join(sub, f"{step:05d}_scene.glb")
        valid = true_mask[:li].reshape(-1)
        if valid.sum() >= 3:
            tf, align_rmsd = kabsch_align(
                pred_crd[:li].reshape(-1, 3)[valid],
                true_crd[:li].reshape(-1, 3)[valid])
            aligned = tf(pred_crd[:li].reshape(-1, 3)).reshape(li, -1, 3)
            save_glb_scene(scene_path, [
                (aligned, seq_ids[sel], None, None),
                (true_crd[:li], seq_ids[sel], true_mask[:li], _TRUE_COLOR),
            ])
        png_path = None
        if self.save_pngs:
            png_path = os.path.join(sub, f"{step:05d}.png")
            try:
                render_structure_png(png_path, pred_crd[:li], true_crd[:li],
                                     true_mask[:li])
            except Exception as e:
                print(f"[structure-log] png render failed: {e}")
                png_path = None
        if self.wandb_run is not None:
            import wandb
            payload = {f"{name}_mol": wandb.Molecule(pred_path),
                       f"{name}_3d": wandb.Object3D(open(glb_path, "rb"),
                                                    file_type="glb")}
            if align_rmsd is not None:
                payload[f"{name}_scene"] = wandb.Object3D(
                    open(scene_path, "rb"), file_type="glb")
                payload[f"{name}_align_rmsd"] = align_rmsd
            if png_path:
                payload[f"{name}_png"] = wandb.Image(png_path)
            self.wandb_run.log(payload, commit=False)

    def log(self, step: int, name: str, seq_ids: np.ndarray,
            pred_crd: np.ndarray, true_crd: np.ndarray,
            true_mask: np.ndarray) -> None:
        """Enqueue one structure; drops silently if the writer is backed up.

        Accepts jax device arrays -- the host fetch is deferred to the
        worker thread (see _write)."""
        try:
            self._q.put_nowait((step, name, seq_ids, pred_crd, true_crd,
                                true_mask))
        except queue.Full:
            pass

    def close(self):
        self._q.put(None)
        self._thread.join(timeout=5)
