"""Prediction tooling: checkpoint -> angle predictions -> PDB structures.

Clean rebuild of the reference's bit-rotted scripts/predict.py capability
(SURVEY 2.5): load a trained run, predict angles for dataset items, rebuild
all-atom coordinates on device, and write pred/true PDB pairs. The
``--reconstruct`` mode rebuilds TRUE structures from TRUE angles -- the
reference's geometry debugging tool (predict.py:360-361,129-131).

Run: python -m protein_transformer_tpu.predict <run_dir> --data <path>
         [--split test] [--n 5] [--reconstruct] [--out preds/]
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

from protein_transformer_tpu.config import TrainConfig
from protein_transformer_tpu.data.dataset import (
    DataModule, collate, load_dataset)
from protein_transformer_tpu.models.factory import make_model
from protein_transformer_tpu.protein.pdb import PdbWriter
from protein_transformer_tpu.training.checkpoint import CheckpointManager


def load_run(run_dir: str, modifier: str = "best"):
    """Load (cfg, model, params) from a training run directory."""
    with open(os.path.join(run_dir, "config.json")) as f:
        saved = json.load(f)
    cfg = TrainConfig.from_dict(saved["config"]).finalize()
    angle_means = np.asarray(saved["angle_means"], np.float32)
    model = make_model(cfg, angle_means)

    ckpt = CheckpointManager(os.path.join(run_dir, "checkpoints"))
    result = ckpt.restore_raw(modifier)
    if result is None:
        raise FileNotFoundError(
            f"no '{modifier}' checkpoint in {run_dir}/checkpoints")
    arrays, _meta = result
    return cfg, model, arrays["params"]


def predict_structures(run_dir: str, data_path: str, split: str = "test",
                       n: int = 5, out_dir: str = "predictions",
                       reconstruct: bool = False,
                       modifier: str = "best",
                       batch_size: int = 8) -> list[str]:
    """Predict n structures from a split; returns written PDB paths.

    Inference is BATCHED on the bucket lattice (length-sorted groups of up
    to batch_size proteins padded to the same static shape), so a whole
    split compiles a handful of executables and the chip runs dense
    batches -- vs the reference's one-protein-at-a-time CPU loop
    (scripts/predict.py). Outputs are per-protein and identical to the
    unbatched path (padding rows are masked; the builder vmaps per
    protein)."""
    import jax
    import jax.numpy as jnp

    from protein_transformer_tpu.protein.geometry import (
        build_coords_batch, inverse_trig_transform)

    os.makedirs(out_dir, exist_ok=True)
    data = load_dataset(data_path)
    cfg, model, params = load_run(run_dir, modifier)
    dm = DataModule(data, cfg)
    ds = dm.eval_splits[split] if split != "train" else dm.train

    @jax.jit
    def infer(seq, ang):
        sincos = ang if reconstruct else model.apply(
            params, seq, ang, deterministic=True)
        return build_coords_batch(inverse_trig_transform(sincos), seq)

    # length-descending order packs same-bucket proteins together
    sel = np.arange(min(n, len(ds)))
    order = sel[np.argsort(-ds.lens[sel], kind="stable")]
    tag = "recon" if reconstruct else "pred"
    paths = []
    for start in range(0, len(order), batch_size):
        idx = order[start:start + batch_size]
        batch = collate(ds, idx, cfg.bucket_sizes, dm.max_seq_len,
                        pad_batch=True)
        crd_all = np.asarray(infer(jnp.asarray(batch.seq),
                                   jnp.asarray(batch.ang)))
        for row, i in enumerate(idx):
            li = int(ds.lens[i])
            seq_str = ds.seqs[i][:li]
            pdb_path = os.path.join(out_dir, f"{ds.ids[i]}_{tag}.pdb")
            PdbWriter(crd_all[row, :li], seq_str).save_pdb(
                pdb_path, title=f"{tag} {ds.ids[i]}")
            paths.append(pdb_path)

            true_crd = np.where(batch.crd_mask[row, :li, :, None],
                                batch.crd[row, :li], np.nan)
            true_path = os.path.join(out_dir, f"{ds.ids[i]}_true.pdb")
            PdbWriter(true_crd, seq_str).save_pdb(true_path,
                                                  title=f"true {ds.ids[i]}")
            paths.append(true_path)
    return paths


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("run_dir")
    p.add_argument("--data", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--n", type=int, default=5)
    p.add_argument("--out", default="predictions")
    p.add_argument("--reconstruct", action="store_true")
    p.add_argument("--checkpoint", default="best")
    p.add_argument("--batch", type=int, default=8,
                   help="inference batch size (bucket-padded)")
    args = p.parse_args(argv)
    paths = predict_structures(args.run_dir, args.data, args.split, args.n,
                               args.out, args.reconstruct, args.checkpoint,
                               batch_size=args.batch)
    for path in paths:
        print(path)


if __name__ == "__main__":
    main()
