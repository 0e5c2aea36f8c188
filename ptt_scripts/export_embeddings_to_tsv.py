#!/usr/bin/env python
"""Export a trained model's amino-acid embedding table as TSV files.

Capability parity with the reference's scripts/export_embeddings_to_tsv.py:
vectors.tsv + labels.tsv for the TensorFlow Embedding Projector.

Run: python ptt_scripts/export_embeddings_to_tsv.py <run_dir> [--out dir]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def find_embedding(params) -> np.ndarray:
    """Locate the (vocab, dm) embedding table in a parameter tree."""
    import jax

    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        keys = "/".join(str(getattr(k, "key", k)) for k in path)
        if "embedding" in keys.lower() and getattr(leaf, "ndim", 0) == 2:
            return np.asarray(leaf)
    raise ValueError("no embedding table found (linear-input models have none)")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("run_dir")
    p.add_argument("--out", default=None)
    p.add_argument("--checkpoint", default="best")
    args = p.parse_args(argv)

    from protein_transformer_tpu.predict import load_run
    from protein_transformer_tpu.protein.vocab import VOCAB

    _cfg, _model, params = load_run(args.run_dir, args.checkpoint)
    emb = find_embedding(params)
    out_dir = args.out or args.run_dir
    os.makedirs(out_dir, exist_ok=True)
    vec_path = os.path.join(out_dir, "vectors.tsv")
    lab_path = os.path.join(out_dir, "labels.tsv")
    with open(vec_path, "w") as f:
        for row in emb:
            f.write("\t".join(f"{x:.6f}" for x in row) + "\n")
    with open(lab_path, "w") as f:
        for i in range(emb.shape[0]):
            f.write(VOCAB.int2char(i) if i < len(VOCAB) else f"id{i}")
            f.write("\n")
    print(vec_path)
    print(lab_path)


if __name__ == "__main__":
    main()
