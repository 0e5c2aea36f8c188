#!/usr/bin/env python
"""Write a dataset item's true structure (and its angle-rebuilt counterpart)
to PDB files.

Capability parity with the reference's scripts/proteinnet_item_to_pdb.py:
inspect a single stored protein without training anything. The '--rebuild'
output reconstructs coordinates from the stored angles through the geometry
engine, which checks dataset self-consistency.

Run: python ptt_scripts/dataset_item_to_pdb.py <data> --split train --idx 0
"""
import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("data")
    p.add_argument("--split", default="train")
    p.add_argument("--idx", type=int, default=0)
    p.add_argument("--out", default=None)
    p.add_argument("--rebuild", action="store_true",
                   help="also rebuild coordinates from the stored angles")
    args = p.parse_args(argv)

    from protein_transformer_tpu.data.dataset import load_dataset
    from protein_transformer_tpu.protein.constants import NUM_PREDICTED_COORDS
    from protein_transformer_tpu.protein.pdb import PdbWriter

    data = load_dataset(args.data)
    split = data[args.split]
    seq = split["seq"][args.idx]
    crd = np.asarray(split["crd"][args.idx], np.float32)
    pid = split.get("ids", [f"item{args.idx}"] * (args.idx + 1))[args.idx]
    out = args.out or f"{pid}_true.pdb"
    PdbWriter(crd.reshape(-1, NUM_PREDICTED_COORDS, 3),
              seq).save_pdb(out, title=f"true {pid}")
    print(out)

    if args.rebuild:
        import jax.numpy as jnp
        from protein_transformer_tpu.protein.geometry import (
            build_coords, inverse_trig_transform)
        from protein_transformer_tpu.protein.vocab import VOCAB
        sincos = np.nan_to_num(np.asarray(split["ang"][args.idx], np.float32))
        ang = inverse_trig_transform(jnp.asarray(sincos))
        ids = jnp.asarray([VOCAB[c] for c in seq], jnp.int32)
        rebuilt = np.asarray(build_coords(ang, ids))
        out2 = out.replace("_true.pdb", "_rebuilt.pdb")
        PdbWriter(rebuilt, seq).save_pdb(out2, title=f"rebuilt {pid}")
        print(out2)


if __name__ == "__main__":
    main()
