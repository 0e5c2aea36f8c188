#!/usr/bin/env python
"""Randomly downsample every split of a dataset.

Capability parity with the reference's scripts/downsample_proteinnet.py:9-48:
keep n random items per split (or a fraction), writing a new dataset. Works
on both the reference .pt format and the native shard directory.

Run: python ptt_scripts/downsample_dataset.py <in> <out> --n 100
"""
import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def down_sample_split(split: dict, rng, n=None, fraction=None) -> dict:
    total = len(split["seq"])
    keep = n if n is not None else max(1, int(total * fraction))
    keep = min(keep, total)
    idx = sorted(rng.choice(total, size=keep, replace=False))
    out = {}
    for key in ("seq", "ang", "crd", "ids"):
        if key in split:
            out[key] = [split[key][i] for i in idx]
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input")
    p.add_argument("output", help="output dir (native format)")
    p.add_argument("--n", type=int, default=None)
    p.add_argument("--fraction", type=float, default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    assert args.n or args.fraction, "provide --n or --fraction"

    from protein_transformer_tpu.data.convert import convert
    from protein_transformer_tpu.data.dataset import load_dataset

    data = load_dataset(args.input)
    rng = np.random.default_rng(args.seed)
    out = {k: v for k, v in data.items()}
    for split in list(data):
        if isinstance(data[split], dict) and "seq" in data[split]:
            out[split] = down_sample_split(data[split], rng, args.n,
                                           args.fraction)
    convert(out, args.output)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
