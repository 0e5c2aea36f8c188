#!/usr/bin/env python
"""Compute per-dimension nanmean of a dataset's training angles.

Capability parity with the reference's scripts/compute_dataset_angle_means.py
(:10-25): nanmean over all train angle rows -> .npy file, used to initialize
model output heads.

Run: python ptt_scripts/compute_dataset_angle_means.py <data> <out.npy>
"""
import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("data")
    p.add_argument("out")
    args = p.parse_args(argv)
    from protein_transformer_tpu.data.dataset import load_dataset
    data = load_dataset(args.data)
    all_ang = np.concatenate([np.asarray(a, np.float32)
                              for a in data["train"]["ang"]])
    means = np.nanmean(all_ang, axis=0)
    np.save(args.out, means)
    print(f"wrote {args.out}: {means.round(4).tolist()}")


if __name__ == "__main__":
    main()
