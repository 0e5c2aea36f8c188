#!/usr/bin/env python
"""Build tiny development datasets for overfitting experiments.

Capability parity with the reference's scripts/create_development_datasets.py
(:17-48): given a list of protein ids (e.g. data/development/helices.txt in
the reference repo), extract those items from a full dataset into a small
dataset where train == valid-* == test (the reference's dev-dataset shape).

Run: python ptt_scripts/create_development_datasets.py <data> <ids.txt> <out_dir>
"""
import argparse
import sys

sys.path.insert(0, ".")


def make_dev_dataset(data: dict, wanted_ids: list[str]) -> dict:
    train = data["train"]
    ids = [str(i) for i in train.get("ids", [])]
    keep = [i for i, pid in enumerate(ids) if pid in set(wanted_ids)]
    if not keep:
        # also try substring match (reference ids embed chain info)
        keep = [i for i, pid in enumerate(ids)
                if any(w in pid for w in wanted_ids)]
    assert keep, "none of the requested ids found in the dataset"
    small = {k: [train[k][i] for i in keep]
             for k in ("seq", "ang", "crd", "ids") if k in train}
    out = {"train": small, "test": small,
           "settings": data.get("settings", {}), "date": data.get("date")}
    for split in (10, 20, 30, 40, 50, 70, 90):
        out[f"valid-{split}"] = small
    return out


def extract_ids_dataset(data: dict, wanted_ids: list[str]) -> dict:
    """Pull named ids from ANY split into a mini dataset (capability of the
    reference's scripts/extract_processed_ids.py)."""
    small = {"seq": [], "ang": [], "crd": [], "ids": []}
    for split, d in data.items():
        if not isinstance(d, dict) or "seq" not in d:
            continue
        for i, pid in enumerate(d.get("ids", [])):
            if any(w in str(pid) for w in wanted_ids):
                for k in small:
                    if k in d:
                        small[k].append(d[k][i])
    out = {"train": small, "test": small,
           "settings": data.get("settings", {}), "date": data.get("date")}
    for split in (10, 20, 30, 40, 50, 70, 90):
        out[f"valid-{split}"] = small
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("data")
    p.add_argument("ids_file")
    p.add_argument("out_dir")
    p.add_argument("--any_split", action="store_true",
                   help="search all splits, not just train")
    args = p.parse_args(argv)
    from protein_transformer_tpu.data.convert import convert
    from protein_transformer_tpu.data.dataset import load_dataset
    with open(args.ids_file) as f:
        wanted = [line.strip() for line in f if line.strip()]
    data = load_dataset(args.data)
    out = (extract_ids_dataset if args.any_split else make_dev_dataset)(
        data, wanted)
    convert(out, args.out_dir)
    print(f"wrote {args.out_dir} with {len(out['train']['seq'])} items")


if __name__ == "__main__":
    main()
