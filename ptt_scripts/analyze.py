#!/usr/bin/env python
"""Compare multiple training runs: final/best metrics from their CSV logs.

The reference's scripts/analyze.py is an unfinished stub (:16-24, "analyze
performance of multiple models"); this implements that capability: read each
run's .train CSV, report best/final epoch metrics per mode, and rank runs.

Run: python ptt_scripts/analyze.py runs/run1 runs/run2 [--metric drmsd]
"""
import argparse
import csv
import json
import os
import sys

import numpy as np

METRICS = ("drmsd", "ln_drmsd", "rmse", "rmsd", "combined")


def read_epoch_rows(train_csv: str, mode: str):
    with open(train_csv) as f:
        reader = csv.reader(f)
        header = next(reader)
        cols = {name: i for i, name in enumerate(header)}
        rows = [r for r in reader
                if r and r[cols["mode"]] == mode
                and r[cols["granularity"]] == "epoch"]
    return header, cols, rows


def summarize_run(run_dir: str, mode: str) -> dict:
    name = os.path.basename(run_dir.rstrip("/"))
    csvs = [f for f in os.listdir(run_dir) if f.endswith(".train")]
    if not csvs:
        raise FileNotFoundError(f"no .train log in {run_dir}")
    header, cols, rows = read_epoch_rows(os.path.join(run_dir, csvs[0]), mode)
    out = {"run": name, "epochs": len(rows)}
    cfg_path = os.path.join(run_dir, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cfg = json.load(f)["config"]
        out["model"] = cfg.get("model")
        out["d_model"] = cfg.get("d_model")
        out["loss"] = cfg.get("loss")
    for m in METRICS:
        if m in cols and rows:
            vals = np.array([float(r[cols[m]]) for r in rows])
            out[f"best_{m}"] = float(vals.min())
            out[f"final_{m}"] = float(vals[-1])
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("runs", nargs="+")
    p.add_argument("--mode", default="train")
    p.add_argument("--metric", default="rmse", choices=METRICS)
    args = p.parse_args(argv)
    summaries = [summarize_run(r, args.mode) for r in args.runs]
    key = f"best_{args.metric}"
    summaries.sort(key=lambda s: s.get(key, float("inf")))
    fields = ["run", "model", "d_model", "loss", "epochs",
              f"best_{args.metric}", f"final_{args.metric}"]
    print("  ".join(f"{f:>14s}" for f in fields))
    for s in summaries:
        print("  ".join(f"{str(s.get(f, '-'))[:14]:>14s}" for f in fields))
    return 0


if __name__ == "__main__":
    sys.exit(main())
