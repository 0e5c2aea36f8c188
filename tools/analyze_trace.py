#!/usr/bin/env python
"""Summarize a jax.profiler trace: top device ops by total time.

Parses the perfetto-format trace.json.gz that jax.profiler writes under
<logdir>/plugins/profile/<run>/ and aggregates device-lane event durations
by op name. Gives the per-step attribution the reference never had
(SURVEY 5.1: the reference logs only residues/sec).

Run: python tools/analyze_trace.py /tmp/jax_trace [--top 25]
"""
import argparse
import collections
import glob
import gzip
import json
import os
import re


def find_trace(logdir: str):
    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    return paths[-1]


def summarize(path: str, top: int = 25):
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # identify device lanes (TPU/accelerator pids)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {pid for pid, name in pid_names.items()
                   if re.search(r"TPU|/device|XLA Op", name, re.I)}
    agg = collections.defaultdict(float)
    count = collections.defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        # strip instance suffixes: fusion.123 -> fusion
        base = re.sub(r"[.\d]+$", "", name)
        agg[base] += e["dur"]
        count[base] += 1
        total += e["dur"]
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:top]
    print(f"{'op':55s} {'total_ms':>10s} {'%':>6s} {'count':>7s}")
    for name, dur in rows:
        print(f"{name[:55]:55s} {dur/1e3:10.2f} {100*dur/max(total,1):6.1f} "
              f"{count[name]:7d}")
    print(f"{'TOTAL (device lanes)':55s} {total/1e3:10.2f}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("logdir")
    p.add_argument("--top", type=int, default=25)
    args = p.parse_args()
    summarize(find_trace(args.logdir), args.top)


if __name__ == "__main__":
    main()
