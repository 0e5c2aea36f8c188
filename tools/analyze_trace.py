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


def summarize_attributed(path: str, top: int = 20, steps: int = 1):
    """Aggregate DEVICE time by hlo_category and by Python source line.

    Uses the per-event 'device_duration_ps' + XLA metadata the plain
    summary ignores; this is the view that attributed config-5's step to
    dense work vs optimizer vs dropout vs NeRF (round 5). steps: divide
    totals into per-step numbers when the trace covers a known step count.
    """
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    device_pids = {pid for pid, name in pid_names.items()
                   if re.search(r"TPU|/device", name, re.I)}
    by_cat = collections.defaultdict(float)
    by_src = collections.defaultdict(float)
    n_cat = collections.defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        a = e.get("args", {})
        c = a.get("hlo_category")
        if not c:
            continue
        d = float(a.get("device_duration_ps", 0)) / 1e9  # ms
        by_cat[c] += d
        n_cat[c] += 1
        total += d
        src = a.get("source", "")
        by_src[src.rsplit("/", 1)[-1] or "(no source)"] += d
    print(f"== device time by hlo_category (ms/step over {steps} steps) ==")
    for c, d in sorted(by_cat.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{c[:32]:32s} {d/steps:8.3f} ms {100*d/max(total,1e-9):5.1f}% "
              f"n/step={n_cat[c]/steps:8.1f}")
    print(f"{'TOTAL':32s} {total/steps:8.3f} ms")
    print(f"\n== device time by source line (ms/step) ==")
    for s, d in sorted(by_src.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{d/steps:8.3f} ms  {s[:70]}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("logdir")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--by", choices=["op", "source"], default="op")
    p.add_argument("--steps", type=int, default=1,
                   help="steps in the traced window (per-step division)")
    args = p.parse_args()
    path = find_trace(args.logdir)
    if args.by == "source":
        summarize_attributed(path, args.top, args.steps)
    else:
        summarize(path, args.top)


if __name__ == "__main__":
    main()
