#!/usr/bin/env python
"""Cross-run benchmark protocol: N fresh-process runs of bench.py.

Within-run variance is already pinned by paired-window p50/p95; what that
cannot see is cross-SESSION spread (compilation-cache state, tunnel health,
host load), which produced the standing 7.47-vs-6.73 ms p50 discrepancy
between round-4's committed claim and the driver capture. Protocol:

  1. every run is a fresh Python process (fresh jax client, fresh tunnel
     dispatch state);
  2. run 1 is discarded if the compile cache was cold for it (its JSON is
     still printed, flagged "cold": true);
  3. the headline is the MEDIAN of the remaining runs' p50s, reported with
     min/max spread -- round-over-round perf claims must quote this number.

Usage: python tools/bench_protocol.py [--runs 3] [--mode raw|trainer]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.expanduser("~/.cache/ptt_jax_cache")


def run_once(mode: str, steps: int, timeout: float = 600.0,
             retries: int = 1) -> dict:
    env = dict(os.environ, BENCH_STEPS=str(steps))
    if mode == "trainer":
        env["BENCH_MODE"] = "trainer"
    # Per-run timeout + one retry: a warm run takes ~2 min; the tunnel
    # transport occasionally wedges a single process indefinitely (observed:
    # a run stuck >10 min at ~0 CPU while a fresh process ran fine), and one
    # stuck run must not starve the whole protocol.
    for attempt in range(retries + 1):
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")],
                capture_output=True, text=True, env=env, cwd=REPO,
                timeout=timeout)
        except subprocess.TimeoutExpired:
            print(json.dumps({"event": "run_timeout", "attempt": attempt,
                              "timeout_s": timeout}), flush=True)
            continue
        if p.returncode == 0:
            break
        print(json.dumps({"event": "run_failed", "attempt": attempt,
                          "stderr_tail": p.stderr[-500:]}), flush=True)
    else:
        raise RuntimeError(f"bench.py failed {retries + 1} times")
    row = json.loads([ln for ln in p.stdout.splitlines()
                      if ln.startswith("{")][-1])
    m = re.search(r"p50: ([\d.]+) ms", p.stderr)
    if m:
        row["p50_ms"] = float(m.group(1))
    m = re.search(r"MFU ([\d.]+)%", p.stderr)
    if m:
        row["mfu_pct"] = float(m.group(1))
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--mode", default="raw", choices=["raw", "trainer"])
    ap.add_argument("--per_run_timeout", type=float, default=None,
                    help="seconds per fresh-process run (default 600 raw / "
                    "1200 trainer)")
    args = ap.parse_args()
    timeout = args.per_run_timeout or (1200 if args.mode == "trainer"
                                       else 600)

    cold = not (os.path.isdir(CACHE) and os.listdir(CACHE))
    rows = []
    for i in range(args.runs):
        row = run_once(args.mode, args.steps, timeout=timeout)
        row["run"] = i
        row["cold"] = cold and i == 0
        print(json.dumps(row), flush=True)
        rows.append(row)

    kept = [r for r in rows if not r["cold"]]
    key = "p50_ms" if all("p50_ms" in r for r in kept) else "value"
    vals = sorted(r[key] for r in kept)
    med = vals[len(vals) // 2]
    print(json.dumps({
        "protocol": f"median of {len(kept)} fresh-process runs"
                    + (" (cold run 0 discarded)" if cold else ""),
        "metric": key,
        "median": med,
        "spread": [vals[0], vals[-1]],
        "spread_pct": round(100 * (vals[-1] - vals[0]) / med, 2),
        "throughput_median": sorted(r["value"] for r in kept)[len(kept) // 2],
        "warm_cache": not cold,
    }), flush=True)


if __name__ == "__main__":
    main()
