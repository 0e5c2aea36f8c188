#!/bin/bash
# Round-5 measurement campaign: runs sequentially on the single real chip.
# Each stage appends JSON lines to /tmp/campaign_r5/<stage>.jsonl.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/campaign_r5
mkdir -p $OUT

stage() {
  local name=$1; shift
  echo "=== $name: $* (start $(date +%H:%M:%S))" >> $OUT/progress.log
  timeout 1800 "$@" >> $OUT/$name.jsonl 2>> $OUT/$name.err
  echo "=== $name: exit=$? ($(date +%H:%M:%S))" >> $OUT/progress.log
}

# 1. cross-run protocol on the flagship raw step (>=3 fresh processes)
stage protocol_raw python tools/bench_protocol.py --runs 3 --mode raw

# 2. ladder sweep fp32 (configs 1..5) -- MFU per config
stage ladder_fp32 python tools/bench_ladder.py --configs 1 2 3 4 5 --dtype float32

# 3. ladder bf16 where MXU-bound (4, 5)
stage ladder_bf16 python tools/bench_ladder.py --configs 4 5 --dtype bfloat16

# 4. max-batch operating point: flagship (config 4) + config 5, fp32 + bf16
stage maxbatch_c4_fp32 python tools/bench_ladder.py --configs 4 --max-batch
stage maxbatch_c4_bf16 python tools/bench_ladder.py --configs 4 --max-batch --dtype bfloat16
stage maxbatch_c5_bf16 python tools/bench_ladder.py --configs 5 --max-batch --dtype bfloat16

# 5. trainer-loop protocol (real Trainer.train)
stage protocol_trainer python tools/bench_protocol.py --runs 3 --mode trainer

echo "CAMPAIGN DONE $(date +%H:%M:%S)" >> $OUT/progress.log
