#!/bin/bash
# Round-5 "reference default recipe" convergence run (VERDICT r4 weak #5):
# the reference's own defaults -- sgd + plateau scheduling, lr 1e-4,
# combined loss, B=8, clip 1 (reference train.py:405-455) -- on the
# 380-chain learnable scale dataset, same conv-enc dm=256 nl=6 model as
# the round-4 c4 run (which used adam+noam). Round 4's c3 showed
# sgd@1e-4 cannot move the *drmsd-only* loss; the reference never ships
# that pairing as a default -- its default loss is combined, whose
# z-scaled MSE term gives sgd a usable gradient.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/scale_runs_r5}
mkdir -p "$OUT"
if [ ! -f /tmp/scale_data/train.npz ] && [ ! -d /tmp/scale_data ]; then
  python tools/gen_scale_data.py --out /tmp/scale_data
fi
exec python -m protein_transformer_tpu.training.cli \
  --data /tmp/scale_data --name sgd-default --out_dir "$OUT" \
  -m 'conv-enc|21,11,3|1,1,1' -dm 256 -dih 1024 -nl 6 -nh 8 \
  -l combined -opt sgd --lr_scheduling plateau -lr 1e-4 -cg 1 -b 8 \
  -e 120 -es 25 --patience 10 -c True --seed 11731
