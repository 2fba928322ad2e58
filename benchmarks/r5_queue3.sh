#!/bin/bash
# Round-5 queue, phase 3. Runs AFTER queue2 drains (clean chip):
#   1. falsifiability check (VERDICT r4 item 3): 3 consecutive full
#      bench.py runs — field_queries / inverse_dynamics must sit within 5%
#      now that both report the median of 5 on-device chains.
#   2. full-depth 2D transformer eval (VERDICT r4 item 5): ViT-S/14
#      depth 12 at 56x56 (patch-multiple), same harness as the depth-2 row.
#   3. post-conv step re-trace (VERDICT r4 item 6): bucket attribution at
#      r5 HEAD with the winning conv impl.
# Usage: r5_queue3.sh <conv_impl>   (xla | pallas — the A/B winner)
set -x
cd "$(dirname "$0")/.."
CONV=${1:-xla}

while kill -0 "$(cat /tmp/queue2.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
sleep 10

# run 1 carries the cold Mosaic compiles of every non-perception program
# with pallas convs (~20 min/program through the tunnel, see RESULTS r5) —
# give it room; runs 2-3 are warm-cache and are the actual 5%-repro check.
for i in 1 2 3; do
  TMO=3000; [ "$i" = 1 ] && TMO=9000
  echo "=== falsifiability run $i (conv=$CONV) ===" >> benchmarks/r5/bench3x.log
  NJF_CONV_IMPL=$CONV timeout $TMO python bench.py \
    >> benchmarks/r5/bench3x.log 2>&1
done
echo BENCH3X-DONE >> benchmarks/r5/bench3x.log

echo "=== full-depth ViT-S/14 transformer eval ===" >> benchmarks/r5/eval2d_full.log
timeout 3600 python benchmarks/eval_2d.py --model transformer --full-vit \
  --tpu --steps 800 >> benchmarks/r5/eval2d_full.log 2>&1
echo EVAL2D-DONE >> benchmarks/r5/eval2d_full.log

echo "=== post-conv bucket re-trace (conv=$CONV) ===" >> benchmarks/r5/retrace.log
NJF_CONV_IMPL=$CONV timeout 1800 python benchmarks/trace_buckets.py \
  --steps 12 >> benchmarks/r5/retrace.log 2>&1
NJF_CONV_IMPL=$CONV timeout 1800 python benchmarks/trace_buckets.py \
  --steps 12 --category "data formatting" --top 25 \
  >> benchmarks/r5/retrace.log 2>&1
echo QUEUE3-DONE >> benchmarks/r5/retrace.log
