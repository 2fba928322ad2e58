#!/bin/bash
# Round-5 queue, phase 5 (post-reboot: the VM restart wiped /tmp and the
# persistent compile cache, so run 1 of everything below re-pays cold
# compiles). Runs AFTER the seed-2 recipe-v2 stabilizer run drains:
#   0. K10 clean re-price: conv_stats_proto bench on a quiet host (the
#      first pricing ran concurrently with a pytest sweep on this 1-core
#      box — re-measure before the ledger entry is final).
#   1. falsifiability (VERDICT r4 item 3): one FULL bench.py (cold
#      compiles; also warms the driver's cache), then two more repeats of
#      the two contested metrics — 3 consecutive measurements each for
#      field_queries / inverse_dynamics, must sit within 5%.
#   2. full-depth 2D transformer eval (VERDICT r4 item 5): ViT-S/14
#      depth 12 at 56x56 (patch-multiple), same harness as the depth-2 row.
#   3. post-conv step re-trace (VERDICT r4 item 6): bucket attribution at
#      r5 HEAD with the adopted conv impl.
set -x
cd "$(dirname "$0")/.."

while kill -0 "$(cat /tmp/study.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
sleep 10

timeout 1800 python benchmarks/conv_stats_proto.py bench \
  > benchmarks/r5/k10_bench_clean.log 2>&1
echo K10-DONE >> benchmarks/r5/k10_bench_clean.log

echo "=== falsifiability run 1 (full, cold compiles; headline now spc=6) ===" >> benchmarks/r5/bench3x.log
timeout 9000 python bench.py >> benchmarks/r5/bench3x.log 2>&1
for i in 2 3; do
  echo "=== falsifiability run $i (field_queries + inverse_dynamics) ===" \
    >> benchmarks/r5/bench3x.log
  timeout 3000 python bench.py bench_field_queries >> benchmarks/r5/bench3x.log 2>&1
  timeout 3000 python bench.py bench_inverse_dynamics >> benchmarks/r5/bench3x.log 2>&1
done
echo BENCH3X-DONE >> benchmarks/r5/bench3x.log

echo "=== full-depth ViT-S/14 transformer eval ===" > benchmarks/r5/eval2d_full.log
timeout 3600 python benchmarks/eval_2d.py --model transformer --full-vit \
  --tpu --steps 800 >> benchmarks/r5/eval2d_full.log 2>&1
echo EVAL2D-DONE >> benchmarks/r5/eval2d_full.log

echo "=== post-conv bucket re-trace (pallas) ===" > benchmarks/r5/retrace.log
timeout 1800 python benchmarks/trace_buckets.py --steps 12 \
  >> benchmarks/r5/retrace.log 2>&1

# per-step arm of the dispatch-amortization A/B (same chip window as the
# spc=6 headline; pays the two gate-variant program compiles once). Runs
# LAST — the morning convab per-step numbers already cover this arm
# (repro spread 0.14%); this is in-window confirmation if time allows.
echo "=== per-step arm: NJF_SPC=1 train_perception ===" >> benchmarks/r5/bench3x.log
NJF_SPC=1 timeout 3600 python bench.py bench_train_perception >> benchmarks/r5/bench3x.log 2>&1
echo QUEUE5-DONE >> benchmarks/r5/retrace.log
