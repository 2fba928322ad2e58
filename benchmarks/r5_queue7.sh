#!/bin/bash
# Round-5 queue, phase 7 — durable re-run of everything the reboot + API
# outage killed. Launched detached (setsid) so it survives the driver
# session; each stage commits its own logs so results land even if no
# interactive session returns.
#   1. falsifiability run 1: FULL bench.py (cold compiles; warms the
#      driver's cache) — VERDICT r4 item 3.
#   2-3. falsifiability runs 2 and 3: the two contested metrics only.
#   4. post-conv bucket re-trace at r5 HEAD (VERDICT r4 item 6).
#   5. full-depth ViT-S/14 2D transformer eval (VERDICT r4 item 5).
#   6. bimodality probe (item 3 root-cause, if the 3x check needs it).
#   7-8. stabilizer due diligence: recipe v2 on seed 1 (healthy guard)
#      then seed 0 — launch-cutoff-guarded so a round-end driver bench
#      isn't fighting a 59-minute study for the chip.
set -x
cd "$(dirname "$0")/.."
T0=$(date +%s)
ckpt() {  # commit whatever a stage just wrote; logs only, never source
  git add benchmarks/r5 >/dev/null 2>&1
  git commit -q -m "$1" >/dev/null 2>&1 || true
}

echo "=== falsifiability run 1 (full, cold compiles; headline spc=6) ===" > benchmarks/r5/bench3x.log
timeout 9000 python bench.py >> benchmarks/r5/bench3x.log 2>&1
ckpt "Falsifiability run 1: full bench at r5 HEAD (cold compiles)"
for i in 2 3; do
  echo "=== falsifiability run $i (field_queries + inverse_dynamics) ===" \
    >> benchmarks/r5/bench3x.log
  timeout 3000 python bench.py bench_field_queries >> benchmarks/r5/bench3x.log 2>&1
  timeout 3000 python bench.py bench_inverse_dynamics >> benchmarks/r5/bench3x.log 2>&1
done
echo BENCH3X-DONE >> benchmarks/r5/bench3x.log
ckpt "Falsifiability runs 2-3: contested inference metrics repeated"

echo "=== post-conv bucket re-trace (pallas) ===" > benchmarks/r5/retrace.log
timeout 1800 python benchmarks/trace_buckets.py --steps 12 \
  >> benchmarks/r5/retrace.log 2>&1
echo RETRACE-DONE >> benchmarks/r5/retrace.log
ckpt "Post-conv step re-trace: bucket attribution at r5 HEAD"

echo "=== full-depth ViT-S/14 transformer eval ===" > benchmarks/r5/eval2d_full.log
timeout 3600 python benchmarks/eval_2d.py --model transformer --full-vit \
  --tpu --steps 800 >> benchmarks/r5/eval2d_full.log 2>&1
echo EVAL2D-DONE >> benchmarks/r5/eval2d_full.log
ckpt "Full-depth ViT-S/14 2D transformer eval"

timeout 2400 python benchmarks/bimodality_probe.py 12 \
  > benchmarks/r5/bimodality.log 2>&1
echo PROBE-DONE >> benchmarks/r5/bimodality.log
ckpt "Bimodality probe: interleaved query/MXU/HBM chains on-chip"

run() {
  timeout 4200 python benchmarks/epipolar_study.py --out benchmarks/r5/study.jsonl "$@" \
    > /dev/null 2>&1
}
if [ $(( $(date +%s) - T0 )) -lt 4200 ]; then
  run --mode exact --seed 1 --grad-clip 1.0 --enc-lr-scale 0.5 --tag exact-s1-clip1-enc05
  ckpt "Stabilizer due diligence: recipe v2 on seed 1 (healthy guard)"
fi
if [ $(( $(date +%s) - T0 )) -lt 8400 ]; then
  run --mode exact --seed 0 --grad-clip 1.0 --enc-lr-scale 0.5 --tag exact-s0-clip1-enc05
  ckpt "Stabilizer due diligence: recipe v2 on seed 0"
fi
echo QUEUE7-DONE >> benchmarks/r5/retrace.log
ckpt "Queue 7 drained"
