#!/bin/bash
# Round-5 queue, phase 4. Runs AFTER queue3 drains:
#   0. conv_step_diag kernels phase — per-family K9 timings on-chip
#      (attributes the A/B's realized 1.87 ms vs the priced ~6 ms).
#   1-3. exact-mode stabilizer recipe v2 at reference scale: grad-clip 1.0
#      + encoder_lr_scale 0.5, seeds 2 (the stage-1 collapse flavor),
#      1 (healthy unclipped — recipe must not break it), 0.
# Results: benchmarks/r5/study.jsonl rows + diag log.
set -x
cd "$(dirname "$0")/.."
OUT=benchmarks/r5/study.jsonl

while kill -0 "$(cat /tmp/queue3.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
sleep 10

timeout 3600 python benchmarks/conv_step_diag.py kernels \
  > benchmarks/r5/convdiag.log 2>&1
timeout 3600 python benchmarks/conv_step_diag.py step \
  >> benchmarks/r5/convdiag.log 2>&1
echo DIAG-DONE >> benchmarks/r5/convdiag.log

run() {
  timeout 9000 python benchmarks/epipolar_study.py --out "$OUT" "$@" \
    2>&1 | tail -3
}
run --mode exact --seed 2 --grad-clip 1.0 --enc-lr-scale 0.5 --tag exact-s2-clip1-enc05
run --mode exact --seed 1 --grad-clip 1.0 --enc-lr-scale 0.5 --tag exact-s1-clip1-enc05
run --mode exact --seed 0 --grad-clip 1.0 --enc-lr-scale 0.5 --tag exact-s0-clip1-enc05
echo QUEUE4-DONE
