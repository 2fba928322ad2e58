#!/bin/bash
# Round-5 queue, phase 6. Runs AFTER queue5 drains:
#   0. bimodality probe (VERDICT r4 item 3 root-cause): interleaved
#      query/MXU/HBM chains — runs FIRST so it samples the same chip
#      window that produced the 113 M/s field-query readings.
#   1-2. exact-mode stabilizer due diligence: the shipped recipe
#      (grad_clip_norm=1.0 + encoder_lr_scale=0.5) on seeds 1 (healthy
#      guard) and 0 (stage-2 flavor) at reference scale; seed 2 already
#      landed at J 0.119 / PSNR 32.13 (study.jsonl).
set -x
cd "$(dirname "$0")/.."
OUT=benchmarks/r5/study.jsonl

while kill -0 "$(cat /tmp/queue5.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
sleep 10

timeout 2400 python benchmarks/bimodality_probe.py 12 \
  > benchmarks/r5/bimodality.log 2>&1
echo PROBE-DONE >> benchmarks/r5/bimodality.log

run() {
  timeout 9000 python benchmarks/epipolar_study.py --out "$OUT" "$@" \
    2>&1 | tail -3
}
run --mode exact --seed 1 --grad-clip 1.0 --enc-lr-scale 0.5 --tag exact-s1-clip1-enc05
run --mode exact --seed 0 --grad-clip 1.0 --enc-lr-scale 0.5 --tag exact-s0-clip1-enc05
echo QUEUE6-DONE
