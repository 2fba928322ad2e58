#!/bin/bash
# Round-5 queue, phase 2. Runs AFTER queue1 (the causal rays-512 tests):
#   A. clean-chip perf window (no other TPU client):
#      1. K9 conv A/B: bench.py train_perception with NJF_CONV_IMPL=xla vs
#         pallas, interleaved x2 (VERDICT r4 item 1)
#      2. from-disk sustained training: input_pipeline_bench --with-device
#         at workers 2 and 4 (VERDICT r4 item 4)
#   B. exact-mode stabilizer runs at reference scale (VERDICT r4 item 2):
#      grad-clip 1.0 on the two collapsing seeds (2, 0)
# Results: benchmarks/r5/*.log + study rows in benchmarks/r5/study.jsonl.
set -x
cd "$(dirname "$0")/.."
OUT=benchmarks/r5/study.jsonl

# wait for queue1's TPU clients to drain (clean-chip wall times below)
while kill -0 "$(cat /tmp/queue1.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
while kill -0 "$(cat /tmp/study.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
sleep 10

# --- A1: conv A/B (interleaved, 2 rounds each) ---------------------------
for round in 1 2; do
  for impl in xla pallas; do
    echo "=== conv A/B round $round impl=$impl ===" >> benchmarks/r5/convab.log
    NJF_CONV_IMPL=$impl timeout 1500 python bench.py train_perception \
      >> benchmarks/r5/convab.log 2>&1
  done
done
echo CONVAB-DONE >> benchmarks/r5/convab.log

# --- A2: from-disk sustained training (reference-shape scene on disk) ----
# loader worker-scaling sweep + the real jitted train step consuming the
# threaded loader through DevicePrefetcher (sustained end-to-end steps/s)
timeout 3600 python benchmarks/input_pipeline_bench.py \
  --scene /tmp/njf_epi_scene --mode action --with-device --workers 2,4,8 \
  --batches 20 --device-steps 80 \
  --out benchmarks/r5/fromdisk.jsonl >> benchmarks/r5/fromdisk.log 2>&1
echo FROMDISK-DONE >> benchmarks/r5/fromdisk.log

# --- B: stabilizer runs (quality outcome; reference scale rays=256) ------
run() {
  timeout 9000 python benchmarks/epipolar_study.py --out "$OUT" "$@" \
    2>&1 | tail -4
}
run --mode exact --seed 2 --grad-clip 1.0 --tag exact-s2-clip1
run --mode exact --seed 0 --grad-clip 1.0 --tag exact-s0-clip1
echo QUEUE2-DONE
