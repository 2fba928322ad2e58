#!/bin/bash
# Round-4 study queue (VERDICT r3 items 1 + 6): run serially on the one chip.
#   - exact seed 2 (third exact seed for the anomaly ledger)
#   - knot-budget seeds to reach 4 seeds/cell at (32,8,4)/(64,16,8)/(96,24,12)
# Each run appends a JSON line to $OUT. Wall times are only meaningful if the
# box is otherwise quiet.
set -x
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/njf_epi_study.jsonl}

run() {
  timeout 4200 python benchmarks/epipolar_study.py --out "$OUT" "$@" \
    2>&1 | tail -3
}

# round-robin across cells so a truncated queue still leaves balanced
# seed counts (the box restarted mid-queue once already)
run --mode exact --seed 2 --tag exact-s2
run --mode epipolar --knots 32,8,4 --seed 1
run --mode epipolar --knots 96,24,12 --seed 2
run --mode epipolar --knots 64,16,8 --seed 3
run --mode epipolar --knots 32,8,4 --seed 2
run --mode epipolar --knots 96,24,12 --seed 3
run --mode epipolar --knots 32,8,4 --seed 3
echo QUEUE-DONE
