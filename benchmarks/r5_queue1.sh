#!/bin/bash
# Round-5 study queue, phase 1 (VERDICT r4 item 2, the in-flight causal
# test): exact mode at 2x effective ray batch on the two collapsing seeds.
# If the gradient-concentration mechanism is causal, the larger ray batch
# (lower gradient variance, approximating the reference's DDP effective
# batch) should rescue the collapse.
# Results append to benchmarks/r5/study.jsonl (committed; /tmp dies).
# Wall-times in this queue are CONTENDED (builder shares the 1-core host).
set -x
cd "$(dirname "$0")/.."
OUT=benchmarks/r5/study.jsonl

run() {
  timeout 9000 python benchmarks/epipolar_study.py --out "$OUT" "$@" \
    2>&1 | tail -4
}

run --mode exact --seed 2 --rays 512 --tag exact-s2-rays512
run --mode exact --seed 0 --rays 512 --tag exact-s0-rays512
echo QUEUE1-DONE
