"""XLA flag sweep on the headline train step.

The encoder convs run at ~32% of v5e bf16 peak and every source-level
lever is measured (K8 Pallas conv: priced and rejected; stem relowering:
rejected; flat-2-D encodings: reverted — benchmarks/RESULTS.md). The one
untried axis is XLA's own compiler knobs. Each config runs `bench.py
train_perception` in a FRESH process (XLA_FLAGS is read once at backend
init) and reports rays/s; flags that win >2% are candidates for adoption
in bench.py/train.py (set os.environ before the first jax import).

Usage: python benchmarks/xla_flag_sweep.py [--only NAME]
"""

import argparse
import json
import os
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent

# Candidate flags (TPU): scoped VMEM bounds how large fused loops may get
# (bigger can help conv+elementwise fusions; too big spills), the
# latency-hiding scheduler mostly reorders async ops, and the two fusion
# knobs change the fusion cost model's aggressiveness.
CONFIGS = {
    # VMEM is ~16 MiB/core (pallas_guide.md); sweep the scoped limit both
    # ways around the default — too-large values fail loudly and are
    # recorded as such.
    "baseline": "",
    "vmem_8m": "--xla_tpu_scoped_vmem_limit_kib=8192",
    "vmem_24m": "--xla_tpu_scoped_vmem_limit_kib=24576",
    "vmem_32m": "--xla_tpu_scoped_vmem_limit_kib=32768",
    "lhs": "--xla_tpu_enable_latency_hiding_scheduler=true",
    "no_multi_output": "--xla_tpu_enable_multi_output_fusion=false",
}


def run_one(name: str, flags: str):
    env = dict(os.environ)
    if flags:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
    # per-config fresh cache dir: if a swept flag were NOT captured in the
    # persistent cache key, the run would silently reuse a baseline-compiled
    # executable and null the A/B — don't rely on key coverage (r4 advisor)
    env["JAX_COMPILATION_CACHE_DIR"] = f"/tmp/njf_sweep_cache_{name}"
    p = subprocess.run(
        [sys.executable, "bench.py", "train_perception"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800,
    )
    rays = mfu = None
    for line in p.stdout.splitlines():
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if rec.get("metric") == "train_rays_per_sec":
            rays = rec["value"]
        elif rec.get("metric") == "train_mfu_pct":
            mfu = rec["value"]
    err = ""
    if rays is None:
        tail = (p.stderr or "").strip().splitlines()[-3:]
        err = " | ".join(tail)
    print(json.dumps({"config": name, "flags": flags, "rays_per_sec": rays,
                      "mfu_pct": mfu, "error": err}), flush=True)
    return rays


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="run a single named config")
    args = ap.parse_args()
    results = {}
    for name, flags in CONFIGS.items():
        if args.only and name != args.only:
            continue
        results[name] = run_one(name, flags)
    base = results.get("baseline")
    if base:
        for name, rays in results.items():
            if rays and name != "baseline":
                print(f"{name}: {rays / base - 1.0:+.2%} vs baseline",
                      flush=True)


if __name__ == "__main__":
    main()
