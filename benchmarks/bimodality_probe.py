"""Root-cause probe for the field-query / inverse-dynamics bimodality
(VERDICT r4 item 3).

Observation: across rounds the training/render metrics repeat to ~3%
while field_queries swings 113-254 M/s and inverse_dynamics 5.9-13 ms —
and within a single r5 run one 200-query chain hit 199 M/s while its
siblings sat at ~110 M/s (benchmarks/r5/bench3x.log). The swing is
therefore a device-side state flip that selectively hits the
low-arithmetic-intensity programs.

Hypothesis: HBM-bandwidth contention (shared-tenancy chip behind the
axon tunnel). The query program is bandwidth-bound (cached-feature
reads dominate), the train step is MXU-bound, so a bandwidth thief
would reproduce exactly the observed selectivity.

Method: interleave three timed chains per round — (a) the REAL
field-query chain from bench.py (identical program), (b) a pure-MXU
chain (bf16 4096^2 matmul scan), (c) a pure-HBM chain (large f32
streaming add scan) — for N rounds, and report per-round rates plus
the cross-metric correlation. If query-rate tracks (c) but not (b),
the bimodality is bandwidth contention and the bench medians should be
read per-window; if it tracks neither, the flip is specific to the
query program (dispatch path, executable placement).

Run: python benchmarks/bimodality_probe.py [rounds]
Output: JSONL rows per round + a summary row with correlations.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import bench  # reuse the exact bench-path model + chain construction


def _pearson(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    if a.std() == 0 or b.std() == 0:
        return float("nan")
    return float(np.corrcoef(a, b)[0, 1])


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 12

    # (a) the real field-query chain — identical to bench.bench_field_queries
    from neural_jacobian_field_tpu.models.model import Model, RobotInput

    rays, samples, k = 4096, 64, 200
    model, variables, mi, enc = bench._encoding_setup(rays, samples)

    def infer(action):
        return model.apply(variables, enc, mi.camera_input,
                           RobotInput(robot_action=action),
                           method=Model.infer_optical_flow)

    @jax.jit
    def query_chain(a0):
        def body(a, _):
            out = infer(a)
            return jnp.full((1, bench.ACTION_DIM), 0.01) + 1e-6 * jnp.mean(out), out
        return jax.lax.scan(body, a0, None, length=k)

    a0 = jnp.full((1, bench.ACTION_DIM), 0.01)

    # (b) pure-MXU chain: bf16 4096^2 matmul, 100 chained (state feeds state
    # so nothing elides); ~13.7 TFLOP total -> ~0.1 s at decent MFU
    n_mm, mm_iters = 4096, 100

    @jax.jit
    def mxu_chain(x):
        def body(c, _):
            return jnp.tanh(c @ c), None
        return jax.lax.scan(body, x, None, length=mm_iters)[0]

    x_mm = jnp.asarray(
        np.random.RandomState(0).randn(n_mm, n_mm) * 0.01, jnp.bfloat16)

    # (c) pure-HBM chain: streaming add over a 128 MiB f32 buffer, 100
    # chained -> ~38 GiB of traffic, ~50 ms at v5e-class bandwidth
    n_bw, bw_iters = 32 * 1024 * 1024, 100  # 128 MiB f32

    @jax.jit
    def hbm_chain(x):
        def body(c, _):
            return c + 1.0, None
        return jax.lax.scan(body, x, None, length=bw_iters)[0]

    x_bw = jnp.zeros((n_bw,), jnp.float32)

    def timed(fn, *args):
        t0 = time.perf_counter()
        bench._sync(fn(*args))
        return time.perf_counter() - t0

    # warm all three (compile + first run)
    for fn, args in ((query_chain, (a0,)), (mxu_chain, (x_mm,)),
                     (hbm_chain, (x_bw,))):
        timed(lambda *a: fn(*a)[0] if fn is query_chain else fn(*a), *args)

    mm_flops = 2.0 * n_mm ** 3 * mm_iters
    bw_bytes = 2.0 * 4 * n_bw * bw_iters  # read + write per iter

    q_rates, mm_tf, bw_gbs = [], [], []
    for r in range(rounds):
        tq = timed(lambda a: query_chain(a)[1], a0)
        tm = timed(mxu_chain, x_mm)
        tb = timed(hbm_chain, x_bw)
        q = rays * samples * k / tq / 1e6
        m = mm_flops / tm / 1e12
        b = bw_bytes / tb / 1e9
        q_rates.append(q); mm_tf.append(m); bw_gbs.append(b)
        print(json.dumps({"round": r, "query_Mps": round(q, 1),
                          "mxu_TFLOPs": round(m, 1),
                          "hbm_GBps": round(b, 1)}), flush=True)

    summary = {
        "summary": True,
        "rounds": rounds,
        "query_Mps": {"min": round(min(q_rates), 1),
                      "median": round(float(np.median(q_rates)), 1),
                      "max": round(max(q_rates), 1)},
        "mxu_TFLOPs": {"min": round(min(mm_tf), 1),
                       "median": round(float(np.median(mm_tf)), 1),
                       "max": round(max(mm_tf), 1)},
        "hbm_GBps": {"min": round(min(bw_gbs), 1),
                     "median": round(float(np.median(bw_gbs)), 1),
                     "max": round(max(bw_gbs), 1)},
        "corr_query_vs_hbm": round(_pearson(q_rates, bw_gbs), 3),
        "corr_query_vs_mxu": round(_pearson(q_rates, mm_tf), 3),
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
