"""Price the Pallas conv suite (VERDICT r3 item 5b) at the layer2 shape.

Compares XLA's conv lowering against the K8 prototype
(ops/pallas/conv3x3.py) for forward, dgrad (= stride-1 conv with the
spatially-flipped transposed kernel — same kernel structure as fwd), and
wgrad, at the r3 trace's biggest single conv cost:
x [7, 60, 80, 128] (layer2 activations at 480x640) x w [3, 3, 128, 128],
bf16 inputs / f32 accum, 100-iteration on-device chains, scalar-pull sync.

Prints one JSON line per (op, impl): {"op", "impl", "ms", "tflops"}.
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

B, H, W, C = 7, 60, 80, 128
FLOPS = 2 * B * H * W * C * C * 9  # one conv


def _sync(x):
    return float(np.asarray(jax.device_get(x)).ravel()[0])


def bench(fn, *args, iters=100):
    """Chain fn on-device via fori_loop so nothing is elided.

    The chained jit returns a SCALAR: pulling the full activation array
    over the axon tunnel (~100 MB/s) costs more than the compute being
    measured and was the r4 first-draft bug here (8.6 MB x [7,60,80,128]
    bf16 read ~2-7 ms/iter of pure transfer into the 'conv' time).
    """

    @jax.jit
    def chained(x0, *rest):
        def body(_, x):
            y = fn(x, *rest)
            # keep shapes closed: fold output back into the input
            return x + 1e-6 * y.astype(x.dtype) if y.shape == x.shape \
                else x + 1e-6 * jnp.mean(y).astype(x.dtype)

        return jnp.mean(jax.lax.fori_loop(0, iters, body, x0))

    _sync(chained(*args))
    t0 = time.perf_counter()
    _sync(chained(*args))
    per = (time.perf_counter() - t0) / iters
    return per


def main():
    jax.config.update("jax_compilation_cache_dir",
                      str(Path.home() / ".cache" / "njf_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from neural_jacobian_field_tpu.ops.pallas.conv3x3 import (
        conv3x3_fwd_pallas, conv3x3_wgrad_pallas)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.05, jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.bfloat16)

    def xla_fwd(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def xla_dgrad(g, w):
        # dx = conv(g, flip(w)^T): same structure as fwd for stride 1
        wt = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
        return xla_fwd(g, wt)

    def xla_wgrad(x, g):
        # vjp through a bf16 conv (what the train step's bwd actually runs;
        # preferred_element_type f32 would force an f32 transpose-conv that
        # lax rejects on dtype mismatch with the bf16 primal)
        def f(w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        _, vjp = jax.vjp(f, jnp.zeros((3, 3, C, C), jnp.bfloat16))
        return vjp(g)[0]

    def pallas_dgrad(g, w):
        wt = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
        return conv3x3_fwd_pallas(g, wt)

    runs = [
        ("fwd", "xla", partial(bench, xla_fwd), (x, w)),
        ("fwd", "pallas", partial(bench, conv3x3_fwd_pallas), (x, w)),
        ("dgrad", "xla", partial(bench, xla_dgrad), (g, w)),
        ("dgrad", "pallas", partial(bench, pallas_dgrad), (g, w)),
        ("wgrad", "xla", partial(bench, xla_wgrad), (x, g)),
        ("wgrad", "pallas", partial(bench, conv3x3_wgrad_pallas), (x, g)),
    ]
    for op, impl, fn, args in runs:
        try:
            per = fn(*args)
            print(json.dumps({"op": op, "impl": impl,
                              "ms": round(per * 1e3, 3),
                              "tflops": round(FLOPS / per / 1e12, 1)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"op": op, "impl": impl,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
