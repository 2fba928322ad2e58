"""K9 in-program hang bisection (r5): the conv A/B's pallas arm blocked
>19 min inside the first warmup step on the real chip, while the suite's
kernels individually passed real-TPU parity at all five production shapes.
Bisect which composition level introduces the hang — run each phase as a
separate process under `timeout` so a hang is a clean, attributable kill:

  python benchmarks/conv_step_diag.py kernels     # standalone k9 calls, bf16
  python benchmarks/conv_step_diag.py enc-fwd     # full encoder fwd, pallas
  python benchmarks/conv_step_diag.py enc-bwd     # encoder fwd+bwd
  python benchmarks/conv_step_diag.py step        # one full train step

Each phase prints per-shape wall times (scalar-pull sync; compile and run
timed separately). All phases use the production workload: b7, 480x640,
bf16 — the exact A/B configuration (bench.py train_perception with
NJF_CONV_IMPL=pallas).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(np.asarray(jax.device_get(jnp.ravel(x)[0])))


def _timed(tag, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out if isinstance(out, jax.Array) else jax.tree.leaves(out)[0])
    t1 = time.perf_counter()
    out = fn(*args)
    _sync(out if isinstance(out, jax.Array) else jax.tree.leaves(out)[0])
    t2 = time.perf_counter()
    print(f"  {tag}: compile+run {t1 - t0:.2f}s, run {t2 - t1 :.3f}s",
          flush=True)


# the five production conv families (b7 480x640 input, post-stem)
SHAPES = [
    ((7, 120, 160, 64), 64, 1),
    ((7, 120, 160, 64), 128, 2),
    ((7, 60, 80, 128), 128, 1),
    ((7, 60, 80, 128), 256, 2),
    ((7, 30, 40, 256), 256, 1),
]


def phase_kernels():
    from neural_jacobian_field_tpu.ops.pallas import conv_suite as k9

    for shape, cout, stride in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
        w = (jax.random.normal(jax.random.PRNGKey(1),
                               (3, 3, shape[-1], cout)) * 0.05
             ).astype(jnp.bfloat16)
        fwd = jax.jit(lambda a, b, s=stride: k9.conv3x3(a, b, s))
        _timed(f"fwd  {shape} cout={cout} s={stride}", fwd, x, w)

        @jax.jit
        def fwdbwd(a, b, s=stride):
            return jax.grad(
                lambda aa, bb: jnp.sum(k9.conv3x3(aa, bb, s).astype(
                    jnp.float32) ** 2), argnums=(0, 1))(a, b)

        _timed(f"grad {shape} cout={cout} s={stride}", fwdbwd, x, w)


def _encoder(conv_impl="pallas"):
    from neural_jacobian_field_tpu.models.encoder_resnet import (
        EncoderResnet, EncoderResnetCfg)

    enc = EncoderResnet(EncoderResnetCfg(norm_type="batch",
                                         conv_impl=conv_impl),
                        compute_dtype=jnp.bfloat16)
    rgb = jax.random.uniform(jax.random.PRNGKey(0), (7, 480, 640, 3))
    variables = enc.init(jax.random.PRNGKey(1), rgb)
    return enc, variables, rgb


def phase_enc_fwd():
    enc, variables, rgb = _encoder()

    @jax.jit
    def fwd(v, r):
        out, _ = enc.apply(v, r, train=True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32))

    _timed("encoder fwd (pallas, b7 480x640 bf16)", fwd, variables, rgb)


def phase_enc_bwd():
    enc, variables, rgb = _encoder()
    params, rest = variables["params"], {k: v for k, v in variables.items()
                                         if k != "params"}

    @jax.jit
    def fwdbwd(p, r):
        def loss(pp):
            out, _ = enc.apply({"params": pp, **rest}, r, train=True,
                               mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return jax.grad(loss)(p)

    _timed("encoder fwd+bwd (pallas)", fwdbwd, params, rgb)


def phase_step():
    import os

    os.environ["NJF_CONV_IMPL"] = "pallas"
    import bench

    from neural_jacobian_field_tpu.training import (
        TrainCfg, create_train_state, make_train_step)

    key = jax.random.PRNGKey(0)
    model = bench._flagship_model()
    batch = bench._raw_batch(key)
    cfg = TrainCfg(mode="perception", rays_per_batch=bench.RAYS,
                   warm_up_steps=10000)
    state = create_train_state(key, model, batch, cfg)
    for updated in (True, False):
        fn = make_train_step(model, cfg, donate=False, static_updated=updated)
        t0 = time.perf_counter()
        _, m = fn(state, batch, jax.random.PRNGKey(10))
        _sync(m["loss/total"])
        print(f"  step static_updated={updated}: compile+run "
              f"{time.perf_counter() - t0:.2f}s", flush=True)


def main():
    jax.config.update("jax_compilation_cache_dir",
                      str(Path.home() / ".cache" / "njf_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    phase = sys.argv[1] if len(sys.argv) > 1 else "kernels"
    print(f"== phase {phase} on {jax.devices()[0].platform}", flush=True)
    {"kernels": phase_kernels, "enc-fwd": phase_enc_fwd,
     "enc-bwd": phase_enc_bwd, "step": phase_step}[phase]()
    print("PHASE-OK", flush=True)


if __name__ == "__main__":
    main()
