"""Benchmark harness — the `benchmarks/` directory the reference never had
(SURVEY.md §6/§7). Metrics per BASELINE.md:

  train_rays_per_sec      full perception train step (bench.py's metric)
  render_rays_per_sec     whole-image inference (patch_render path)
  field_queries_per_sec   inverse-dynamics fast path: infer_optical_flow
                          evaluations/sec off a cached encoding
  inverse_dynamics_ms     100-iteration jitted Adam solve wall time

All timings use the marginal-cost method ((t_2k - t_k)/k with chained varying
inputs) so fixed dispatch/tunnel overhead cancels. Prints one JSON line per
metric. Run: python benchmarks/harness.py [--metric all]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp


def real_sync(x):
    """Force actual completion by pulling data. On some remote-TPU transports
    block_until_ready resolves before compute completes — device_get is the
    only reliable sync."""
    import numpy as np

    return np.asarray(jax.device_get(x)).ravel()[:1]


def marginal_time(run, k=10):
    """run(n, seed) executes n chained iterations ending in a real_sync;
    returns seconds/iteration."""
    run(2, 0)  # warmup/compile
    return run(k, 100) / k


def _setup(samples=(256, 256), rays=256, batch=7, hw=(480, 640), action_dim=8):
    from neural_jacobian_field_tpu.models.encoder_resnet import EncoderResnetCfg
    from neural_jacobian_field_tpu.models.model import (
        Model, RenderingCfg, make_model_cfg,
    )
    from neural_jacobian_field_tpu.training import (
        RawBatch, TrainCfg, create_train_state, prepare_training_batch,
    )

    key = jax.random.PRNGKey(0)
    c2w = jnp.broadcast_to(jnp.eye(4), (batch, 4, 4))
    intr = jnp.broadcast_to(
        jnp.array([[1.2, 0, 0.5], [0, 1.6, 0.5], [0, 0, 1.0]]), (batch, 3, 3))
    raw = RawBatch(
        ctxt_rgb=jax.random.uniform(key, (batch, *hw, 3)),
        ctxt_extrinsics=c2w, ctxt_intrinsics=intr,
        robot_action=jnp.zeros((batch, action_dim)),
        trgt_rgb=jax.random.uniform(key, (batch, *hw, 3)),
        trgt_depth=jax.random.uniform(key, (batch, *hw, 1), minval=1.0, maxval=4.0),
        trgt_extrinsics=c2w, trgt_intrinsics=intr,
        near=jnp.full((batch,), 0.5), far=jnp.full((batch,), 10.0))
    model = Model(cfg=make_model_cfg(
        "jacobian_mlp", action_dim=action_dim,
        rendering=RenderingCfg(num_proposal_samples=(samples[0],),
                               num_nerf_samples=samples[1]),
        encoder=EncoderResnetCfg(norm_type="group")), compute_dtype=jnp.bfloat16)
    cfg = TrainCfg(mode="perception", rays_per_batch=rays)
    state = create_train_state(key, model, raw, cfg)
    mi, mt = prepare_training_batch(jax.random.PRNGKey(1), raw, rays)
    return model, state, raw, cfg, mi


def bench_train(emit):
    from neural_jacobian_field_tpu.training import make_train_step

    model, state, raw, cfg, _ = _setup()
    step = make_train_step(model, cfg, donate=True)

    def run(n, seed):
        nonlocal state
        t0 = time.perf_counter()
        m = None
        for i in range(n):
            state, m = step(state, raw, jax.random.PRNGKey(seed + i))
        real_sync(m["loss/total"])
        return time.perf_counter() - t0

    per = marginal_time(run)
    emit("train_rays_per_sec", 7 * 256 / per, "rays/s (fwd+bwd bf16)")


def bench_render(emit):
    # reference inference shape: batch 1, 2048-ray patches (model.py:533)
    model, state, raw, cfg, mi = _setup(samples=(96, 96), batch=1)
    variables = {"params": state.params}
    h, w = 240, 320

    from neural_jacobian_field_tpu.inference import render_camera_host_loop

    def run(n, seed):
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            # host-loop mode: small per-patch programs (remote compile
            # services reject the monolithic lax.map program)
            out = render_camera_host_loop(model, variables, mi.camera_input,
                                          mi.robot_input, z_near=0.5,
                                          z_far=10.0, height=h, width=w,
                                          patch_size=2048,
                                          key=jax.random.PRNGKey(seed + i))
        real_sync(out.rgb)
        return time.perf_counter() - t0

    per = marginal_time(run, k=3)
    emit("render_rays_per_sec", h * w / per,
         f"rays/s (whole-image {h}x{w}, 192 samples, batch 1)")


def bench_field_queries(emit):
    from neural_jacobian_field_tpu.models.model import Model, RobotInput, StepCtx

    model, state, raw, cfg, mi = _setup(samples=(64, 64), rays=4096, batch=1)
    variables = {"params": state.params}
    ctx = StepCtx(key=jax.random.PRNGKey(0), anneal=jnp.asarray(1.0),
                  updated=jnp.asarray(True))
    enc = model.apply(variables, mi.camera_input, mi.rendering_input,
                      mi.robot_input, ctx, method=Model.encode_image)

    @jax.jit
    def infer(action):
        return model.apply(variables, enc, mi.camera_input,
                           RobotInput(robot_action=action),
                           method=Model.infer_optical_flow)

    def run(n, seed):
        # chain each query on the previous output so calls serialize on
        # device (otherwise dispatch pipelining hides the compute entirely)
        a = jnp.full((1, 8), 0.01 * seed)
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = infer(a)
            a = jnp.full((1, 8), 0.01) + 1e-6 * jnp.mean(out) * jnp.ones((1, 8))
        real_sync(out)
        return time.perf_counter() - t0

    per = marginal_time(run, k=50)
    # queries = ray-sample points whose cached Jacobian is contracted
    emit("field_queries_per_sec", 4096 * 64 / per,
         "cached J-contractions/s (4096 rays x 64 samples)")


def bench_inverse_dynamics(emit):
    from neural_jacobian_field_tpu.inference import optimize_actions
    from neural_jacobian_field_tpu.models.model import Model, StepCtx

    model, state, raw, cfg, mi = _setup(samples=(64, 64), rays=512, batch=1)
    variables = {"params": state.params}
    ctx = StepCtx(key=jax.random.PRNGKey(0), anneal=jnp.asarray(1.0),
                  updated=jnp.asarray(True))
    enc = model.apply(variables, mi.camera_input, mi.rendering_input,
                      mi.robot_input, ctx, method=Model.encode_image)
    target = jax.random.normal(jax.random.PRNGKey(3), (1, 512, 2))

    def run(n, seed):
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = optimize_actions(model, variables, enc, mi.camera_input,
                                   target, key=jax.random.PRNGKey(seed + i),
                                   num_iters=100)
        real_sync(out.action)
        return time.perf_counter() - t0

    per = marginal_time(run, k=5)
    emit("inverse_dynamics_ms", per * 1000,
         "ms per 100-iter Adam solve (512 rays, cached field)")


BENCHES = {
    "train": bench_train,
    "render": bench_render,
    "field_queries": bench_field_queries,
    "inverse_dynamics": bench_inverse_dynamics,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--metric", default="all", choices=["all", *BENCHES])
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir",
                      str(Path.home() / ".cache" / "njf_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    def emit(metric, value, unit):
        print(json.dumps({"metric": metric, "value": round(float(value), 2),
                          "unit": unit}), flush=True)

    for name, fn in BENCHES.items():
        if args.metric in ("all", name):
            fn(emit)


if __name__ == "__main__":
    main()
