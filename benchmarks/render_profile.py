"""One-jit whole-image renderer vs host-loop patches (VERDICT r2 item 8).

The reference renders full images by iterating 2048-ray chunks from Python
(models/model.py:527-628 equivalent). Our `render_camera` compiles the whole
480x640 image as ONE jit (ray-chunked by lax.map inside the program);
`render_camera_host_loop` keeps the Python loop. This measures both at
reference shapes on-chip, plus the ray-sharded variant's single-chip cost.

Usage: python benchmarks/render_profile.py [--samples 192] [--patch 2048]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

HW = (480, 640)
ACTION_DIM = 8


def _sync(x):
    return float(np.asarray(jax.device_get(x)).ravel()[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=96,
                    help="per-stage samples (96+96 = 192/ray as in bench.py)")
    ap.add_argument("--patch", type=int, default=2048)
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir",
                      str(Path.home() / ".cache" / "njf_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from neural_jacobian_field_tpu.inference import (
        render_camera, render_camera_host_loop,
    )
    from neural_jacobian_field_tpu.models.encoder_resnet import EncoderResnetCfg
    from neural_jacobian_field_tpu.models.model import (
        Model, RenderingCfg, make_model_cfg,
    )
    from neural_jacobian_field_tpu.training import (
        RawBatch, TrainCfg, create_train_state, prepare_training_batch,
    )

    h, w = HW
    key = jax.random.PRNGKey(0)
    model = Model(cfg=make_model_cfg(
        "jacobian_mlp", action_dim=ACTION_DIM,
        rendering=RenderingCfg(
            num_proposal_samples=(args.samples,), num_nerf_samples=args.samples,
            use_pallas_pdf=True, pixel_feature_mode="epipolar",
            use_fused_trunk=True),
        encoder=EncoderResnetCfg(norm_type="batch")),
        compute_dtype=jnp.bfloat16)

    c2w = jnp.broadcast_to(jnp.eye(4), (1, 4, 4))
    intr = jnp.broadcast_to(
        jnp.array([[1.2, 0.0, 0.5], [0.0, 1.6, 0.5], [0.0, 0.0, 1.0]]), (1, 3, 3))
    raw = RawBatch(
        ctxt_rgb=jax.random.uniform(key, (1, h, w, 3)),
        ctxt_extrinsics=c2w, ctxt_intrinsics=intr,
        robot_action=jnp.zeros((1, ACTION_DIM)),
        trgt_rgb=jax.random.uniform(key, (1, h, w, 3)),
        trgt_depth=jnp.ones((1, h, w, 1)),
        trgt_extrinsics=c2w, trgt_intrinsics=intr,
        near=jnp.full((1,), 0.5), far=jnp.full((1,), 10.0))
    state = create_train_state(key, model, raw,
                               TrainCfg(mode="perception", rays_per_batch=64))
    variables = {"params": state.params}
    if state.batch_stats is not None:  # BatchNorm encoder: eval-mode stats
        variables["batch_stats"] = state.batch_stats
    mi, _ = prepare_training_batch(jax.random.PRNGKey(1), raw, 64)

    def bench(name, fn, k=3):
        try:
            out = fn(0)
            _sync(out.rgb)
        except Exception as e:
            print(json.dumps({"metric": name, "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
            return
        t0 = time.perf_counter()
        for i in range(k):
            out = fn(1 + i)
        _sync(out.rgb)
        per = (time.perf_counter() - t0) / k
        print(json.dumps({
            "metric": name, "value": round(h * w / per, 1),
            "unit": f"rays/s (480x640, {2*args.samples} samples/ray)",
            "seconds_per_image": round(per, 3)}), flush=True)

    bench("render_host_loop_rays_per_sec",
          lambda s: render_camera_host_loop(
              model, variables, mi.camera_input, mi.robot_input, z_near=0.5,
              z_far=10.0, height=h, width=w, patch_size=args.patch,
              key=jax.random.PRNGKey(s)))
    bench("render_one_jit_rays_per_sec",
          lambda s: render_camera(
              model, variables, mi.camera_input, mi.robot_input, z_near=0.5,
              z_far=10.0, height=h, width=w, patch_size=args.patch,
              key=jax.random.PRNGKey(s)))


if __name__ == "__main__":
    main()
