"""Closed-loop 3D control through a trained Jacobian field.

The headline capability (reference notebooks real_world/2 + tutorial 3,
lifted to 3D): observe the robot with ONE camera, encode the scene once per
step (`Model.encode_image` caches density + Jacobian), compute the desired
pixel motion toward a target, solve the action by least squares, apply it to
the (here: synthetic, analytic) robot, repeat.

Requires a trained action-stage checkpoint on the synthetic scene, e.g.:
  python -m neural_jacobian_field_tpu.train dataset.root=<scene> ...    # stage 1
  python -m neural_jacobian_field_tpu.train dataset.mode=action ...     # stage 2
  python examples/real_world_3_closed_loop_3d.py --scene <scene> --ckpt <ckpt>
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="/tmp/njf_cli_scene")
    ap.add_argument("--ckpt", default="/tmp/njf_ckpt_long_action")
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--gain", type=float, default=0.8)
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/tmp/njf_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from neural_jacobian_field_tpu.data import DatasetCfgCommon, get_dataset
    from neural_jacobian_field_tpu.data import conventions as cv
    from neural_jacobian_field_tpu.data.synthetic import _project, _render_sphere, sphere_center
    from neural_jacobian_field_tpu.inference import solve_actions_least_squares
    from neural_jacobian_field_tpu.models.encoder_resnet import EncoderResnetCfg
    from neural_jacobian_field_tpu.models.model import (
        CameraInput, Model, RenderingCfg, RenderingInput, RobotInput, StepCtx,
        make_model_cfg,
    )
    from neural_jacobian_field_tpu.rendering.geometry import get_pixel_coordinates, get_world_rays
    from neural_jacobian_field_tpu.training import RawBatch, TrainCfg, create_train_state
    from neural_jacobian_field_tpu.training.checkpoint import load_params_only

    # dataset gives us the calibrated camera in the model's (oriented, scaled,
    # ctxt-relative) world frame; the "robot" is the analytic sphere
    ds = get_dataset(DatasetCfgCommon(
        name="allegro", mode="perception", root=args.scene, num_total_joints=3), "train")
    cam_idx = 0
    c2w_model = np.eye(4, dtype=np.float32)  # ctxt frame == identity
    intr_norm, (h, w) = ds.load_intrinsics(cam_idx)

    # the raw (unoriented) camera used to SYNTHESIZE observations
    import json
    with open(Path(args.scene) / "transforms.json") as f:
        meta = json.load(f)
    cam = meta["cameras"][cam_idx]
    c2w_gl = np.asarray(cam["transform_matrix"], np.float32)
    fx, fy, cx, cy = cam["fl_x"], cam["fl_y"], cam["cx"], cam["cy"]

    model = Model(cfg=make_model_cfg(
        "jacobian_mlp", action_dim=3,
        rendering=RenderingCfg(num_proposal_samples=(args.samples,),
                               num_nerf_samples=args.samples),
        encoder=EncoderResnetCfg(norm_type="group"),
    ), compute_dtype=jnp.bfloat16)

    # template params + restore
    item0 = ds[0]
    raw = RawBatch(
        ctxt_rgb=jnp.asarray(item0["ctxt_rgb"])[None],
        ctxt_extrinsics=jnp.asarray(item0["ctxt_extrinsics"])[None],
        ctxt_intrinsics=jnp.asarray(item0["ctxt_intrinsics"])[None],
        robot_action=jnp.zeros((1, 3)),
        trgt_rgb=jnp.asarray(item0["trgt_rgb"])[None],
        trgt_depth=jnp.asarray(item0["trgt_depth"])[None],
        trgt_extrinsics=jnp.asarray(item0["trgt_extrinsics"])[None],
        trgt_intrinsics=jnp.asarray(item0["trgt_intrinsics"])[None],
        near=jnp.asarray([ds.near]), far=jnp.asarray([ds.far]))
    state = create_train_state(jax.random.PRNGKey(0), model, raw,
                               TrainCfg(mode="perception", rays_per_batch=8))
    variables = {"params": load_params_only(args.ckpt, state.params)}
    if state.batch_stats is not None:  # batch-norm encoders: running stats
        from neural_jacobian_field_tpu.training.checkpoint import load_batch_stats

        variables["batch_stats"] = load_batch_stats(args.ckpt, state.batch_stats)

    span = ds.qpos_maximum - ds.qpos_minimum

    q = np.array([-0.6, 0.5, -0.3])
    q_target = np.array([0.55, -0.45, 0.4])
    ctx = StepCtx(key=jax.random.PRNGKey(0), anneal=jnp.asarray(1.0),
                  updated=jnp.asarray(True))
    coords_all, _ = get_pixel_coordinates(h, w)

    print(f"target qpos: {q_target.round(3)}")
    for it in range(args.iters):
        rgb, _, _, hit = _render_sphere(c2w_gl, fx, fy, cx, cy, h, w,
                                        sphere_center(q))
        # track pixels on the robot
        ys, xs = np.nonzero(hit)
        sel = np.random.default_rng(it).permutation(len(ys))[:64]
        ys, xs = ys[sel], xs[sel]

        # desired pixel motion: where each tracked surface point would land if
        # the sphere were at the target (rigid translation)
        pts = _render_sphere(c2w_gl, fx, fy, cx, cy, h, w, sphere_center(q))[2]
        p_now = pts[ys, xs]
        delta = sphere_center(q_target) - sphere_center(q)
        uv_now = _project(p_now, c2w_gl, fx, fy, cx, cy)
        uv_want = _project(p_now + delta, c2w_gl, fx, fy, cx, cy)
        desired = (uv_want - uv_now).astype(np.float32)

        # rays through the tracked pixels (normalized camera, ctxt frame)
        coords = jnp.asarray(coords_all[ys, xs])[None]
        origins, directions = get_world_rays(
            coords, jnp.asarray(intr_norm)[None], jnp.asarray(c2w_model)[None])
        camera_input = CameraInput(
            input_image=jnp.asarray(rgb)[None],
            ctxt_extrinsics=jnp.asarray(c2w_model)[None],
            ctxt_intrinsics=jnp.asarray(intr_norm)[None],
            trgt_extrinsics=jnp.asarray(c2w_model)[None],
            trgt_intrinsics=jnp.asarray(
                cv.denormalize_intrinsics(intr_norm, h, w))[None],
        )
        ri = RenderingInput(origins=origins, directions=directions,
                            z_near=jnp.asarray([ds.near]), z_far=jnp.asarray([ds.far]))
        enc = model.apply(variables, camera_input, ri,
                          RobotInput(robot_action=jnp.zeros((1, 3))), ctx,
                          method=Model.encode_image)
        a = solve_actions_least_squares(
            model, variables, enc, camera_input, jnp.asarray(desired)[None],
            damping=1e-3)
        # normalized action -> raw joint delta (dq = a * span)
        dq = np.asarray(a[0]) * span * args.gain
        q = np.clip(q + dq, -1.0, 1.0)
        err = np.abs(q - q_target).max()
        print(f"iter {it:2d}: action={np.asarray(a[0]).round(3)}  "
              f"qpos={q.round(3)}  max err={err:.3f}")
        if err < 0.05:
            print("reached target configuration")
            break


if __name__ == "__main__":
    main()
