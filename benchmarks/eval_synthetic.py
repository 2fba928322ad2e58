"""Quality evaluation on a synthetic scene: PSNR (perception) + flow EPE
(action) against the analytic ground truth — the parity-metric harness
(BASELINE.md: PSNR + Jacobian-error parity).

Usage:
  python benchmarks/eval_synthetic.py --scene /tmp/njf_cli_scene \
      --ckpt /tmp/njf_cli_ckpt_action [--cpu]

Renders every (camera, frame) view with the trained model and compares
rgb/depth to the stored images and predicted optical flow (J(x)·a composited
and projected) to the stored RAFT-style flow files.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def evaluate_scene(model, variables, ds, num_views=6, patch_size=4096,
                   action_dim=3, seed=0):
    """PSNR / flow-EPE / Jacobian-rel-err of a trained model over `num_views`
    random full renders of the synthetic scene. Returns a metrics dict.
    Shared by the CLI below and benchmarks/epipolar_study.py."""
    from neural_jacobian_field_tpu.data import conventions as cv
    from neural_jacobian_field_tpu.inference import render_camera
    from neural_jacobian_field_tpu.models.model import CameraInput, RobotInput
    from neural_jacobian_field_tpu.utils import flow_epe, psnr

    item0 = ds[0]
    h, w = item0["trgt_rgb"].shape[:2]

    def build_camera(item):
        return CameraInput(
            input_image=jnp.asarray(item["ctxt_rgb"])[None],
            ctxt_extrinsics=jnp.asarray(item["ctxt_extrinsics"])[None],
            ctxt_intrinsics=jnp.asarray(item["ctxt_intrinsics"])[None],
            trgt_extrinsics=jnp.asarray(item["trgt_extrinsics"])[None],
            trgt_intrinsics=jnp.asarray(
                cv.denormalize_intrinsics(item["trgt_intrinsics"], h, w))[None],
        )

    psnrs, epes, j_errs = [], [], []
    rng = np.random.default_rng(seed)
    for _ in range(num_views):
        idx = int(rng.integers(0, ds.num_files))
        item = ds[idx]
        cam = build_camera(item)
        robot = RobotInput(robot_action=jnp.asarray(item["robot_action"])[None])
        out = render_camera(model, variables, cam, robot, z_near=ds.near,
                            z_far=ds.far, height=h, width=w,
                            patch_size=patch_size)
        psnrs.append(float(psnr(out.rgb[0], jnp.asarray(item["trgt_rgb"]))))
        if "flow" in item:
            epes.append(float(flow_epe(out.flow_raw[0], jnp.asarray(item["flow"]))))

        # Jacobian parity: the synthetic robot's world-space Jacobian is known
        # in closed form on the sphere (data/synthetic.py; see comments below)
        from neural_jacobian_field_tpu.data.synthetic import QPOS_GAIN

        acc = np.asarray(out.weights[0]).sum(-1)  # [H, W] accumulation
        j_map = np.asarray(out.action_features[0]).reshape(h, w, action_dim, 3)
        span = (ds.qpos_maximum - ds.qpos_minimum)[:action_dim]
        scale = ds.outputs.dataparser_scale
        # world frame is rotated per item (pose auto-orient + relative
        # extrinsics) -> compare rotation-invariant per-joint column NORMS:
        # |J_d| = QPOS_GAIN * span_d * dataparser_scale on the robot.
        j_true_norm = QPOS_GAIN * span[:3] * scale
        if "flow" in item:
            mask = (np.linalg.norm(item["flow"], axis=-1) > 1e-6) & (acc > 0.5)
        else:
            mask = acc > 0.5
        if mask.sum() > 0:
            pred_norm = np.linalg.norm(j_map[mask][:, :3], axis=-1)  # [N, 3]
            j_errs.append(float(np.abs(pred_norm - j_true_norm).mean()
                                / (np.abs(j_true_norm).mean() + 1e-9)))
    metrics = {"psnr": round(float(np.mean(psnrs)), 2)}
    if epes:
        metrics["flow_epe"] = round(float(np.mean(epes)), 3)
    if j_errs:
        metrics["jacobian_rel_err"] = round(float(np.mean(j_errs)), 3)
    return metrics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--action-dim", type=int, default=3)
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--num-views", type=int, default=6)
    ap.add_argument("--norm", default="batch", choices=["batch", "group"],
                    help="MUST match the trained encoder (the production "
                         "configs use batch; a mismatched norm applies the "
                         "checkpoint's scale/bias under the wrong statistic)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/njf_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from neural_jacobian_field_tpu.data import DatasetCfgCommon, get_dataset
    from neural_jacobian_field_tpu.models.encoder_resnet import EncoderResnetCfg
    from neural_jacobian_field_tpu.models.model import (
        Model, RenderingCfg, make_model_cfg,
    )
    from neural_jacobian_field_tpu.training.checkpoint import load_params_only

    ds = get_dataset(DatasetCfgCommon(
        name="allegro", mode="action", root=args.scene,
        num_total_joints=args.action_dim, max_num_frames_per_traj=10**9), "train")
    # the fwd/bwd action-type selection needs the REAL per-traj frame count
    # (dataset.py random_select_action_type steps past the last frame
    # otherwise); derive it from the scene's filenames
    from neural_jacobian_field_tpu.data import conventions as cv

    ds.cfg.max_num_frames_per_traj = 1 + max(
        cv.get_traj_and_frame_idx(f)[1] for f in ds.outputs.image_filenames)

    model = Model(cfg=make_model_cfg(
        "jacobian_mlp", action_dim=args.action_dim,
        rendering=RenderingCfg(num_proposal_samples=(args.samples,),
                               num_nerf_samples=args.samples),
        encoder=EncoderResnetCfg(norm_type=args.norm),
    ), compute_dtype=jnp.bfloat16)

    # init template params via one tiny init, then restore the checkpoint
    from neural_jacobian_field_tpu.training import RawBatch, TrainCfg, create_train_state
    item0 = ds[0]
    raw = RawBatch(
        ctxt_rgb=jnp.asarray(item0["ctxt_rgb"])[None],
        ctxt_extrinsics=jnp.asarray(item0["ctxt_extrinsics"])[None],
        ctxt_intrinsics=jnp.asarray(item0["ctxt_intrinsics"])[None],
        robot_action=jnp.asarray(item0["robot_action"])[None],
        trgt_rgb=jnp.asarray(item0["trgt_rgb"])[None],
        trgt_depth=jnp.asarray(item0["trgt_depth"])[None],
        trgt_extrinsics=jnp.asarray(item0["trgt_extrinsics"])[None],
        trgt_intrinsics=jnp.asarray(item0["trgt_intrinsics"])[None],
        near=jnp.asarray([ds.near]), far=jnp.asarray([ds.far]))
    state = create_train_state(jax.random.PRNGKey(0), model, raw,
                               TrainCfg(mode="perception", rays_per_batch=8))
    params = load_params_only(args.ckpt, state.params)
    variables = {"params": params}
    if state.batch_stats is not None:
        # BatchNorm eval mode reads the RUNNING stats — rendering with fresh
        # (zero-mean/unit-var) stats silently costs ~15 dB of PSNR
        from neural_jacobian_field_tpu.training.checkpoint import (
            load_batch_stats,
        )

        variables["batch_stats"] = load_batch_stats(args.ckpt,
                                                    state.batch_stats)

    metrics = evaluate_scene(model, variables, ds, num_views=args.num_views,
                             action_dim=args.action_dim)
    units = {"psnr": f"dB over {args.num_views} full renders",
             "flow_epe": "px end-point error vs analytic flow",
             "jacobian_rel_err": "mean |J_pred - J_true| / mean|J_true| on robot pixels"}
    for k, v in metrics.items():
        print(json.dumps({"metric": k, "value": v, "unit": units[k]}))


if __name__ == "__main__":
    main()
