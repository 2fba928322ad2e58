"""Reference-scale epipolar quality study (VERDICT r2 item 2).

Trains the flagship model on a 480x640 synthetic scene with genuine
inter-camera baseline (cameras on a circle of radius 2.2 around the robot —
data/synthetic.py) and compares `pixel_feature_mode="exact"` (per-sample
bilinear gathers, reference parity: model_components/pixel_aligned_features
.py:11-35) against "epipolar" (K1b per-ray knot textures, ops/epipolar.py)
at several knot budgets, with identical data and RNG keys.

Reported per run: stage-1 PSNR over full renders, stage-2 flow EPE and
Jacobian rel-err vs the scene's closed-form ground truth
(benchmarks/eval_synthetic.evaluate_scene).

TPU-feed design: the axon tunnel uploads at ~120 MB/s, so host-fed 480x640
batches (~100 MB/step) would be 10x the step time. The whole dataset is
uploaded ONCE (rgb uint8 + depth + flow, <1 GB) and each step gathers its
batch ON DEVICE from host-sampled indices (bytes/step over the tunnel).
Index sampling mirrors DatasetCommon.__getitem__ (data/dataset.py:202-285):
random context file, random target camera at the SAME (traj, frame),
relative extrinsics with the context frame as identity, displacement-1
fwd/bwd flow + normalized delta-qpos actions in action mode.

Usage:
  python benchmarks/epipolar_study.py --mode epipolar --knots 64,16,8 \
      --s1-steps 10000 --s2-steps 6000 [--smoke]
"""

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def build_device_dataset(ds):
    """Load every view's rgb/depth/fwd/bwd-flow once; return (host tables,
    device arrays). Arrays are keyed by the dataset's file index."""
    from neural_jacobian_field_tpu.data import conventions as cv
    from neural_jacobian_field_tpu.data.dataset import (
        load_depth, load_image, load_optical_flow,
    )

    n = ds.num_files
    h = int(ds.outputs.heights[0])
    w = int(ds.outputs.widths[0])
    rgb = np.zeros((n, h, w, 3), np.uint8)
    depth = np.zeros((n, h, w, 1), np.float32)
    flow = np.zeros((n, 2, h, w, 2), np.float32)  # slot 0 = fwd, 1 = bwd
    flow_ok = np.zeros((n, 2), bool)
    traj_frame = np.zeros((n, 2), np.int32)
    # (cam, traj, frame) -> file idx, for target-view lookup
    view_index = {}
    depth_scale = ds.outputs.depth_unit_scale_factor * ds.outputs.dataparser_scale

    for i in range(n):
        fname = ds.outputs.image_filenames[i]
        cam = int(ds.outputs.sample_to_camera_idx[i])
        traj, frame = cv.get_traj_and_frame_idx(fname)
        traj_frame[i] = (traj, frame)
        view_index[(cam, traj, frame)] = i
        rgb[i] = (load_image(fname, 1.0, (h, w)) * 255).astype(np.uint8)
        depth[i] = load_depth(str(fname).replace("rgb", "depth"), depth_scale, (h, w))
        for slot, ftype in enumerate(("fwd", "bwd")):
            ffile = cv.get_optical_flow_filename(fname, traj, frame, ftype)
            if Path(ffile).exists():
                flow[i, slot] = load_optical_flow(ffile)
                flow_ok[i, slot] = True

    dev = {
        "rgb": jax.device_put(rgb),
        "depth": jax.device_put(depth),
        "flow": jax.device_put(flow),
    }
    host = {"traj_frame": traj_frame, "view_index": view_index,
            "flow_ok": flow_ok, "hw": (h, w)}
    return host, dev


def make_sampler(ds, host, batch, mode, rng):
    """Host-side index sampling mirroring DatasetCommon.__getitem__; returns
    a callable () -> selection dict of small arrays."""
    n = ds.num_files
    n_cams = len(ds.outputs.cam2worlds)
    cam_extr = [ds.load_extrinsics(c) for c in range(n_cams)]
    cam_intr = [ds.load_intrinsics(c)[0] for c in range(n_cams)]
    action_dim = ds.action_dim

    def sample():
        ctxt_idx = np.zeros(batch, np.int32)
        trgt_idx = np.zeros(batch, np.int32)
        flow_slot = np.zeros(batch, np.int32)
        ctxt_e = np.zeros((batch, 4, 4), np.float32)
        trgt_e = np.zeros((batch, 4, 4), np.float32)
        ctxt_i = np.zeros((batch, 3, 3), np.float32)
        trgt_i = np.zeros((batch, 3, 3), np.float32)
        action = np.zeros((batch, action_dim), np.float32)
        for b in range(batch):
            i = int(rng.integers(0, n))
            cam_c = int(ds.outputs.sample_to_camera_idx[i])
            traj, frame = host["traj_frame"][i]
            cam_t = int(rng.integers(0, n_cams))
            j = host["view_index"][(cam_t, int(traj), int(frame))]
            # relative extrinsics: context frame = identity (dataset.py:363-365)
            inv_c = np.linalg.inv(cam_extr[cam_c])
            ctxt_idx[b], trgt_idx[b] = i, j
            ctxt_e[b] = np.eye(4, dtype=np.float32)
            trgt_e[b] = (inv_c @ cam_extr[cam_t]).astype(np.float32)
            ctxt_i[b], trgt_i[b] = cam_intr[cam_c], cam_intr[cam_t]
            if mode == "action":
                slots = [s for s in (0, 1) if host["flow_ok"][j, s]]
                slot = int(slots[int(rng.integers(0, len(slots)))])
                flow_slot[b] = slot
                nxt = int(frame) + (1 if slot == 0 else -1)
                action[b] = ds.load_robot_action(int(traj), int(frame), nxt)
        return {
            "ctxt_idx": jnp.asarray(ctxt_idx), "trgt_idx": jnp.asarray(trgt_idx),
            "flow_slot": jnp.asarray(flow_slot),
            "ctxt_extrinsics": jnp.asarray(ctxt_e),
            "trgt_extrinsics": jnp.asarray(trgt_e),
            "ctxt_intrinsics": jnp.asarray(ctxt_i),
            "trgt_intrinsics": jnp.asarray(trgt_i),
            "robot_action": jnp.asarray(action),
        }

    return sample


def make_fused_step(model, cfg, ds, mode):
    """One jitted program: on-device batch gather + the normal train step."""
    from neural_jacobian_field_tpu.training import RawBatch, make_train_step

    inner = make_train_step(model, cfg, donate=False)
    near, far = float(ds.near), float(ds.far)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fused(state, dev, sel, key):
        b = sel["ctxt_idx"].shape[0]
        raw = RawBatch(
            ctxt_rgb=dev["rgb"][sel["ctxt_idx"]].astype(jnp.float32) / 255.0,
            ctxt_extrinsics=sel["ctxt_extrinsics"],
            ctxt_intrinsics=sel["ctxt_intrinsics"],
            robot_action=sel["robot_action"],
            trgt_rgb=dev["rgb"][sel["trgt_idx"]].astype(jnp.float32) / 255.0,
            trgt_depth=dev["depth"][sel["trgt_idx"]],
            trgt_extrinsics=sel["trgt_extrinsics"],
            trgt_intrinsics=sel["trgt_intrinsics"],
            near=jnp.full((b,), near), far=jnp.full((b,), far),
            flow=(dev["flow"][sel["trgt_idx"], sel["flow_slot"]]
                  if mode == "action" else None),
        )
        return inner(state, raw, key)

    return fused


def run_training(model, ds, host, dev, mode, steps, batch, seed,
                 init_params=None, init_batch_stats=None, log_every=500,
                 rays=256, grad_clip=None, enc_lr_scale=1.0):
    from neural_jacobian_field_tpu.training import (
        RawBatch, TrainCfg, create_train_state,
    )

    rng = np.random.default_rng(seed)
    sampler = make_sampler(ds, host, batch, mode, rng)
    cfg = TrainCfg(mode=mode, rays_per_batch=rays,
                   lr=1e-4 if mode == "action" else 5e-4,
                   warm_up_steps=max(1, min(1000, steps // 4)),
                   grad_clip_norm=grad_clip,
                   encoder_lr_scale=enc_lr_scale if mode == "perception" else 1.0)
    sel0 = sampler()
    h, w = host["hw"]
    raw0 = RawBatch(
        ctxt_rgb=jnp.zeros((batch, h, w, 3)), ctxt_extrinsics=sel0["ctxt_extrinsics"],
        ctxt_intrinsics=sel0["ctxt_intrinsics"], robot_action=sel0["robot_action"],
        trgt_rgb=jnp.zeros((batch, h, w, 3)), trgt_depth=jnp.ones((batch, h, w, 1)),
        trgt_extrinsics=sel0["trgt_extrinsics"], trgt_intrinsics=sel0["trgt_intrinsics"],
        near=jnp.full((batch,), float(ds.near)), far=jnp.full((batch,), float(ds.far)),
        flow=jnp.zeros((batch, h, w, 2)) if mode == "action" else None,
    )
    state = create_train_state(jax.random.PRNGKey(seed), model, raw0, cfg,
                               init_params=init_params,
                               init_batch_stats=init_batch_stats)
    step = make_fused_step(model, cfg, ds, mode)
    t0, loss = time.time(), float("nan")
    for i in range(steps):
        state, metrics = step(state, dev, sampler(), jax.random.PRNGKey(seed * 100003 + i))
        if i % log_every == 0 or i == steps - 1:
            loss = float(metrics["loss/total"])  # real sync
            print(f"  [{mode}] step {i}/{steps} loss {loss:.5f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    return state, loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="/tmp/njf_epi_scene")
    ap.add_argument("--mode", default="epipolar", choices=["exact", "epipolar"])
    ap.add_argument("--knots", default="64,16,8")
    ap.add_argument("--s1-steps", type=int, default=10000)
    ap.add_argument("--s2-steps", type=int, default=6000)
    ap.add_argument("--batch", type=int, default=7)
    ap.add_argument("--samples", type=int, default=256)
    ap.add_argument("--rays", type=int, default=256,
                    help="rays per image per step; the exact-mode "
                    "gradient-variance causal test doubles this (the "
                    "reference's DDP training has a 4-8x larger effective "
                    "ray batch than one chip)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="/tmp/njf_epi_study.jsonl")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes on CPU (CI smoke)")
    ap.add_argument("--hw", default=None,
                    help="scene resolution HxW (default 480x640); the "
                    "mid-scale bisect of the exact-mode anomaly uses 240x320")
    ap.add_argument("--eval-snapshot", default=None,
                    help="skip training; evaluate this params pickle")
    ap.add_argument("--s2-from", default=None,
                    help="skip stage 1; warm-start stage 2 from this params "
                    "pickle (cross-stage anomaly isolation, VERDICT r3 #1)")
    ap.add_argument("--snapshot-s1", action="store_true",
                    help="also pickle the stage-1 state (for --s2-from)")
    ap.add_argument("--tag", default=None,
                    help="override the snapshot filename tag")
    ap.add_argument("--grad-clip", type=float, default=None,
                    help="exact-mode stabilizer: optax global-norm grad clip "
                    "(both stages)")
    ap.add_argument("--enc-lr-scale", type=float, default=1.0,
                    help="exact-mode stabilizer: stage-1 lr multiplier on "
                    "encoder params")
    args = ap.parse_args()
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      str(Path.home() / ".cache" / "njf_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from neural_jacobian_field_tpu.data import DatasetCfgCommon, get_dataset
    from neural_jacobian_field_tpu.data.synthetic import make_synthetic_scene
    from neural_jacobian_field_tpu.models.encoder_resnet import EncoderResnetCfg
    from neural_jacobian_field_tpu.models.model import (
        Model, RenderingCfg, make_model_cfg,
    )
    from eval_synthetic import evaluate_scene

    if args.smoke:
        hw, cams, trajs, frames = (48, 64), 3, 2, 3
        args.s1_steps, args.s2_steps, args.batch, args.samples = 4, 2, 2, 8
    else:
        # reference scale: 480x640 (README.md:142-152), real multi-camera
        # parallax (4 cameras, 2.2-unit baseline circle)
        hw, cams, trajs, frames = (480, 640), 4, 4, 6
        if args.hw:
            hw = tuple(int(x) for x in args.hw.lower().split("x"))

    scene = Path(args.scene)
    if not (scene / "transforms.json").exists():
        print(f"generating {hw} scene -> {scene}", flush=True)
        make_synthetic_scene(scene, num_cameras=cams, num_trajs=trajs,
                             frames_per_traj=frames, height=hw[0], width=hw[1],
                             action_dim=3, seed=1)

    # max_num_frames_per_traj must be the REAL per-traj frame count: the
    # dataset's fwd/bwd action-type selection uses it to avoid stepping past
    # the last frame (dataset.py random_select_action_type)
    ds = get_dataset(DatasetCfgCommon(
        name="allegro", mode="action", root=scene, num_total_joints=3,
        max_num_frames_per_traj=frames), "train")
    host, dev = build_device_dataset(ds)
    print(f"device dataset: {ds.num_files} views at {host['hw']}", flush=True)

    knots = tuple(int(x) for x in args.knots.split(","))
    model = Model(cfg=make_model_cfg(
        "jacobian_mlp", action_dim=3,
        rendering=RenderingCfg(
            num_proposal_samples=(args.samples,), num_nerf_samples=args.samples,
            use_pallas_pdf=True, use_fused_trunk=True,
            pixel_feature_mode=args.mode, epipolar_knots=knots),
        encoder=EncoderResnetCfg(norm_type="batch"),
    ), compute_dtype=jnp.bfloat16)

    t0 = time.time()
    if args.eval_snapshot:
        import pickle

        with open(args.eval_snapshot, "rb") as f:
            variables = pickle.load(f)
        result = {"mode": args.mode, "knots": list(knots),
                  "eval_snapshot": args.eval_snapshot, "hw": list(host["hw"]),
                  "tag": args.tag}
        metrics = evaluate_scene(model, variables, ds,
                                 num_views=2 if args.smoke else 6,
                                 patch_size=2048 if args.smoke else 4096,
                                 action_dim=3)
        result.update(metrics)
        print(json.dumps(result), flush=True)
        with open(args.out, "a", encoding="utf-8") as f:
            f.write(json.dumps(result) + "\n")
        return

    import pickle

    tag = args.tag or (f"{args.mode}_{'-'.join(map(str, knots))}_"
                       f"{args.s1_steps}_seed{args.seed}"
                       + (f"_rays{args.rays}" if args.rays != 256 else ""))
    result = {"mode": args.mode, "knots": list(knots),
              "s1_steps": args.s1_steps, "s2_steps": args.s2_steps,
              "samples": args.samples, "hw": list(host["hw"]),
              "seed": args.seed, "rays": args.rays,
              "grad_clip": args.grad_clip, "enc_lr_scale": args.enc_lr_scale}
    if args.s2_from:
        with open(args.s2_from, "rb") as f:
            warm = pickle.load(f)
        state1 = None
        s1_params = warm["params"]
        s1_stats = warm.get("batch_stats")
        result["s2_from"] = args.s2_from
        final = None
    else:
        state1, s1_loss = run_training(model, ds, host, dev, "perception",
                                       args.s1_steps, args.batch, args.seed,
                                       rays=args.rays,
                                       grad_clip=args.grad_clip,
                                       enc_lr_scale=args.enc_lr_scale)
        result["s1_final_loss"] = round(s1_loss, 5)
        s1_params = jax.device_get(state1.params)
        s1_stats = (jax.device_get(state1.batch_stats)
                    if state1.batch_stats is not None else None)
        if args.snapshot_s1:
            s1_snap = Path(args.out).parent / f"njf_epi_s1_{tag}.pkl"
            with open(s1_snap, "wb") as f:
                pickle.dump({"params": s1_params, "batch_stats": s1_stats}, f)
            print(f"stage-1 snapshot -> {s1_snap}", flush=True)
        final = state1
    if args.s2_steps > 0:
        state2, s2_loss = run_training(
            model, ds, host, dev, "action", args.s2_steps, args.batch,
            args.seed, init_params=s1_params, init_batch_stats=s1_stats,
            rays=args.rays, grad_clip=args.grad_clip)
        result["s2_final_loss"] = round(s2_loss, 6)
        final = state2

    variables = {"params": final.params}
    if final.batch_stats is not None:
        variables["batch_stats"] = final.batch_stats
    # snapshot the trained params BEFORE eval: a crashed eval must never
    # cost the (much longer) training re-run
    snap = Path(args.out).parent / f"njf_epi_params_{tag}.pkl"
    with open(snap, "wb") as f:
        pickle.dump(jax.device_get(variables), f)
    print(f"params snapshot -> {snap}", flush=True)
    metrics = evaluate_scene(model, variables, ds,
                             num_views=2 if args.smoke else 6,
                             patch_size=2048 if args.smoke else 4096,
                             action_dim=3)
    result.update(metrics)
    result["wall_minutes"] = round((time.time() - t0) / 60, 1)
    print(json.dumps(result), flush=True)
    with open(args.out, "a", encoding="utf-8") as f:
        f.write(json.dumps(result) + "\n")


if __name__ == "__main__":
    main()
