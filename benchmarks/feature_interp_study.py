"""Exact-vs-epipolar FEATURE unit comparison on a trained checkpoint
(VERDICT r3 item 1c).

Loads a reference-scale trained snapshot (benchmarks/epipolar_study.py
pickle), runs the encoder on a real scene context image, and compares the
pixel-aligned features the two modes deliver AT IDENTICAL SAMPLE POINTS:
per-sample bilinear gathers (ops/pixel_gather.pyramid_pixel_features,
"exact") vs per-ray knot interpolation (ops/epipolar, "epipolar"). If the
interpolation error is small while training outcomes diverge, the
difference is optimization dynamics, not features.

Usage:
  python benchmarks/feature_interp_study.py \
      --snapshot /tmp/njf_epi_params_epipolar_64-16-8_10000_seed2.pkl \
      --scene /tmp/njf_epi_scene [--knots 64,16,8] [--rays 512] [--samples 64]
"""

import argparse
import json
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snapshot", required=True)
    ap.add_argument("--scene", default="/tmp/njf_epi_scene")
    ap.add_argument("--knots", default="64,16,8")
    ap.add_argument("--rays", type=int, default=512)
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="/tmp/njf_feature_interp.jsonl")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/njf_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from neural_jacobian_field_tpu.data import DatasetCfgCommon, get_dataset
    from neural_jacobian_field_tpu.models.encoder_resnet import (
        EncoderResnet, EncoderResnetCfg)
    from neural_jacobian_field_tpu.ops.epipolar import (
        build_ray_knots, knot_features)
    from neural_jacobian_field_tpu.ops.pixel_gather import (
        pack_pyramid, pyramid_pixel_features)
    from neural_jacobian_field_tpu.rendering.geometry import (
        get_pixel_coordinates, get_world_rays_with_z, homogenize_points,
        project_z_divide, transform_world2cam)

    with open(args.snapshot, "rb") as f:
        variables = pickle.load(f)
    enc_vars = {"params": variables["params"]["encoder"]}
    if variables.get("batch_stats") is not None:
        enc_vars["batch_stats"] = variables["batch_stats"].get(
            "encoder", variables["batch_stats"])

    import random as pyrandom

    pyrandom.seed(1)
    ds = get_dataset(DatasetCfgCommon(
        name="allegro", mode="perception", root=Path(args.scene),
        num_total_joints=3, max_num_frames_per_traj=6), "train")
    # draw until the target is a DIFFERENT camera (same-camera pairs have a
    # degenerate epipolar segment where the interp is exact by construction)
    for _ in range(50):
        item = ds[pyrandom.randrange(ds.num_files)]
        if not np.allclose(item["trgt_extrinsics"], np.eye(4)):
            break
    h, w = item["ctxt_rgb"].shape[:2]

    encoder = EncoderResnet(cfg=EncoderResnetCfg(norm_type="batch"))
    pyr = encoder.apply(enc_vars, jnp.asarray(item["ctxt_rgb"])[None],
                        train=False)
    packed = pack_pyramid(jax.tree.map(lambda x: x.astype(jnp.bfloat16), pyr))

    # rays from the TARGET view (real cross-camera parallax), positions
    # stratified in [near, far] — the training geometry exactly
    coords_full, _ = get_pixel_coordinates(h, w)
    rng = np.random.default_rng(0)
    sel = rng.integers(0, h * w, size=args.rays)
    coords = jnp.asarray(coords_full.reshape(h * w, 2)[sel])[None]
    trgt_e = jnp.asarray(item["trgt_extrinsics"])[None]
    trgt_i = jnp.asarray(item["trgt_intrinsics"])[None]
    ctxt_e = jnp.asarray(item["ctxt_extrinsics"])[None]
    ctxt_i = jnp.asarray(item["ctxt_intrinsics"])[None]
    origins, directions, _ = get_world_rays_with_z(coords, trgt_i, trgt_e)
    near, far = float(ds.near), float(ds.far)
    zs = jnp.linspace(near, far, args.samples)
    positions = origins[:, :, None] + zs[None, None, :, None] * directions[:, :, None]
    pos_flat = positions.reshape(1, args.rays * args.samples, 3)

    # shared projection (both modes use this same math)
    cam_hom = transform_world2cam(homogenize_points(pos_flat), ctxt_e[:, None])
    uv, _ = project_z_divide(cam_hom, ctxt_i[:, None])
    hf, wf = packed.fine_hw
    fx = uv[..., 0] * (wf - 1)
    fy = uv[..., 1] * (hf - 1)
    off_image = float(jnp.mean(((fx < 0) | (fx > wf - 1) |
                                (fy < 0) | (fy > hf - 1)).astype(jnp.float32)))

    exact = pyramid_pixel_features(packed, fx, fy)
    knots = build_ray_knots(
        packed, origins, directions,
        jnp.full(origins.shape[:2], near), jnp.full(origins.shape[:2], far),
        ctxt_e, ctxt_i,
        num_knots=tuple(int(x) for x in args.knots.split(",")))
    epi = knot_features(knots, fx, fy).concat()

    exact = np.asarray(exact, np.float32)
    epi = np.asarray(epi, np.float32)
    scale = np.linalg.norm(exact, axis=-1) + 1e-6
    rel = np.linalg.norm(exact - epi, axis=-1) / scale
    levels = {"fine": (0, 128), "mid": (128, 256), "coarse": (256, 512)}
    per_level = {}
    for name, (a, b) in levels.items():
        s = np.linalg.norm(exact[..., a:b], axis=-1) + 1e-6
        per_level[name] = round(float(np.mean(
            np.linalg.norm(exact[..., a:b] - epi[..., a:b], axis=-1) / s)), 4)

    result = {
        "snapshot": args.snapshot, "knots": args.knots,
        "rays": args.rays, "samples": args.samples,
        "off_image_frac": round(off_image, 4),
        "rel_err_mean": round(float(rel.mean()), 4),
        "rel_err_median": round(float(np.median(rel)), 4),
        "rel_err_p95": round(float(np.percentile(rel, 95)), 4),
        "rel_err_max": round(float(rel.max()), 4),
        "per_level_mean": per_level,
    }
    print(json.dumps(result), flush=True)
    with open(args.out, "a", encoding="utf-8") as f:
        f.write(json.dumps(result) + "\n")


if __name__ == "__main__":
    main()
