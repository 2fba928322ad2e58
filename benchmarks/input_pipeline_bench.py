"""Host input-pipeline throughput (VERDICT r3 item 3).

The reference feeds training from torch DataLoader CPU workers
(data/data_module.py:34-44: num_workers, pin_memory). Our equivalent is the
threaded `DataLoader` (data/loader.py) over `DatasetCommon.__getitem__`
(PNG/JPEG decode via csrc/njf_loader.cpp with a PIL fallback, 16-bit depth
PNGs, RAFT-style flow .npz). Every device-side benchmark feeds synthetic
device-resident batches, so this harness answers the remaining question: can
the HOST sustain the device's appetite at reference shapes?

Demand at the r3 HEAD step rate (~17 steps/s at batch 7, 480x640): 7 items/s
per step = ~119 items/s, where one action-mode item = 2 RGB decodes (ctxt +
trgt) + 1 depth decode + 1 flow .npz load = ~357 image decodes + 119 flow
loads per second.

Usage:
  python benchmarks/input_pipeline_bench.py --scene /tmp/njf_epi_scene \
      [--mode action] [--workers 2,4,8,16] [--batches 30] [--with-device]

`--with-device` additionally runs the REAL jitted train step consuming the
loader through DevicePrefetcher and reports sustained end-to-end steps/s
(requires the TPU; run it when the chip is free).
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def bench_single_item(ds, n=20):
    """Mean per-item latency + a decode-cost breakdown."""
    from neural_jacobian_field_tpu.data.dataset import load_depth, load_image

    rng = np.random.default_rng(0)
    idxs = rng.integers(0, len(ds), size=n)
    t0 = time.perf_counter()
    for i in idxs:
        ds[int(i)]
    item_ms = (time.perf_counter() - t0) / n * 1e3

    h = int(ds.outputs.heights[0])
    w = int(ds.outputs.widths[0])
    f = ds.outputs.image_filenames[0]
    t0 = time.perf_counter()
    for _ in range(n):
        load_image(f, 1.0, (h, w))
    rgb_ms = (time.perf_counter() - t0) / n * 1e3
    t0 = time.perf_counter()
    for _ in range(n):
        load_depth(str(f).replace("rgb", "depth"), 0.001, (h, w))
    depth_ms = (time.perf_counter() - t0) / n * 1e3
    return {"item_ms": round(item_ms, 2), "rgb_decode_ms": round(rgb_ms, 2),
            "depth_decode_ms": round(depth_ms, 2)}


def bench_loader(ds, batch_size, num_workers, num_batches, num_tracks=None,
                 native=True):
    from neural_jacobian_field_tpu.data import DataLoader

    loader = DataLoader(ds, batch_size=batch_size, num_workers=num_workers,
                        num_tracks=num_tracks, prefetch=8)
    if not native:
        loader._native = False
    it = iter(loader)
    b = next(it)
    wire_mb = sum(np.asarray(x).nbytes for x in
                  (b.ctxt_rgb, b.trgt_rgb, b.trgt_depth) +
                  ((b.flow,) if b.flow is not None else ())) / 1e6
    for _ in range(2):  # warm the queue + page caches
        next(it)
    t0 = time.perf_counter()
    for _ in range(num_batches):
        next(it)
    dt = time.perf_counter() - t0
    items_s = batch_size * num_batches / dt
    return {"workers": num_workers, "native": loader._native,
            "batches_per_s": round(num_batches / dt, 2),
            "items_per_s": round(items_s, 1),
            "wire_mb_per_batch": round(wire_mb, 1)}


def bench_with_device(ds, batch_size, num_workers, steps, num_tracks=None):
    """Sustained end-to-end steps/s: threaded loader -> DevicePrefetcher ->
    the real jitted train step (epipolar, bf16, reference ray/sample shape)."""
    import jax
    import jax.numpy as jnp

    from neural_jacobian_field_tpu.data import DataLoader
    from neural_jacobian_field_tpu.models.encoder_resnet import EncoderResnetCfg
    from neural_jacobian_field_tpu.models.model import (
        Model, RenderingCfg, make_model_cfg)
    from neural_jacobian_field_tpu.parallel import DevicePrefetcher, make_mesh
    from neural_jacobian_field_tpu.training import (
        TrainCfg, create_train_state, make_train_step)
    from neural_jacobian_field_tpu.parallel import replicate

    mode = "action" if ds.cfg.mode == "action" else "perception"
    model = Model(cfg=make_model_cfg(
        "jacobian_mlp", action_dim=ds.action_dim,
        rendering=RenderingCfg(num_proposal_samples=(256,),
                               num_nerf_samples=256, use_pallas_pdf=True,
                               use_fused_trunk=True,
                               pixel_feature_mode="epipolar"),
        encoder=EncoderResnetCfg(norm_type="batch"),
    ), compute_dtype=jnp.bfloat16)
    cfg = TrainCfg(mode=mode, rays_per_batch=256, warm_up_steps=100)
    loader = DataLoader(ds, batch_size=batch_size, num_workers=num_workers,
                        num_tracks=num_tracks, prefetch=8)
    mesh = make_mesh(jax.devices()[:1])
    state = create_train_state(jax.random.PRNGKey(0), model,
                               next(iter(loader)), cfg)
    state = replicate(state, mesh)
    device_iter = DevicePrefetcher(iter(loader), mesh, depth=2)
    # two statically-gated variants, dispatched like the CLI loop
    from neural_jacobian_field_tpu.training import host_step_schedule

    step_fns = {True: make_train_step(model, cfg, static_updated=True),
                False: make_train_step(model, cfg, static_updated=False)}
    key = jax.random.PRNGKey(1)
    ssu = 0
    # compile both variants
    for forced in (True, False):
        key, sub = jax.random.split(key)
        state, m = step_fns[forced](state, next(device_iter), sub)
    float(m["loss/total"])
    t0 = time.perf_counter()
    for i in range(steps):
        key, sub = jax.random.split(key)
        updated, ssu = host_step_schedule(i + 100000, ssu, model.cfg.rendering)
        state, m = step_fns[updated](state, next(device_iter), sub)
    float(m["loss/total"])  # data-pull sync
    dt = time.perf_counter() - t0
    rays = cfg.rays_per_batch * batch_size
    return {"steps_per_s": round(steps / dt, 2),
            "rays_per_s": round(steps / dt * rays, 0),
            "workers": num_workers}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="/tmp/njf_epi_scene")
    ap.add_argument("--mode", default="action",
                    choices=["action", "perception"])
    ap.add_argument("--batch", type=int, default=7)
    ap.add_argument("--workers", default="2,4,8,16")
    ap.add_argument("--batches", type=int, default=30)
    ap.add_argument("--with-device", action="store_true")
    ap.add_argument("--device-steps", type=int, default=100)
    ap.add_argument("--out", default="/tmp/njf_input_pipeline.jsonl")
    args = ap.parse_args()

    if not args.with_device:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from neural_jacobian_field_tpu.data import DatasetCfgCommon, get_dataset
    from neural_jacobian_field_tpu.data.native import get_lib
    from neural_jacobian_field_tpu.data.synthetic import make_synthetic_scene

    scene = Path(args.scene)
    if not (scene / "transforms.json").exists():
        print(f"generating 480x640 scene -> {scene}", flush=True)
        make_synthetic_scene(scene, num_cameras=4, num_trajs=4,
                             frames_per_traj=6, height=480, width=640,
                             action_dim=3, seed=1)

    ds = get_dataset(DatasetCfgCommon(
        name="allegro", mode=args.mode, root=scene, num_total_joints=3,
        max_num_frames_per_traj=6), "train")

    results = {"native_loader": get_lib() is not None,
               "hw": [int(ds.outputs.heights[0]), int(ds.outputs.widths[0])],
               "mode": args.mode,
               "single_item": bench_single_item(ds)}
    print(json.dumps(results), flush=True)

    import os

    sweeps = []
    for workers in (int(x) for x in args.workers.split(",")):
        r = bench_loader(ds, args.batch, workers, args.batches)
        sweeps.append(r)
        print(json.dumps(r), flush=True)
    # per-item GIL-bound baseline (the pre-r4 path) for the comparison table
    r = bench_loader(ds, args.batch, 2, args.batches, native=False)
    r["path"] = "per-item"
    sweeps.append(r)
    print(json.dumps(r), flush=True)
    results["loader_sweep"] = sweeps

    # device demand at the r3 HEAD step rate: ~17 steps/s x batch 7
    best = max(s["items_per_s"] for s in sweeps)
    demand_batches = 17.0
    results["best_items_per_s"] = best
    results["demand_items_per_s_at_17sps"] = demand_batches * args.batch
    results["headroom_x"] = round(best / (demand_batches * args.batch), 2)
    results["host_cores"] = os.cpu_count()
    # native decode scales ~linearly with cores (GIL released); project the
    # core count needed to clear the device demand on a real host
    native_best = max((s["batches_per_s"] for s in sweeps
                       if s.get("native")), default=0.0)
    if native_best:
        results["cores_needed_native"] = round(
            demand_batches / native_best * os.cpu_count(), 1)
    wire = sweeps[0]["wire_mb_per_batch"]
    results["tunnel_ceiling_batches_per_s_at_120MBps"] = round(120.0 / wire, 2)

    if args.with_device:
        r = bench_with_device(ds, args.batch,
                              max(int(x) for x in args.workers.split(",")),
                              args.device_steps)
        results["end_to_end"] = r
        print(json.dumps({"end_to_end": r}), flush=True)

    with open(args.out, "a", encoding="utf-8") as f:
        f.write(json.dumps(results) + "\n")
    print(json.dumps({"summary": {k: results[k] for k in
                                  ("best_items_per_s",
                                   "demand_items_per_s_at_17sps",
                                   "headroom_x", "native_loader")}}),
          flush=True)


if __name__ == "__main__":
    main()
