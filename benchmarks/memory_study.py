"""Max-scale memory study (VERDICT r2 item 7): kill the reference's
documented tracks-mode OOM hazard (README.md:161-165) with numbers.

For remat off/on (Model.remat -> jax.checkpoint around the per-point field
evals), sweeps rays_per_batch (flow mode) and track count (tracks mode)
upward at reference shapes (batch 7, 480x640 context, 256+256 samples,
bf16) until the step OOMs, recording throughput at each size. The result
table lives in benchmarks/RESULTS.md; configurations/config.yaml points at
it.

Usage: python benchmarks/memory_study.py [--mode flow|tracks|both] [--remat on|off|both]
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

BATCH = 7
HW = (480, 640)
ACTION_DIM = 8


def try_step(rays, tracks, remat, k=6):
    """Returns rays/s or raises on OOM. Fresh model/state per size."""
    from neural_jacobian_field_tpu.models.encoder_resnet import EncoderResnetCfg
    from neural_jacobian_field_tpu.models.model import Model, RenderingCfg, make_model_cfg
    from neural_jacobian_field_tpu.training import (
        RawBatch, TrainCfg, create_train_state, make_train_step,
    )

    h, w = HW
    key = jax.random.PRNGKey(0)
    c2w = jnp.broadcast_to(jnp.eye(4), (BATCH, 4, 4))
    intr = jnp.broadcast_to(
        jnp.array([[1.2, 0, 0.5], [0, 1.6, 0.5], [0, 0, 1.0]]), (BATCH, 3, 3))
    raw = RawBatch(
        ctxt_rgb=jax.random.uniform(key, (BATCH, h, w, 3)),
        ctxt_extrinsics=c2w, ctxt_intrinsics=intr,
        robot_action=jax.random.normal(jax.random.PRNGKey(7), (BATCH, ACTION_DIM)) * 0.1,
        trgt_rgb=jax.random.uniform(key, (BATCH, h, w, 3)),
        trgt_depth=jax.random.uniform(key, (BATCH, h, w, 1), minval=1.0, maxval=4.0),
        trgt_extrinsics=c2w, trgt_intrinsics=intr,
        near=jnp.full((BATCH,), 0.5), far=jnp.full((BATCH,), 10.0))
    if tracks:
        raw = raw.replace(
            pixel_selector=jax.random.randint(key, (BATCH, tracks), 0, h * w),
            pixel_motion=jax.random.normal(key, (BATCH, tracks, 2)),
            pixel_visible_mask=jnp.ones((BATCH, tracks)))
    else:
        raw = raw.replace(flow=jax.random.normal(key, (BATCH, h, w, 2)))

    model = Model(cfg=make_model_cfg(
        "jacobian_mlp", action_dim=ACTION_DIM,
        rendering=RenderingCfg(num_proposal_samples=(256,), num_nerf_samples=256,
                               use_pallas_pdf=True, pixel_feature_mode="epipolar",
                               use_fused_trunk=True),
        encoder=EncoderResnetCfg(norm_type="batch")),
        compute_dtype=jnp.bfloat16, remat=remat)
    cfg = TrainCfg(mode="action", rays_per_batch=rays)
    state = create_train_state(key, model, raw, cfg)
    step = make_train_step(model, cfg, donate=True)
    state, m = step(state, raw, jax.random.PRNGKey(1))
    float(np.asarray(jax.device_get(m["loss/total"])).ravel()[0])
    t0 = time.perf_counter()
    for i in range(k):
        state, m = step(state, raw, jax.random.PRNGKey(2 + i))
    float(np.asarray(jax.device_get(m["loss/total"])).ravel()[0])
    per = (time.perf_counter() - t0) / k
    return BATCH * (tracks or rays) / per


def run_one(mode, remat, size):
    tag = {"mode": mode, "remat": remat,
           ("tracks" if mode == "tracks" else "rays_per_scene"): size}
    try:
        rps = try_step(rays=size if mode == "flow" else 256,
                       tracks=size if mode == "tracks" else 0, remat=remat)
        tag.update(ok=True, rays_per_sec=round(rps, 0))
    except Exception as e:
        msg = str(e)
        oom = "RESOURCE_EXHAUSTED" in msg or "memory" in msg.lower()
        tag.update(ok=False, oom=oom, error=type(e).__name__,
                   msg=msg.splitlines()[0][:200] if msg else "")
    print(json.dumps(tag), flush=True)
    return tag


def sweep(mode, remat, sizes):
    """Each size runs in a FRESH subprocess: an OOMed attempt can leave the
    (remote) device allocator poisoned, turning every later config in the
    same process into a false OOM (observed: tracks-1472 'OOM' right after
    a real flow-4096 one, while the same shape passes standalone)."""
    import subprocess

    results = []
    for s in sizes:
        out = subprocess.run(
            [sys.executable, __file__, "--one",
             f"{mode}:{'on' if remat else 'off'}:{s}"],
            capture_output=True, text=True)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if line:
            tag = json.loads(line[-1])
            print(json.dumps(tag), flush=True)
        else:
            tag = {"mode": mode, "remat": remat, "size": s, "ok": False,
                   "oom": False, "error": f"subprocess rc={out.returncode}"}
            print(json.dumps(tag), flush=True)
            print(out.stderr[-800:], file=sys.stderr, flush=True)
        results.append(tag)
        if not tag.get("ok") and tag.get("oom"):
            break
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="both", choices=["flow", "tracks", "both"])
    ap.add_argument("--remat", default="both", choices=["on", "off", "both"])
    ap.add_argument("--one", default=None,
                    help="internal: run a single 'mode:remat:size' config")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir",
                      str(Path.home() / ".cache" / "njf_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.one:
        mode, remat, size = args.one.split(":")
        run_one(mode, remat == "on", int(size))
        return

    flow_sizes = [256, 1024, 4096, 8192, 16384, 32768]
    track_sizes = [1472, 4096, 8192, 16384, 32768, 65536]
    remats = {"on": [True], "off": [False], "both": [False, True]}[args.remat]
    for remat in remats:
        if args.mode in ("flow", "both"):
            sweep("flow", remat, flow_sizes)
        if args.mode in ("tracks", "both"):
            sweep("tracks", remat, track_sizes)


if __name__ == "__main__":
    main()
