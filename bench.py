"""Benchmark: volume-rendering training throughput (rays/sec/chip).

Runs the full perception train step (encoder + proposal sampling + field
decode + compositing + losses + backward + Adam) at the reference workload
shape — batch 7 scenes x 256 rays x (256 proposal + 256 nerf) samples
(reference configurations/config.yaml:18-20, model_allegro.yaml:6-8) — and
reports rays/sec on the current chip.

Baseline derivation (the reference publishes no tables, BASELINE.md): README
estimates ~1,300 h for the default 50M steps on 1x A40 (README.md:142-143)
=> 50e6 / (1300*3600) ≈ 10.7 steps/s x 7 scenes x 256 rays ≈ 19,150 rays/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_RAYS_PER_SEC = 19150.0  # 1x A40, derived above

BATCH = 7
RAYS = 256
IMAGE_HW = (480, 640)  # inference render default (models/model.py:533-535)
SAMPLES = (256, 256)
ACTION_DIM = 8


def main():
    from neural_jacobian_field_tpu.models.encoder_resnet import EncoderResnetCfg
    from neural_jacobian_field_tpu.models.model import Model, RenderingCfg, make_model_cfg
    from neural_jacobian_field_tpu.training import RawBatch, TrainCfg, create_train_state, make_train_step

    h, w = IMAGE_HW
    key = jax.random.PRNGKey(0)
    c2w = jnp.broadcast_to(jnp.eye(4), (BATCH, 4, 4))
    intr = jnp.broadcast_to(
        jnp.array([[1.2, 0.0, 0.5], [0.0, 1.6, 0.5], [0.0, 0.0, 1.0]]), (BATCH, 3, 3)
    )
    batch = RawBatch(
        ctxt_rgb=jax.random.uniform(key, (BATCH, h, w, 3)),
        ctxt_extrinsics=c2w, ctxt_intrinsics=intr,
        robot_action=jnp.zeros((BATCH, ACTION_DIM)),
        trgt_rgb=jax.random.uniform(jax.random.PRNGKey(1), (BATCH, h, w, 3)),
        trgt_depth=jax.random.uniform(jax.random.PRNGKey(2), (BATCH, h, w, 1),
                                      minval=1.0, maxval=4.0),
        trgt_extrinsics=c2w, trgt_intrinsics=intr,
        near=jnp.full((BATCH,), 0.5), far=jnp.full((BATCH,), 10.0),
    )

    model = Model(
        cfg=make_model_cfg(
            "jacobian_mlp", action_dim=ACTION_DIM,
            rendering=RenderingCfg(num_proposal_samples=(SAMPLES[0],),
                                   num_nerf_samples=SAMPLES[1],
                                   # K5 fused PDF-resample kernel: validated
                                   # loss parity, -9.2% step time on-chip
                                   use_pallas_pdf=True,
                                   # K1b epipolar ray-knot feature path:
                                   # 195 -> 111 ms/step on-chip; quality A/B
                                   # on the synthetic scene shows no
                                   # regression (benchmarks/RESULTS.md)
                                   pixel_feature_mode="epipolar",
                                   # K7 fused trunk kernel (+8% step)
                                   use_fused_trunk=True),
            # reference default norm (image_encoder_resnet.yaml: batch)
            encoder=EncoderResnetCfg(norm_type="batch"),
        ),
        compute_dtype=jnp.bfloat16,
    )
    cfg = TrainCfg(mode="perception", rays_per_batch=RAYS, warm_up_steps=10000)
    state = create_train_state(key, model, batch, cfg)
    step = make_train_step(model, cfg, donate=True)

    # warmup / compile; device_get forces a REAL sync (on some remote-TPU
    # transports block_until_ready resolves before compute completes, so any
    # timing must end by pulling actual data)
    state, metrics = step(state, batch, jax.random.PRNGKey(10))
    float(metrics["loss/total"])

    def run(n, seed):
        nonlocal state
        t0 = time.perf_counter()
        m = None
        for i in range(n):
            state, m = step(state, batch, jax.random.PRNGKey(seed + i))
        float(m["loss/total"])  # real sync
        return time.perf_counter() - t0

    # chained steps (state feeds state) with one data pull at the end; the
    # per-dispatch overhead is amortized across k steps. (steps_per_call=4
    # via lax.scan measures ~3% faster with a device-resident stacked batch —
    # benchmarks/RESULTS.md; per-step kept here for simplicity.)
    k = 12
    per_step = run(k, 100) / k
    rays_per_sec = BATCH * RAYS / per_step
    print(json.dumps({
        "metric": "train_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s (fwd+bwd, b7x256rays x 512 samples, bf16)",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
