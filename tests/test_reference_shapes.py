"""Reference-shape trace checks (VERDICT r2 weak #6).

The CI suite runs toy shapes for speed; the only reference-shape execution
used to be driver-run bench.py. These tests TRACE (jax.eval_shape — no
compile, no compute, abstract params) the full train step and the
whole-image forward at the real workload shape (batch 7, 480x640 context,
256+256 samples, epipolar knots), so a refactor that breaks shapes/ranks at
scale fails in CI. The TPU-only Pallas kernels are backend-gated off on CPU;
their own parity tests cover them — this guards the surrounding graph.
"""

import jax
import jax.numpy as jnp

from neural_jacobian_field_tpu.models.encoder_resnet import EncoderResnetCfg
from neural_jacobian_field_tpu.models.model import Model, RenderingCfg, make_model_cfg
from neural_jacobian_field_tpu.training import (
    RawBatch, TrainCfg, create_train_state, make_train_step,
)

BATCH, H, W = 7, 480, 640
ACTION_DIM = 8


def _flagship():
    return Model(
        cfg=make_model_cfg(
            "jacobian_mlp", action_dim=ACTION_DIM,
            rendering=RenderingCfg(num_proposal_samples=(256,),
                                   num_nerf_samples=256,
                                   pixel_feature_mode="epipolar",
                                   use_pallas_pdf=True,
                                   use_fused_trunk=True),
            encoder=EncoderResnetCfg(norm_type="batch"),
        ),
        compute_dtype=jnp.bfloat16,
    )


def _raw_batch_struct(mode="perception", tracks=0):
    f32 = jnp.float32

    def spec(*shape):
        return jax.ShapeDtypeStruct(shape, f32)

    kw = dict(
        ctxt_rgb=spec(BATCH, H, W, 3),
        ctxt_extrinsics=spec(BATCH, 4, 4), ctxt_intrinsics=spec(BATCH, 3, 3),
        robot_action=spec(BATCH, ACTION_DIM),
        trgt_rgb=spec(BATCH, H, W, 3), trgt_depth=spec(BATCH, H, W, 1),
        trgt_extrinsics=spec(BATCH, 4, 4), trgt_intrinsics=spec(BATCH, 3, 3),
        near=spec(BATCH), far=spec(BATCH),
    )
    if mode == "action":
        if tracks:
            kw.update(
                pixel_selector=jax.ShapeDtypeStruct((BATCH, tracks), jnp.int32),
                pixel_motion=spec(BATCH, tracks, 2),
                pixel_visible_mask=spec(BATCH, tracks),
            )
        else:
            kw.update(flow=spec(BATCH, H, W, 2))
    return RawBatch(**kw)


def _trace_step(mode, tracks=0, rays=256):
    model = _flagship()
    struct = _raw_batch_struct(mode=mode, tracks=tracks)
    cfg = TrainCfg(mode=mode, rays_per_batch=rays)

    def init_and_step(raw, key):
        state = create_train_state(key, model, raw, cfg)
        step = make_train_step(model, cfg, donate=False, static_updated=False)
        return step(state, raw, key)

    new_state, metrics = jax.eval_shape(
        init_and_step, struct, jax.ShapeDtypeStruct((2,), jnp.uint32))
    assert metrics["loss/total"].shape == ()
    assert jax.tree.leaves(new_state.params)


def test_reference_shape_perception_traces():
    _trace_step("perception")


def test_reference_shape_action_tracks_traces():
    _trace_step("action", tracks=1472, rays=1472)


def test_reference_shape_forward_traces():
    from neural_jacobian_field_tpu.models.model import StepCtx
    from neural_jacobian_field_tpu.training import prepare_training_batch

    model = _flagship()
    struct = _raw_batch_struct()
    cfg = TrainCfg(mode="perception", rays_per_batch=64)

    def init_and_fwd(raw, key):
        state = create_train_state(key, model, raw, cfg)
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        mi, _ = prepare_training_batch(key, raw, 64)
        ctx = StepCtx(key=jax.random.PRNGKey(2), anneal=jnp.asarray(1.0),
                      updated=jnp.asarray(True))
        return model.apply(variables, mi, ctx, train=False)

    out = jax.eval_shape(init_and_fwd, struct,
                         jax.ShapeDtypeStruct((2,), jnp.uint32))
    assert out.rgb.shape[-1] == 3
