"""Reference-shape tracing regression test (VERDICT r2 weak #6).

Most tests run 24x24 toy shapes; this one abstractly evaluates the FULL
flagship training step at the reference workload (480x640 context, batch 7,
256 rays, 256+256 samples, epipolar mode, bf16) via jax.eval_shape — no
FLOPs, no compile, but every shape/broadcast/trace error in the
reference-scale program surfaces. (Mosaic lowering of the Pallas kernels is
TPU-only and covered by bench.py; the K7 gate skips the kernel off-TPU.)
"""

import jax
import jax.numpy as jnp
import pytest

from neural_jacobian_field_tpu.models.encoder_resnet import EncoderResnetCfg
from neural_jacobian_field_tpu.models.model import Model, RenderingCfg, make_model_cfg
from neural_jacobian_field_tpu.training import (
    RawBatch, TrainCfg, create_train_state, make_train_step,
)

B, H, W, RAYS, S = 7, 480, 640, 256, 256


def _abstract_batch(mode="perception", tracks=0):
    f32 = jnp.float32
    sd = jax.ShapeDtypeStruct
    raw = RawBatch(
        ctxt_rgb=sd((B, H, W, 3), f32),
        ctxt_extrinsics=sd((B, 4, 4), f32), ctxt_intrinsics=sd((B, 3, 3), f32),
        robot_action=sd((B, 8), f32),
        trgt_rgb=sd((B, H, W, 3), f32), trgt_depth=sd((B, H, W, 1), f32),
        trgt_extrinsics=sd((B, 4, 4), f32), trgt_intrinsics=sd((B, 3, 3), f32),
        near=sd((B,), f32), far=sd((B,), f32),
    )
    if mode == "action":
        if tracks:
            raw = raw.replace(
                pixel_selector=sd((B, tracks), jnp.int32),
                pixel_motion=sd((B, tracks, 2), f32),
                pixel_visible_mask=sd((B, tracks), f32),
            )
        else:
            raw = raw.replace(flow=sd((B, H, W, 2), f32))
    return raw


@pytest.mark.parametrize("mode,tracks", [("perception", 0), ("action", 0),
                                         ("action", 1472)])
def test_flagship_step_traces_at_reference_shapes(mode, tracks):
    model = Model(cfg=make_model_cfg(
        "jacobian_mlp", action_dim=8,
        rendering=RenderingCfg(num_proposal_samples=(S,), num_nerf_samples=S,
                               use_pallas_pdf=True, use_fused_trunk=True,
                               pixel_feature_mode="epipolar"),
        encoder=EncoderResnetCfg(norm_type="batch")),
        compute_dtype=jnp.bfloat16)
    cfg = TrainCfg(mode=mode, rays_per_batch=RAYS)
    raw = _abstract_batch(mode, tracks)

    # concrete init is too slow at this scale; eval_shape it (raw must be an
    # ARGUMENT so eval_shape substitutes tracers for the ShapeDtypeStructs)
    state_shape = jax.eval_shape(
        lambda r: create_train_state(jax.random.PRNGKey(0), model, r, cfg), raw)
    step = make_train_step(model, cfg, donate=False)
    out_shape = jax.eval_shape(step, state_shape, raw,
                               jax.ShapeDtypeStruct((2,), jnp.uint32))
    new_state, metrics = out_shape
    assert metrics["loss/total"].shape == ()
    assert jax.tree.structure(new_state) == jax.tree.structure(state_shape)
