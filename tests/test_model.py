"""Model-stack tests: encoder pyramid, decoders, composed forward, the
inverse-dynamics fast path, and the stage-2 freezing pattern.

The reference has no tests (SURVEY.md §4); these encode its documented
behavior: feature dims (encoder_resnet.py:87-89), flow linearity in the
action (action_decoder_jacobian.py:128-145), cached-encoding flow ==
forward flow (models/model.py:458-525), near-zero Jacobian init
(action_decoder_jacobian.py:77-84).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_jacobian_field_tpu.models.encoder_resnet import EncoderResnet, EncoderResnetCfg
from neural_jacobian_field_tpu.models.model import (
    CameraInput,
    Model,
    ModelInput,
    RenderingCfg,
    RenderingInput,
    RobotInput,
    StepCtx,
    make_model_cfg,
    step_schedules,
)

ACTION_DIM = 5


def tiny_cfg(decoder="jacobian_mlp"):
    return make_model_cfg(
        decoder,
        action_dim=ACTION_DIM,
        rendering=RenderingCfg(num_proposal_samples=(6,), num_nerf_samples=5),
        encoder=EncoderResnetCfg(norm_type="group"),
    )


def tiny_inputs(key, batch=2, rays=3, hw=32, action=None):
    ks = jax.random.split(key, 4)
    c2w = jnp.broadcast_to(jnp.eye(4), (batch, 4, 4))
    intr = jnp.broadcast_to(
        jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]), (batch, 3, 3)
    )
    dirs = jax.random.normal(ks[0], (batch, rays, 3)) * 0.1 + jnp.array([0.0, 0.0, 1.0])
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    if action is None:
        action = jax.random.normal(ks[1], (batch, ACTION_DIM))
    cam = CameraInput(
        input_image=jax.random.uniform(ks[2], (batch, hw, hw, 3)),
        ctxt_extrinsics=c2w, ctxt_intrinsics=intr,
        trgt_extrinsics=c2w, trgt_intrinsics=intr,
    )
    rend = RenderingInput(
        origins=jnp.zeros((batch, rays, 3)), directions=dirs,
        z_near=jnp.full((batch,), 0.5), z_far=jnp.full((batch,), 10.0),
    )
    return ModelInput(camera_input=cam, rendering_input=rend,
                      robot_input=RobotInput(robot_action=action))


def eval_ctx(key=None):
    return StepCtx(
        key=key if key is not None else jax.random.PRNGKey(0),
        anneal=jnp.asarray(1.0), updated=jnp.asarray(True),
    )


def test_encoder_pyramid_dims():
    cfg = EncoderResnetCfg(num_layers=4, norm_type="group", feature_layout="concat")
    enc = EncoderResnet(cfg=cfg)
    x = jnp.zeros((1, 64, 64, 3))
    variables = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(variables, x)
    # conv1(64) + layer1(64) + layer2(128) + layer3(256) = 512 at H/2 x W/2
    assert out.shape == (1, 32, 32, 512)
    assert EncoderResnet.output_dim(cfg) == 512
    # default (pyramid) layout: same channels split across native resolutions
    pyr = EncoderResnet(cfg=EncoderResnetCfg(num_layers=4, norm_type="group")
                        ).apply(variables, x)
    assert pyr.fine.shape == (1, 32, 32, 128)
    assert pyr.mid.shape == (1, 8, 8, 128)
    assert pyr.coarse.shape == (1, 4, 4, 256)


def test_encoder_batchnorm_mutable():
    cfg = EncoderResnetCfg(num_layers=2, norm_type="batch")
    enc = EncoderResnet(cfg=cfg)
    x = jnp.ones((1, 32, 32, 3))
    variables = enc.init(jax.random.PRNGKey(0), x, train=True)
    assert "batch_stats" in variables
    out, updates = enc.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out.shape[-1] == 64 + 64
    # running stats must actually move
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(updates["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


@pytest.mark.parametrize("decoder", ["jacobian_mlp", "jacobian_transformer", "flow_mlp"])
def test_forward_shapes(decoder):
    model = Model(cfg=tiny_cfg(decoder))
    mi = tiny_inputs(jax.random.PRNGKey(1))
    variables = model.init(jax.random.PRNGKey(0), mi, eval_ctx(), train=True)
    out = model.apply(variables, mi, eval_ctx(), train=True)
    B, R = 2, 3
    assert out.rgb.shape == (B, R, 3)
    assert out.depth.shape == (B, R, 1)
    assert out.optical_flow.shape == (B, R, 2)
    assert len(out.weights_list) == 2  # 1 proposal level + final
    assert out.weights_list[0].shape == (B, R, 6, 1)
    assert out.weights_list[1].shape == (B, R, 5, 1)
    assert out.sdist_list[0].shape == (B, R, 7)
    assert all(np.isfinite(np.asarray(x)).all() for x in (out.rgb, out.depth, out.optical_flow))


def test_scene_flow_linear_in_action():
    """J(x)·a is linear: flow(a1+a2) == flow(a1) + flow(a2) at the sample level.
    Verified through infer_optical_flow's einsum on a cached encoding."""
    model = Model(cfg=tiny_cfg("jacobian_mlp"))
    mi = tiny_inputs(jax.random.PRNGKey(1))
    variables = model.init(jax.random.PRNGKey(0), mi, eval_ctx(), train=False)

    enc = model.apply(variables, mi.camera_input, mi.rendering_input, mi.robot_input,
                      eval_ctx(), method=Model.encode_image)

    def flow_for(a):
        return model.apply(variables, enc, mi.camera_input,
                           RobotInput(robot_action=a), method=Model.infer_optical_flow)

    key = jax.random.PRNGKey(7)
    a1 = jax.random.normal(key, (2, ACTION_DIM))
    a2 = jax.random.normal(jax.random.PRNGKey(8), (2, ACTION_DIM))
    # scene flow composites linearly; projection then differences the
    # composited positions, so compare against the warped-position sum instead
    # of raw flow: positions(a1+a2) - positions(0) == (pos(a1)-pos0)+(pos(a2)-pos0)
    j = enc.action_features.reshape(*enc.action_features.shape[:-1], ACTION_DIM, 3)
    sf1 = jnp.einsum("brsat,ba->brst", j, a1)
    sf2 = jnp.einsum("brsat,ba->brst", j, a2)
    sf12 = jnp.einsum("brsat,ba->brst", j, a1 + a2)
    np.testing.assert_allclose(np.asarray(sf12), np.asarray(sf1 + sf2), atol=1e-5)
    # and flow_for runs + is finite
    f = flow_for(a1)
    assert np.isfinite(np.asarray(f)).all()


def test_encode_image_matches_forward_flow():
    """Cached-Jacobian inverse-dynamics path must reproduce the forward
    optical flow exactly when sampling is deterministic."""
    model = Model(cfg=tiny_cfg("jacobian_mlp"))
    mi = tiny_inputs(jax.random.PRNGKey(3))
    variables = model.init(jax.random.PRNGKey(0), mi, eval_ctx(), train=False)

    out = model.apply(variables, mi, eval_ctx(), train=False)
    enc = model.apply(variables, mi.camera_input, mi.rendering_input, mi.robot_input,
                      eval_ctx(), method=Model.encode_image)
    flow = model.apply(variables, enc, mi.camera_input, mi.robot_input,
                       method=Model.infer_optical_flow)
    np.testing.assert_allclose(np.asarray(flow), np.asarray(out.optical_flow),
                               rtol=2e-4, atol=2e-5)


def test_jacobian_near_zero_init():
    """Near-zero init => initial scene flow ~0 (reference std 1e-4)."""
    model = Model(cfg=tiny_cfg("jacobian_mlp"))
    mi = tiny_inputs(jax.random.PRNGKey(1))
    variables = model.init(jax.random.PRNGKey(0), mi, eval_ctx(), train=False)
    enc = model.apply(variables, mi.camera_input, mi.rendering_input, mi.robot_input,
                      eval_ctx(), method=Model.encode_image)
    assert float(jnp.max(jnp.abs(enc.action_features))) < 1e-2


def test_step_schedules():
    cfg = RenderingCfg(proposal_warmup=100, proposal_update_every=5,
                       proposal_weights_anneal_max_num_iters=10,
                       proposal_weights_anneal_slope=10.0)
    # early steps always update
    _, upd, ssu = step_schedules(jnp.asarray(0), jnp.asarray(1), cfg)
    assert bool(upd) and int(ssu) == 1
    # past warmup: update only after >5 steps since last
    _, upd, _ = step_schedules(jnp.asarray(1000), jnp.asarray(3), cfg)
    assert not bool(upd)
    _, upd, ssu = step_schedules(jnp.asarray(1000), jnp.asarray(6), cfg)
    assert bool(upd) and int(ssu) == 1
    # anneal ramps 0 -> 1
    a0, _, _ = step_schedules(jnp.asarray(0), jnp.asarray(1), cfg)
    a1, _, _ = step_schedules(jnp.asarray(10), jnp.asarray(1), cfg)
    assert float(a0) == 0.0 and float(a1) == pytest.approx(1.0)


def test_arm_mode_second_head():
    """use_arm_model adds a second Jacobian head with its own action dim;
    arm=True routes through it (action_decoder_jacobian.py:86-90,300-308)."""
    from neural_jacobian_field_tpu.models.decoders import (
        ActionDecoderJacobianMlp, ActionDecoderJacobianMlpCfg, PixelEncoding,
    )
    from neural_jacobian_field_tpu.models.resnet_fc import MlpCfg

    arm_dim = 7
    dec = ActionDecoderJacobianMlp(
        cfg=ActionDecoderJacobianMlpCfg(
            mlp=MlpCfg(n_blocks=2, d_hidden=32), use_arm_model=True,
            arm_action_dim=arm_dim),
        action_dim=ACTION_DIM, encoder_dim=16,
    )
    b, r, s = 1, 2, 3
    pe = PixelEncoding(
        features=jnp.zeros((b, 8, 8, 16)),
        extrinsics=jnp.broadcast_to(jnp.eye(4), (b, 4, 4)),
        intrinsics=jnp.broadcast_to(jnp.eye(3), (b, 3, 3)),
        action=jnp.zeros((b, ACTION_DIM)),
    )
    xyz = jnp.zeros((b, r, s, 3))
    dirs = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (b, r, s, 3))
    variables = dec.init(jax.random.PRNGKey(0), xyz, dirs, pe)
    assert "jacobian_head_arm" in variables["params"]
    out = dec.apply(variables, xyz, dirs, pe)
    assert out.action_features.shape == (b, r, s, ACTION_DIM * 3)
    # arm mode: J has arm_action_dim columns; needs an arm-sized action
    pe_arm = pe.replace(action=jnp.zeros((b, arm_dim)))
    out_arm = dec.apply(variables, xyz, dirs, pe_arm, arm=True)
    assert out_arm.action_features.shape == (b, r, s, arm_dim * 3)


def test_pallas_pdf_model_forward():
    """model.rendering.use_pallas_pdf routes sampling through the K5 kernel
    without changing output shapes/finiteness (distributionally equivalent)."""
    import dataclasses

    base = tiny_cfg("jacobian_mlp")
    cfg = dataclasses.replace(base, rendering=dataclasses.replace(
        base.rendering, use_pallas_pdf=True))
    model = Model(cfg=cfg)
    mi = tiny_inputs(jax.random.PRNGKey(1))
    variables = model.init(jax.random.PRNGKey(0), mi, eval_ctx(), train=True)
    out = model.apply(variables, mi, eval_ctx(), train=True)
    assert out.rgb.shape == (2, 3, 3)
    assert np.isfinite(np.asarray(out.rgb)).all()
    # gradient flows (kernel inputs are stop-gradded, matching the reference's
    # bins.detach() semantics)
    def loss(p):
        o = model.apply({"params": p}, mi, eval_ctx(), train=True)
        return jnp.mean(o.rgb ** 2)
    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
