"""K1b epipolar ray-knot feature path (ops/epipolar.py).

Encodes the scheme's exactness guarantees: collapse to the exact path when
the projected segment is a point (context == ray camera) or when knots are
dense relative to the segment, and trains end-to-end in "epipolar" mode.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_jacobian_field_tpu.models.encoder_resnet import EncoderResnetCfg
from neural_jacobian_field_tpu.models.model import (
    Model,
    RenderingCfg,
    StepCtx,
    make_model_cfg,
)

from test_model import ACTION_DIM, eval_ctx, tiny_cfg, tiny_inputs


def _model_pair(knots=(64, 16, 8)):
    base = tiny_cfg()
    exact = Model(cfg=base)
    epi = Model(cfg=dataclasses.replace(
        base,
        rendering=dataclasses.replace(
            base.rendering, pixel_feature_mode="epipolar", epipolar_knots=knots
        ),
    ))
    return exact, epi


def _forward(model, variables, mi):
    return model.apply(variables, mi, eval_ctx(), train=False)


def test_same_camera_matches_exact():
    """Rays from the context camera center project every sample to one pixel:
    the segment degenerates to a point, all knots coincide, and the epipolar
    interp IS the exact bilinear sample."""
    mi = tiny_inputs(jax.random.PRNGKey(0))  # origins at ctxt camera center
    exact, epi = _model_pair()
    variables = exact.init(jax.random.PRNGKey(1), mi, eval_ctx())
    out_a = _forward(exact, variables, mi)
    out_b = _forward(epi, variables, mi)
    np.testing.assert_allclose(np.asarray(out_a.rgb), np.asarray(out_b.rgb),
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_a.depth), np.asarray(out_b.depth),
                               rtol=2e-2, atol=2e-3)


def test_offset_camera_dense_knots_close():
    """Feature-level parity with a translated context camera: in-image
    samples must converge to the exact bilinear features as knots densify
    (off-image samples legitimately differ — the exact path's independent
    2D border clamp vs the segment-end knot, both clamp artifacts)."""
    from neural_jacobian_field_tpu.ops.epipolar import build_ray_knots, sample_ray_knots
    from neural_jacobian_field_tpu.ops.pixel_gather import (
        FeaturePyramid, pack_pyramid, pyramid_pixel_features,
    )
    from neural_jacobian_field_tpu.rendering.geometry import (
        homogenize_points, project_z_divide, transform_world2cam,
    )

    key = jax.random.PRNGKey(0)
    b, r, s = 2, 8, 33
    hf, wf = 16, 16
    pyr = FeaturePyramid(
        fine=jax.random.normal(key, (b, hf, wf, 128)),
        mid=jax.random.normal(jax.random.PRNGKey(1), (b, 4, 4, 128)),
        coarse=jax.random.normal(jax.random.PRNGKey(2), (b, 2, 2, 256)),
    )
    packed = pack_pyramid(pyr)
    c2w = jnp.broadcast_to(jnp.eye(4), (b, 4, 4))
    intr = jnp.broadcast_to(
        jnp.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]), (b, 3, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(3), (b, r, 3)) * 0.1 \
        + jnp.array([0.0, 0.0, 1.0])
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    orig = jnp.broadcast_to(jnp.array([0.15, -0.1, 0.0]), (b, r, 3))
    near = jnp.full((b, r), 0.5)
    far = jnp.full((b, r), 10.0)
    t = jnp.linspace(0, 1, s)[None, None]
    z = near[..., None] * (1 - t) + far[..., None] * t
    xyz = (orig[:, :, None] + z[..., None] * dirs[:, :, None]).reshape(b, r * s, 3)

    cam_hom = transform_world2cam(homogenize_points(xyz), c2w[:, None])
    uvw, _ = project_z_divide(cam_hom[..., :3], intr[:, None])
    fx, fy = uvw[..., 0] * (wf - 1), uvw[..., 1] * (hf - 1)
    exact = pyramid_pixel_features(packed, fx, fy)
    in_img = ((fx >= 0) & (fx <= wf - 1) & (fy >= 0) & (fy <= hf - 1))[..., None]

    prev_mean = None
    for knots_cfg in [(32, 16, 8), (256, 128, 64)]:
        kn = build_ray_knots(packed, orig, dirs, near, far, c2w, intr,
                             num_knots=knots_cfg)
        got = sample_ray_knots(kn, fx, fy)
        err = jnp.abs(got - exact)
        mean = float(jnp.mean(err))
        if prev_mean is not None:
            assert mean < prev_mean  # densifying knots must improve
        prev_mean = mean
        in_err = float(jnp.max(jnp.where(in_img, err, 0.0)))
        if knots_cfg[0] >= 256:
            assert in_err < 0.05, in_err  # dense knots: in-image near-exact


def test_epipolar_train_step_descends():
    """A perception train step in epipolar mode: finite loss, encoder grads
    flow (the knot gathers carry gradient back to the feature maps), loss
    decreases on a fixed batch."""
    from test_training import tiny_batch
    from neural_jacobian_field_tpu.training import (
        TrainCfg, create_train_state, make_train_step,
    )

    cfg_m = make_model_cfg(
        "jacobian_mlp", action_dim=4,
        rendering=RenderingCfg(num_proposal_samples=(6,), num_nerf_samples=5,
                               pixel_feature_mode="epipolar",
                               epipolar_knots=(16, 8, 4)),
        encoder=EncoderResnetCfg(norm_type="group", num_layers=2),
    )
    model = Model(cfg=cfg_m)
    raw = tiny_batch(jax.random.PRNGKey(0))
    cfg = TrainCfg(mode="perception", rays_per_batch=32, lr=1e-3, warm_up_steps=5)
    state = create_train_state(jax.random.PRNGKey(1), model, raw, cfg)
    step = make_train_step(model, cfg, donate=False)
    first = None
    for i in range(8):
        state, m = step(state, raw, jax.random.PRNGKey(3))
        loss = float(m["loss/rgb"])
        assert np.isfinite(loss)
        if first is None:
            first = loss
    assert loss < first, (first, loss)


def test_clip_segment():
    from neural_jacobian_field_tpu.ops.epipolar import _clip_segment

    p0 = jnp.array([[-10.0, 5.0]])
    p1 = jnp.array([[20.0, 5.0]])
    a, b = _clip_segment(p0, p1, 15.0, 10.0)
    np.testing.assert_allclose(np.asarray(a), [[-1.0, 5.0]], atol=1e-5)
    np.testing.assert_allclose(np.asarray(b), [[15.0, 5.0]], atol=1e-5)
    # fully outside: unchanged (every knot border-clamps anyway)
    p0 = jnp.array([[-30.0, -7.0]])
    p1 = jnp.array([[-20.0, -7.0]])
    a, b = _clip_segment(p0, p1, 15.0, 10.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(p0))
    np.testing.assert_allclose(np.asarray(b), np.asarray(p1))
    # degenerate point segment inside
    p0 = jnp.array([[3.0, 4.0]])
    a, b = _clip_segment(p0, p0, 15.0, 10.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(p0))
    np.testing.assert_allclose(np.asarray(b), np.asarray(p0))

def test_project_then_interp_dot_forms_match():
    """The NJF_KW_DOT=4d contraction (two batch dims, no [B*R] reshape) must
    be numerically identical to the default 2-D merged-batch dot AND to the
    definitional concat() @ W form — value and gradients."""
    import neural_jacobian_field_tpu.ops.epipolar as epi

    key = jax.random.PRNGKey(0)
    b, r, sn, d = 2, 3, 5, 7
    ms, cs = (6, 4, 2), (8, 5, 3)
    ks = [
        jax.random.normal(jax.random.fold_in(key, i), (b, r, m, c), jnp.float32)
        for i, (m, c) in enumerate(zip(ms, cs))
    ]
    ws = [
        jax.random.normal(jax.random.fold_in(key, 10 + i), (c, d), jnp.float32)
        for i, c in enumerate(cs)
    ]
    s = jax.random.uniform(jax.random.fold_in(key, 20), (b, r, sn))
    kf = epi.KnotFeatures(levels=tuple(ks), s=s)

    def run(flag):
        old = epi._KW_DOT_4D
        epi._KW_DOT_4D = flag
        try:
            f = lambda levels: dataclasses.replace(kf, levels=levels).project_then_interp(ws)
            val = f(tuple(ks))
            grads = jax.grad(lambda levels: jnp.sum(jnp.sin(f(levels))))(tuple(ks))
        finally:
            epi._KW_DOT_4D = old
        return val, grads

    v2, g2 = run(False)
    v4, g4 = run(True)
    definitional = kf.concat() @ jnp.concatenate(ws, axis=0)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(definitional), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v4), np.asarray(v2), atol=1e-5)
    for a, c in zip(g4, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-5)
