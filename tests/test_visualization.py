"""View-interpolation tests (visualization/view_interpolation.py vs the
reference's scipy-based implementation semantics)."""

import numpy as np
import pytest

from neural_jacobian_field_tpu.visualization import (
    cosine_smooth,
    generate_wobble,
    interpolate_intrinsics,
    interpolate_pose,
    ping_pong,
    reproj_best,
)
from neural_jacobian_field_tpu.visualization.view_interpolation import _exp_so3, _log_so3


def random_pose(rng):
    v = rng.normal(size=3)
    pose = np.eye(4)
    pose[:3, :3] = _exp_so3(v)
    pose[:3, 3] = rng.normal(size=3)
    return pose


def test_so3_log_exp_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        v = rng.normal(size=3)
        r = _exp_so3(v)
        np.testing.assert_allclose(_exp_so3(_log_so3(r)), r, atol=1e-8)
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-10)


def test_interpolate_pose_endpoints_and_validity():
    rng = np.random.default_rng(1)
    a, b = random_pose(rng), random_pose(rng)
    np.testing.assert_allclose(interpolate_pose(a, b, 0.0), a, atol=1e-8)
    np.testing.assert_allclose(interpolate_pose(a, b, 1.0), b, atol=1e-7)
    mid = interpolate_pose(a, b, 0.5)
    # stays a rigid transform
    np.testing.assert_allclose(mid[:3, :3] @ mid[:3, :3].T, np.eye(3), atol=1e-8)
    np.testing.assert_allclose(mid[:3, 3], (a[:3, 3] + b[:3, 3]) / 2, atol=1e-8)
    assert mid[3, 3] == 1.0


def test_interpolate_intrinsics():
    a = np.diag([100.0, 100.0, 1.0])
    b = np.diag([200.0, 200.0, 1.0])
    np.testing.assert_allclose(interpolate_intrinsics(a, b, 0.5),
                               np.diag([150.0, 150.0, 1.0]))


def test_generate_wobble():
    tf = np.eye(4)[None]
    t = np.linspace(0, 1, 5)
    out = generate_wobble(tf, t)
    assert out.shape == (1, 5, 4, 4)
    # at t=0 the wobble is the identity offset
    np.testing.assert_allclose(out[0, 0], np.eye(4), atol=1e-7)


def test_reproj_identity_camera():
    """Reprojecting into the same camera must return each pixel itself."""
    h, w, n = 6, 8, 4
    steps = np.tile(np.linspace(1.0, 2.0, n), (h, w, 1))
    weights = np.zeros((h, w, n))
    weights[..., 2] = 1.0
    intr = np.array([[50.0, 0, w / 2], [0, 50.0, h / 2], [0, 0, 1]])
    c2w = np.eye(4)
    xy = reproj_best(steps, weights, c2w, c2w, intr)
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    np.testing.assert_array_equal(xy[..., 0], xs)
    np.testing.assert_array_equal(xy[..., 1], ys)


def test_cosine_smooth_and_pingpong():
    assert cosine_smooth(0.0) == pytest.approx(0.0, abs=1e-12)
    assert cosine_smooth(1.0) == pytest.approx(1.0, abs=1e-12)
    assert cosine_smooth(0.5) == pytest.approx(0.5, abs=1e-12)
    video = np.arange(4)[:, None, None, None] * np.ones((4, 2, 2, 3))
    looped = ping_pong(video)
    assert looped.shape[0] == 8
    np.testing.assert_array_equal(looped[4], video[3])


def test_render_interpolated_view_tiny():
    """End-to-end validation-video path: interpolated cameras -> patch render
    -> colormapped uint8 videos (model_wrapper.py:213-387)."""
    import jax
    import jax.numpy as jnp

    from neural_jacobian_field_tpu.visualization import render_interpolated_view
    from tests.test_model import eval_ctx, tiny_cfg, tiny_inputs
    from neural_jacobian_field_tpu.models import Model

    model = Model(cfg=tiny_cfg("jacobian_mlp"))
    mi = tiny_inputs(jax.random.PRNGKey(0), batch=1, rays=4, hw=32)
    variables = model.init(jax.random.PRNGKey(1), mi, eval_ctx(), train=False)

    c2w_b = np.eye(4, dtype=np.float32)
    c2w_b[:3, 3] = [0.1, 0.0, -0.2]
    videos = render_interpolated_view(
        model, variables,
        ctxt_rgb=np.asarray(mi.camera_input.input_image),
        ctxt_extrinsics=np.eye(4, dtype=np.float32)[None],
        ctxt_intrinsics=np.asarray(mi.camera_input.ctxt_intrinsics),
        trgt_extrinsics=c2w_b[None],
        trgt_intrinsics=np.asarray(mi.camera_input.trgt_intrinsics),
        robot_action=np.zeros((1, 5), np.float32),
        near=0.5, far=10.0, num_frames=3, height=16, width=16, patch_size=64,
    )
    for name in ("rgb", "depth", "optical_flow"):
        assert videos[name].shape == (3, 16, 16, 3), name
        assert videos[name].dtype == np.uint8
