"""Tests for camera/ray geometry: round trips + golden values."""

import jax
import jax.numpy as jnp
import numpy as np

from neural_jacobian_field_tpu.rendering.geometry import (
    compute_focus_point,
    get_pixel_coordinates,
    get_world_rays_with_z,
    homogenize_points,
    project_world_coords_to_camera,
    project_z_divide,
    transform_world2cam,
    unproject,
)


def _look_at_cam2world(eye, target, up=np.array([0.0, 0.0, 1.0])):
    """OpenCV convention: +z forward, +x right, +y down."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, down, fwd, eye
    return c2w


NORMALIZED_K = np.array(
    [[1.2, 0.0, 0.5], [0.0, 1.6, 0.5], [0.0, 0.0, 1.0]], dtype=np.float32
)


class TestProjection:
    def test_project_unproject_roundtrip(self):
        k = jnp.asarray(NORMALIZED_K)[None]
        xy = jnp.array([[[0.3, 0.7], [0.5, 0.5], [0.9, 0.1]]])
        z = jnp.array([[1.5, 2.0, 3.0]])
        pts_cam = unproject(xy, z, k)
        xyw, z_out = project_z_divide(homogenize_points(pts_cam), k[:, None])
        np.testing.assert_allclose(np.asarray(xyw[..., :2]), np.asarray(xy), atol=1e-5)
        np.testing.assert_allclose(np.asarray(z_out[..., 0]), np.asarray(z), rtol=1e-5)

    def test_world_roundtrip_through_camera(self):
        c2w = jnp.asarray(_look_at_cam2world(np.array([2.0, -1.0, 1.0]), np.zeros(3)))[None]
        k = jnp.asarray(NORMALIZED_K)[None]
        pts = jnp.array([[[0.1, 0.2, 0.0], [-0.3, 0.1, 0.4]]])
        uv = project_world_coords_to_camera(pts, c2w, k)
        # unproject back at the camera-space depth
        cam = transform_world2cam(homogenize_points(pts), c2w[:, None])
        depth = cam[..., 2]
        pts_cam2 = unproject(uv, depth, k)
        np.testing.assert_allclose(np.asarray(pts_cam2), np.asarray(cam[..., :3]), atol=1e-4)


class TestRays:
    def test_directions_unit_norm_and_z(self):
        c2w = jnp.asarray(_look_at_cam2world(np.array([0.0, -3.0, 1.0]), np.zeros(3)))[None]
        k = jnp.asarray(NORMALIZED_K)[None]
        coords, _ = get_pixel_coordinates(4, 6)
        coords = coords.reshape(1, -1, 2)
        origins, dirs, z = get_world_rays_with_z(coords, k, c2w)
        assert origins.shape == dirs.shape == (1, 24, 3)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(dirs), axis=-1), 1.0, rtol=1e-5)
        # z is the camera-space unit-direction z, in (0, 1]
        zz = np.asarray(z)
        assert (zz > 0).all() and (zz <= 1 + 1e-6).all()
        # origins are the camera center
        np.testing.assert_allclose(np.asarray(origins[0, 0]), [0.0, -3.0, 1.0], atol=1e-6)

    def test_center_pixel_looks_forward(self):
        c2w = jnp.eye(4)[None]
        k = jnp.asarray(NORMALIZED_K)[None]
        coords = jnp.array([[[0.5, 0.5]]])  # principal point
        _, dirs, z = get_world_rays_with_z(coords, k, c2w)
        np.testing.assert_allclose(np.asarray(dirs[0, 0]), [0.0, 0.0, 1.0], atol=1e-6)
        np.testing.assert_allclose(float(z[0, 0, 0]), 1.0, atol=1e-6)

    def test_rays_reach_projected_point(self):
        """A world point projected to a pixel, then that pixel's ray marched by
        the camera depth, must land back on the point."""
        c2w = jnp.asarray(_look_at_cam2world(np.array([1.0, 2.0, 3.0]), np.zeros(3)))[None]
        k = jnp.asarray(NORMALIZED_K)[None]
        pt = jnp.array([[[0.2, -0.1, 0.3]]])
        uv = project_world_coords_to_camera(pt, c2w, k)
        origins, dirs, z = get_world_rays_with_z(uv, k, c2w)
        cam = transform_world2cam(homogenize_points(pt), c2w[:, None])
        t = cam[..., 2] / z[..., 0]  # ray distance = z-depth / dir_z
        hit = origins + dirs * t[..., None]
        np.testing.assert_allclose(np.asarray(hit), np.asarray(pt), atol=1e-4)


class TestPixelCoordinates:
    def test_grid(self):
        coords, selector = get_pixel_coordinates(2, 3)
        assert coords.shape == (2, 3, 2) and selector.shape == (2, 3, 2)
        np.testing.assert_allclose(np.asarray(coords[0, 0]), [0.5 / 3, 0.25])
        np.testing.assert_array_equal(np.asarray(selector[1, 2]), [1, 2])


class TestFocusPoint:
    def test_recovers_intersection(self):
        target = np.array([0.3, -0.2, 0.5], dtype=np.float32)
        rng = np.random.default_rng(0)
        origins = rng.normal(size=(16, 3)).astype(np.float32) * 3
        dirs = target - origins
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        got = compute_focus_point(jnp.asarray(origins), jnp.asarray(dirs))
        np.testing.assert_allclose(np.asarray(got), target, atol=1e-4)
