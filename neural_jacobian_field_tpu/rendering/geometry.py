"""Camera / ray geometry (pure JAX).

Re-implementation of the reference's rendering/geometry.py (all pure tensor
math there too). Conventions match exactly:
  - intrinsics are *normalized* (pixel coords in [0, 1]) unless stated;
  - extrinsics are OpenCV-style camera-to-world 4x4;
  - projection z-divides with eps 1e-9 (geometry.py:137-154);
  - get_world_rays_with_z returns the camera-space unit-direction z component
    used to convert z-depth <-> ray-distance (geometry.py:170-203).
"""

import jax
import jax.numpy as jnp

# Camera math is negligible FLOPs but precision-sensitive (matrix inverses,
# projective divides); pin f32 MXU passes so TPU's default bf16 matmul doesn't
# smear pixel coordinates. The model's hot matmuls are unaffected.
_HI = jax.lax.Precision.HIGHEST


def homogenize_points(points: jax.Array) -> jax.Array:
    """(..., n) xyz -> (..., n+1) xyz1 (geometry.py:32-34)."""
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


def homogenize_vecs(vectors: jax.Array) -> jax.Array:
    """(..., n) xyz -> (..., n+1) xyz0 (geometry.py:37-39)."""
    return jnp.concatenate([vectors, jnp.zeros_like(vectors[..., :1])], axis=-1)


def transform_rigid(homogeneous_xyz: jax.Array, transformation: jax.Array) -> jax.Array:
    """Apply 4x4 transforms: [..., i, j] @ [..., j] (geometry.py:76-81)."""
    return jnp.einsum("...ij,...j->...i", transformation, homogeneous_xyz, precision=_HI)


def transform_world2cam(homogeneous_world_xyz: jax.Array, cam2world: jax.Array) -> jax.Array:
    return transform_rigid(homogeneous_world_xyz, jnp.linalg.inv(cam2world))


def transform_cam2world(homogeneous_cam_xyz: jax.Array, cam2world: jax.Array) -> jax.Array:
    return transform_rigid(homogeneous_cam_xyz, cam2world)


def unproject(coordinates_xy: jax.Array, z: jax.Array, intrinsics: jax.Array) -> jax.Array:
    """Unproject normalized 2D coords at depth z (geometry.py:42-56).

    coordinates_xy: [B, N, 2]; z: [B, N]; intrinsics: [B, 3, 3].
    """
    coords_h = homogenize_points(coordinates_xy)
    k_inv = jnp.linalg.inv(intrinsics)
    coords_xyz = jnp.einsum("bij,bnj->bni", k_inv, coords_h, precision=_HI)
    return coords_xyz * z[..., None]


def project_z_divide(xyz_cam_hom: jax.Array, intrinsics: jax.Array, eps: float = 1e-9):
    """Project homogeneous camera-space points to pixel coords
    (geometry.py:137-154 `deprecated_project`). Returns (xyw[..., 3], z)."""
    xyw = jnp.einsum("...ij,...j->...i", intrinsics, xyz_cam_hom[..., :3], precision=_HI)
    z = xyw[..., -1:]
    xyw = xyw / (z + eps)
    return xyw[..., :3], z


def get_world_rays(coordinates_xy: jax.Array, intrinsics: jax.Array, cam2world: jax.Array):
    """Normalized pixel coords -> world-space (origins, unit directions)
    (geometry.py:84-114). coordinates_xy: [B, N, 2]."""
    origins, directions, _ = get_world_rays_with_z(coordinates_xy, intrinsics, cam2world)
    return origins, directions


def get_world_rays_with_z(coordinates_xy: jax.Array, intrinsics: jax.Array, cam2world: jax.Array):
    """Like get_world_rays but also returns the camera-space direction z
    component for z-depth normalization (geometry.py:170-203).

    Returns origins [B, N, 3], directions [B, N, 3], z [B, N, 1].
    """
    origins = cam2world[..., :3, 3]

    directions = unproject(coordinates_xy, jnp.ones_like(coordinates_xy[..., 0]), intrinsics)
    directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    z = directions[..., -1:]

    directions = homogenize_vecs(directions)
    directions = transform_cam2world(directions, cam2world[:, None])

    num_rays = directions.shape[1]
    origins = jnp.broadcast_to(origins[:, None, :], (*origins.shape[:-1], num_rays, 3))

    return origins, directions[..., :3], z


def get_pixel_coordinates(height: int, width: int):
    """Normalized (0..1, pixel-center) xy grid + integer yx selector grid
    (geometry.py:117-134). Returns (coordinates [H, W, 2], selector [H, W, 2])."""
    row = jnp.arange(height)
    col = jnp.arange(width)
    selector = jnp.stack(jnp.meshgrid(row, col, indexing="ij"), axis=-1)

    x = (col + 0.5) / width
    y = (row + 0.5) / height
    coordinates = jnp.stack(jnp.meshgrid(x, y, indexing="xy"), axis=-1)
    return coordinates.astype(jnp.float32), selector


def project_world_coords_to_camera(
    coords_3d_world: jax.Array, cam2world: jax.Array, intrinsics: jax.Array
) -> jax.Array:
    """World points -> pixel coords in the units of `intrinsics`
    (geometry.py:206-215). coords: [B, N, 3]; returns [B, N, 2]."""
    c3d_hom = homogenize_points(coords_3d_world)
    c3d_cam = transform_world2cam(c3d_hom, cam2world[..., None, :, :])
    c2d, _ = project_z_divide(c3d_cam, intrinsics[..., None, :, :])
    return c2d[..., :2]


def compute_focus_point(ray_origins: jax.Array, ray_directions: jax.Array) -> jax.Array:
    """Least-squares intersection of rays (geometry.py:9-29).

    ray_origins/ray_directions: [N, 3]. Returns [3].
    """
    n = jnp.einsum("...i,...j->...ij", ray_directions, ray_directions)
    n = n - jnp.eye(3, dtype=ray_origins.dtype)[None]
    lhs = jnp.sum(n, axis=0)
    rhs = jnp.sum(jnp.einsum("bij,bj->bi", n, ray_origins, precision=_HI), axis=0)
    return jnp.linalg.pinv(lhs) @ rhs
