"""Pixel-aligned feature projection.

Replaces the reference's model_components/pixel_aligned_features.py:11-35:
project world points into the context camera (world2cam, intrinsics z-divide),
map normalized [0,1] pixel coords to [-1,1], bilinearly sample the feature map
(align_corners=True, border padding), and return (features, camera-space xyz,
normalized uv).

TPU design: the feature map is NHWC (channels-last — the native TPU layout)
and the bilinear lookup is the fused gather+lerp in ops/grid_sample.py; the
projection matmuls are tiny and fuse into the surrounding graph.
"""

from typing import Tuple, Union

import jax
import jax.numpy as jnp

from ..ops.epipolar import RayKnots, knot_features
from ..ops.grid_sample import grid_sample_bilinear
from ..ops.pixel_gather import PackedPyramid, pyramid_pixel_features
from ..rendering.geometry import (
    homogenize_points,
    project_z_divide,
    transform_world2cam,
)


def get_pixel_aligned_features(
    coords_3d_world: jax.Array,
    cam2world: jax.Array,
    intrinsics: jax.Array,
    img_features: Union[jax.Array, PackedPyramid, RayKnots],
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Args:
      coords_3d_world: [B, N, 3] world points.
      cam2world: [B, 4, 4] context camera pose (OpenCV cam-to-world).
      intrinsics: [B, 3, 3] *normalized* intrinsics (pixels in [0, 1]).
      img_features: [B, Hf, Wf, C] context feature map (NHWC), the K1
        PackedPyramid layout (ops/pixel_gather.py) sampled level-by-level at
        native resolutions, or K1b RayKnots (ops/epipolar.py) interpolating
        per-ray epipolar knot textures (no per-sample gather).

    Returns:
      features [B, N, C] — as a lazy KnotFeatures in the epipolar path
      (ResnetFC trunks project the knots before interpolating, skipping
      both the [N, 512] concat and the sample-sized lin_z contraction;
      other consumers call .concat()) — plus camera-space xyz [B, N, 3]
      and uv [B, N, 3] (normalized homogeneous pixel coords, matching the
      reference's return).
    """
    c3d_world_hom = homogenize_points(coords_3d_world)
    c3d_cam_hom = transform_world2cam(c3d_world_hom, cam2world[:, None])
    c2d_cam, _ = project_z_divide(c3d_cam_hom, intrinsics[:, None])

    if isinstance(img_features, RayKnots):
        hf, wf = img_features.fine_hw
        fx = c2d_cam[..., 0] * (wf - 1)
        fy = c2d_cam[..., 1] * (hf - 1)
        feats = knot_features(img_features, fx, fy)
    elif isinstance(img_features, PackedPyramid):
        hf, wf = img_features.fine_hw
        fx = c2d_cam[..., 0] * (wf - 1)
        fy = c2d_cam[..., 1] * (hf - 1)
        feats = pyramid_pixel_features(img_features, fx, fy)
    else:
        # [0, 1] -> [-1, 1] for the align_corners=True bilinear lookup.
        c2d_norm = (c2d_cam[..., :2] - 0.5) * 2.0
        feats = grid_sample_bilinear(img_features, c2d_norm)

    return feats, c3d_cam_hom[..., :3], c2d_cam
