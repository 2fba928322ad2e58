"""Device-side batch preparation: ray subsampling + target packing.

Re-design of the reference's ModelWrapper.prepare_training_input_output
(models/model_wrapper.py:437-551) as a pure jittable function. The host
pipeline ships whole images; pixel subsampling, ray generation, and z-depth
normalization all happen on device inside the train step (one fused gather —
cheaper than host-side indexing and keeps the host loop trivial).

Conventions preserved:
  - one shared random pixel set across the batch (model_wrapper.py:437-444);
  - depth targets divided by the camera-space unit-direction z component
    (z-depth -> ray-distance, model_wrapper.py:509-516);
  - trgt intrinsics in CameraInput are denormalized to pixel units so the
    rendered optical flow is in pixels (model_wrapper.py:525-535);
  - tracks mode gathers rays at `pixel_selector` with a visibility mask
    (model_wrapper.py:478-507).
"""

from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from ..models.model import (
    CameraInput,
    ModelInput,
    ModelTarget,
    RenderingInput,
    RobotInput,
)
from ..rendering.geometry import get_pixel_coordinates, get_world_rays_with_z


@flax.struct.dataclass
class RawBatch:
    """One training batch as shipped by the host pipeline (whole images).

    Mirrors the reference's nested batch dict (data/dataset/dataset.py:391-459)
    flattened into a typed pytree. Optional supervision is None (a static
    pytree hole) when the mode doesn't use it.
    """

    ctxt_rgb: jax.Array  # [B, H, W, 3]
    ctxt_extrinsics: jax.Array  # [B, 4, 4]
    ctxt_intrinsics: jax.Array  # [B, 3, 3] normalized
    robot_action: jax.Array  # [B, A]
    trgt_rgb: jax.Array  # [B, H, W, 3]
    trgt_depth: jax.Array  # [B, H, W, 1] z-depth
    trgt_extrinsics: jax.Array  # [B, 4, 4]
    trgt_intrinsics: jax.Array  # [B, 3, 3] normalized
    near: jax.Array  # [B]
    far: jax.Array  # [B]
    flow: Optional[jax.Array] = None  # [B, H, W, 2] (action/optical_flow mode)
    pixel_selector: Optional[jax.Array] = None  # [B, N] flat h*w indices (tracks)
    pixel_motion: Optional[jax.Array] = None  # [B, N, 2] (tracks)
    pixel_visible_mask: Optional[jax.Array] = None  # [B, N] (tracks)


def denormalize_intrinsics(intrinsics: jax.Array, height: int, width: int) -> jax.Array:
    """Normalized [0,1] intrinsics -> pixel units (utils/convention.py:110-125)."""
    scale = jnp.array(
        [[width, 1.0, width], [1.0, height, height], [1.0, 1.0, 1.0]],
        dtype=intrinsics.dtype,
    )
    return intrinsics * scale


def prepare_training_batch(
    key: jax.Array,
    batch: RawBatch,
    rays_per_batch: int,
    mode: str = "perception",
) -> Tuple[ModelInput, ModelTarget]:
    """Subsample rays and pack typed model inputs/targets.

    mode: "perception" | "action". Tracks supervision is selected by the
    presence of batch.pixel_selector (static pytree structure).
    """
    # uint8 wire format: the loader's native fast path ships RGB as uint8
    # (4x fewer host->device bytes — the axon tunnel moves ~120 MB/s, so a
    # f32 480x640 batch alone would cost ~0.4 s/step); normalize on device.
    if batch.ctxt_rgb.dtype == jnp.uint8:
        batch = batch.replace(
            ctxt_rgb=batch.ctxt_rgb.astype(jnp.float32) / 255.0,
            trgt_rgb=batch.trgt_rgb.astype(jnp.float32) / 255.0,
        )
    b, h, w = batch.trgt_rgb.shape[:3]
    coords_full, _ = get_pixel_coordinates(h, w)  # [H, W, 2] normalized
    coords_full = jnp.broadcast_to(coords_full[None], (b, h, w, 2)).reshape(b, h * w, 2)
    rgb_flat = batch.trgt_rgb.reshape(b, h * w, 3)
    depth_flat = batch.trgt_depth.reshape(b, h * w, 1)

    trgt_flow = None
    visible_mask = None

    use_tracks = mode == "action" and batch.pixel_selector is not None
    if use_tracks:
        sel = batch.pixel_selector  # [B, N]
        take = lambda x: jnp.take_along_axis(x, sel[..., None], axis=1)
        trgt_rgb = take(rgb_flat)
        trgt_depth = take(depth_flat)
        coordinates = take(coords_full)
        trgt_flow = batch.pixel_motion
        visible_mask = batch.pixel_visible_mask
    else:
        # one pixel set shared across the batch (model_wrapper.py:437-444)
        yx = jax.random.uniform(key, (rays_per_batch, 2)) * jnp.array([h, w], jnp.float32)
        yx = yx.astype(jnp.int32)
        flat_idx = yx[:, 0] * w + yx[:, 1]  # [R]
        sel = jnp.broadcast_to(flat_idx[None], (b, rays_per_batch))
        take = lambda x: jnp.take_along_axis(x, sel[..., None], axis=1)
        trgt_rgb = take(rgb_flat)
        trgt_depth = take(depth_flat)
        coordinates = take(coords_full)
        if mode == "action":
            trgt_flow = take(batch.flow.reshape(b, h * w, 2))

    origins, directions, z_values = get_world_rays_with_z(
        coordinates, batch.trgt_intrinsics, batch.trgt_extrinsics
    )
    trgt_depth = trgt_depth / z_values

    model_input = ModelInput(
        camera_input=CameraInput(
            input_image=batch.ctxt_rgb,
            ctxt_extrinsics=batch.ctxt_extrinsics,
            ctxt_intrinsics=batch.ctxt_intrinsics,
            trgt_extrinsics=batch.trgt_extrinsics,
            trgt_intrinsics=denormalize_intrinsics(batch.trgt_intrinsics, h, w),
        ),
        rendering_input=RenderingInput(
            origins=origins, directions=directions,
            z_near=batch.near, z_far=batch.far,
        ),
        robot_input=RobotInput(robot_action=batch.robot_action),
    )
    model_target = ModelTarget(
        rgb=trgt_rgb, depth=trgt_depth,
        optical_flow=trgt_flow, visible_mask=visible_mask,
    )
    return model_input, model_target
