"""Whole-image chunked rendering (patch_render) + image-space colormaps.

Re-design of the reference's Model.patch_render (models/model.py:527-628):
instead of a Python loop appending tensors, rays are reshaped into static
[num_patches, patch_size] chunks and swept with `jax.lax.map` inside ONE jit —
constant memory (the OOM control the chunking exists for) with no per-patch
dispatch overhead. Colormaps (depth turbo, flow->RGB wheel) replace
nerfstudio's apply_depth_colormap and torchvision's flow_to_image.
"""

from functools import partial
from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..models.model import (
    CameraInput,
    Model,
    RenderingInput,
    RobotInput,
    StepCtx,
)
from ..rendering.geometry import get_pixel_coordinates, get_world_rays


@flax.struct.dataclass
class RenderingOutput:
    """models/model.py:137-147 (raw arrays; colormapped views computed on
    host via depth_colormap/flow_to_rgb)."""

    rgb: jax.Array  # [B, H, W, 3]
    depth_raw: jax.Array  # [B, H, W, 1]
    flow_raw: jax.Array  # [B, H, W, 2]
    action_features: jax.Array  # [B, H, W, A*3]
    ray_positions: jax.Array  # [B, H, W, 3]
    ray_positions_warped: jax.Array  # [B, H, W, 3]
    weights: jax.Array  # [B, H, W, S]
    steps: jax.Array  # [B, H, W, S]


def _composite_patch(mdl, camera_input: CameraInput, ray_samples, positions, dec):
    """Shared per-patch composite: weights + rgb/depth/flow/feature
    reductions (reference models/model.py:257-314). A fused Pallas composite
    (K3) was wired here and measured 6% SLOWER than XLA's own fusion of this
    chain, then removed — see benchmarks/RESULTS.md r2."""
    steps = (ray_samples.starts + ray_samples.ends) / 2
    weights = ray_samples.get_weights(dec.density)
    rgb = jnp.sum(weights * dec.color, axis=-2)
    depth = jnp.sum(weights * steps, axis=-2) / (jnp.sum(weights, axis=-2) + 1e-10)
    depth = jnp.clip(depth, jnp.min(steps), jnp.max(steps))
    flow, pos, pos_warped = mdl.render_optical_flow(
        weights, positions, dec.flow[..., :3],
        camera_input.trgt_extrinsics, camera_input.trgt_intrinsics,
    )
    feats = jnp.sum(weights * dec.action_features, axis=-2)
    return (rgb, depth, flow, feats, pos, pos_warped,
            weights[..., 0], steps[..., 0])


def camera_rays(height: int, width: int, intrinsics: jax.Array,
                cam2world: jax.Array):
    """Full-image ray grid for a [B] camera batch. Returns ([B, H*W, 3] x2)."""
    coords, _ = get_pixel_coordinates(height, width)
    coords = coords.reshape(1, height * width, 2)
    coords = jnp.broadcast_to(coords, (cam2world.shape[0], height * width, 2))
    return get_world_rays(coords, intrinsics, cam2world)


@partial(jax.jit, static_argnames=("model", "patch_size", "render_height", "render_width"))
def patch_render(
    model: Model,
    variables,
    camera_input: CameraInput,
    rendering_input: RenderingInput,
    robot_input: RobotInput,
    key: jax.Array,
    patch_size: int = 2048,
    render_height: int = 480,
    render_width: int = 640,
) -> RenderingOutput:
    """Chunked full-image render (models/model.py:527-628). The ray count must
    equal render_height*render_width and be padded to a multiple of
    patch_size by the caller helper `render_camera`."""
    num_rays = rendering_input.origins.shape[1]
    assert num_rays % patch_size == 0, "pad rays to a multiple of patch_size"
    num_patches = num_rays // patch_size
    b = rendering_input.origins.shape[0]

    # Encode the context image ONCE, outside the chunk sweep.
    pixel_encoding = model.apply(
        variables, camera_input, robot_input,
        method=Model.compute_pixel_encoding,
    )
    ctx = StepCtx(key=key, anneal=jnp.asarray(1.0), updated=jnp.asarray(True))

    def render_patch(chunk):
        origins, directions = chunk
        ri = RenderingInput(origins=origins, directions=directions,
                            z_near=rendering_input.z_near,
                            z_far=rendering_input.z_far)

        def fwd(mdl):
            ray_bundle = mdl.compute_ray_bundle(ri)
            enc = mdl.attach_ray_features(pixel_encoding, ray_bundle)
            (ray_samples, positions, dirs, _, _) = mdl.compute_proposal(
                ray_bundle, enc, ctx, stratified=False
            )
            dec = mdl.decoder(positions, dirs, enc)
            return _composite_patch(mdl, camera_input, ray_samples, positions, dec)

        return model.apply(variables, method=lambda mdl: fwd(mdl))

    chunks = (
        rendering_input.origins.reshape(b, num_patches, patch_size, 3).swapaxes(0, 1),
        rendering_input.directions.reshape(b, num_patches, patch_size, 3).swapaxes(0, 1),
    )
    results = jax.lax.map(render_patch, chunks)

    def unchunk(x):
        x = x.swapaxes(0, 1).reshape(b, num_rays, *x.shape[3:])
        x = x[:, : render_height * render_width]
        return x.reshape(b, render_height, render_width, *x.shape[2:])

    rgb, depth, flow, feats, pos, pos_warped, weights, steps = results
    return RenderingOutput(
        rgb=unchunk(rgb), depth_raw=unchunk(depth), flow_raw=unchunk(flow),
        action_features=unchunk(feats), ray_positions=unchunk(pos),
        ray_positions_warped=unchunk(pos_warped), weights=unchunk(weights),
        steps=unchunk(steps),
    )


@partial(jax.jit, static_argnames=("model",))
def _render_one_patch(model: Model, variables, camera_input: CameraInput,
                      pixel_encoding, origins, directions, z_near, z_far, key):
    """One jitted patch program (host-loop mode): proposal + decode +
    composite for a single ray chunk, context encoding precomputed."""
    ri = RenderingInput(origins=origins, directions=directions,
                        z_near=z_near, z_far=z_far)
    ctx = StepCtx(key=key, anneal=jnp.asarray(1.0), updated=jnp.asarray(True))

    def fwd(mdl):
        ray_bundle = mdl.compute_ray_bundle(ri)
        enc = mdl.attach_ray_features(pixel_encoding, ray_bundle)
        ray_samples, positions, dirs, _, _ = mdl.compute_proposal(
            ray_bundle, enc, ctx, stratified=False)
        dec = mdl.decoder(positions, dirs, enc)
        return _composite_patch(mdl, camera_input, ray_samples, positions, dec)

    return model.apply(variables, method=lambda mdl: fwd(mdl))


def render_camera_host_loop(model: Model, variables, camera_input: CameraInput,
                            robot_input: RobotInput, z_near, z_far, height: int,
                            width: int, key: Optional[jax.Array] = None,
                            patch_size: int = 2048) -> RenderingOutput:
    """Full-image render dispatching one small jitted program per patch (the
    reference's Python-loop strategy, models/model.py:561-596). Same output
    as render_camera; preferable where very large single programs are
    undesirable (remote compile services, memory-limited compiles)."""
    b = camera_input.trgt_extrinsics.shape[0]
    intr = camera_input.trgt_intrinsics
    norm = jnp.array([[1.0 / width, 1.0, 1.0 / width],
                      [1.0, 1.0 / height, 1.0 / height],
                      [1.0, 1.0, 1.0]])
    intr_n = jnp.where(intr[:, 0:1, 0:1] > 2.0, intr * norm, intr)
    origins, directions = camera_rays(height, width, intr_n,
                                      camera_input.trgt_extrinsics)
    num_rays = origins.shape[1]
    pad = (-num_rays) % patch_size
    if pad:
        origins = jnp.concatenate([origins, origins[:, :pad]], axis=1)
        directions = jnp.concatenate([directions, directions[:, :pad]], axis=1)
    if key is None:
        key = jax.random.PRNGKey(0)
    z_near_arr = jnp.broadcast_to(jnp.asarray(z_near), (b,))
    z_far_arr = jnp.broadcast_to(jnp.asarray(z_far), (b,))

    pixel_encoding = model.apply(variables, camera_input, robot_input,
                                 method=Model.compute_pixel_encoding)
    chunks = []
    for start in range(0, origins.shape[1], patch_size):
        chunks.append(_render_one_patch(
            model, variables, camera_input, pixel_encoding,
            origins[:, start:start + patch_size],
            directions[:, start:start + patch_size],
            z_near_arr, z_far_arr, key))
    parts = [jnp.concatenate(x, axis=1)[:, :height * width] for x in zip(*chunks)]

    def reshape(x):
        return x.reshape(b, height, width, *x.shape[2:])

    rgb, depth, flow, feats, pos, pos_warped, weights, steps = map(reshape, parts)
    return RenderingOutput(rgb=rgb, depth_raw=depth, flow_raw=flow,
                           action_features=feats, ray_positions=pos,
                           ray_positions_warped=pos_warped, weights=weights,
                           steps=steps)


def render_camera(model: Model, variables, camera_input: CameraInput,
                  robot_input: RobotInput, z_near, z_far, height: int, width: int,
                  key: Optional[jax.Array] = None,
                  patch_size: int = 2048) -> RenderingOutput:
    """Convenience wrapper: build full-image rays from the TARGET camera
    (normalized intrinsics expected on camera_input.ctxt for encoding; pass a
    separate normalized trgt intrinsics for rays via this helper's argument
    convention — see notebooks 1-2)."""
    b = camera_input.trgt_extrinsics.shape[0]
    # rays come from the *target* camera in normalized units
    intr = camera_input.trgt_intrinsics
    # if intrinsics look denormalized (fx >> 1), normalize for ray generation
    norm = jnp.array([[1.0 / width, 1.0, 1.0 / width],
                      [1.0, 1.0 / height, 1.0 / height],
                      [1.0, 1.0, 1.0]])
    intr_n = jnp.where(intr[:, 0:1, 0:1] > 2.0, intr * norm, intr)
    origins, directions = camera_rays(height, width, intr_n,
                                      camera_input.trgt_extrinsics)
    num_rays = origins.shape[1]
    pad = (-num_rays) % patch_size
    if pad:
        origins = jnp.concatenate([origins, origins[:, :pad]], axis=1)
        directions = jnp.concatenate([directions, directions[:, :pad]], axis=1)
    ri = RenderingInput(
        origins=origins, directions=directions,
        z_near=jnp.broadcast_to(jnp.asarray(z_near), (b,)),
        z_far=jnp.broadcast_to(jnp.asarray(z_far), (b,)),
    )
    if key is None:
        key = jax.random.PRNGKey(0)
    try:
        return patch_render(model, variables, camera_input, ri, robot_input, key,
                            patch_size=patch_size, render_height=height,
                            render_width=width)
    except jax.errors.JaxRuntimeError as e:
        # very large monolithic programs can exceed compile-service / HBM
        # limits (e.g. remote-TPU compile helpers); the host-loop path renders
        # the same image with one small program per patch
        if "compile" not in str(e).lower() and "memory" not in str(e).lower():
            raise
        print(f"render_camera: monolithic program failed to build "
              f"({str(e).splitlines()[0][:80]}...); falling back to host-loop "
              f"patch dispatch")
        return render_camera_host_loop(model, variables, camera_input,
                                       robot_input, z_near, z_far, height,
                                       width, key=key, patch_size=patch_size)


# -- host-side colormaps -------------------------------------------------------


def depth_colormap(depth: np.ndarray, near=None, far=None) -> np.ndarray:
    """Turbo-colormapped depth image (nerfstudio apply_depth_colormap).

    depth: [..., 1] or [...]. Returns uint8 [..., 3].
    """
    import matplotlib

    d = np.asarray(depth)
    if d.shape[-1] == 1:
        d = d[..., 0]
    lo = np.min(d) if near is None else near
    hi = np.max(d) if far is None else far
    x = np.clip((d - lo) / (hi - lo + 1e-10), 0, 1)
    return (matplotlib.colormaps["turbo"](x)[..., :3] * 255).astype(np.uint8)


def flow_to_rgb(flow: np.ndarray, max_norm: Optional[float] = None) -> np.ndarray:
    """Optical-flow color wheel (torchvision flow_to_image semantics:
    hue = direction, saturation = magnitude). flow: [..., 2] -> uint8 [..., 3]."""
    import colorsys

    f = np.asarray(flow, dtype=np.float64)
    mag = np.linalg.norm(f, axis=-1)
    if max_norm is None:
        max_norm = max(float(mag.max()), 1e-8)
    ang = (np.arctan2(-f[..., 1], -f[..., 0]) + np.pi) / (2 * np.pi)  # [0,1)
    sat = np.clip(mag / max_norm, 0, 1)
    h = ang
    # vectorized HSV -> RGB (value=1)
    i = np.floor(h * 6).astype(int) % 6
    frac = h * 6 - np.floor(h * 6)
    p = 1 - sat
    q = 1 - sat * frac
    t = 1 - sat * (1 - frac)
    one = np.ones_like(sat)
    lut = np.stack([
        np.stack([one, t, p], -1), np.stack([q, one, p], -1),
        np.stack([p, one, t], -1), np.stack([p, q, one], -1),
        np.stack([t, p, one], -1), np.stack([one, p, q], -1),
    ], 0)
    rgb = np.take_along_axis(lut, i[None, ..., None], axis=0)[0]
    return (rgb * 255).astype(np.uint8)


def render_camera_sharded(model: Model, variables, camera_input: CameraInput,
                          robot_input: RobotInput, z_near, z_far, height: int,
                          width: int, mesh, key: Optional[jax.Array] = None,
                          patch_size: int = 2048) -> RenderingOutput:
    """Multi-chip whole-image render: rays shard over the mesh's "data" axis
    (volume rendering is embarrassingly parallel over rays — SURVEY.md §5
    long-context note), params/context encoding replicate, jit partitions the
    per-ray math with zero collectives until the final gather.

    patch_size applies PER DEVICE (each shard sweeps its rays in chunks)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = mesh.devices.size
    b = camera_input.trgt_extrinsics.shape[0]
    intr = camera_input.trgt_intrinsics
    norm = jnp.array([[1.0 / width, 1.0, 1.0 / width],
                      [1.0, 1.0 / height, 1.0 / height],
                      [1.0, 1.0, 1.0]])
    intr_n = jnp.where(intr[:, 0:1, 0:1] > 2.0, intr * norm, intr)
    origins, directions = camera_rays(height, width, intr_n,
                                      camera_input.trgt_extrinsics)
    num_rays = origins.shape[1]
    # pad so rays divide by devices * patch_size
    quantum = n_dev * patch_size
    pad = (-num_rays) % quantum
    if pad:
        origins = jnp.concatenate([origins, origins[:, :pad]], axis=1)
        directions = jnp.concatenate([directions, directions[:, :pad]], axis=1)

    ray_sharding = NamedSharding(mesh, P(None, "data", None))
    rep = NamedSharding(mesh, P())
    origins = jax.device_put(origins, ray_sharding)
    directions = jax.device_put(directions, ray_sharding)
    variables = jax.device_put(variables, rep)
    camera_input = jax.device_put(camera_input, rep)
    robot_input = jax.device_put(robot_input, rep)

    ri = RenderingInput(
        origins=origins, directions=directions,
        z_near=jnp.broadcast_to(jnp.asarray(z_near), (b,)),
        z_far=jnp.broadcast_to(jnp.asarray(z_far), (b,)),
    )
    if key is None:
        key = jax.random.PRNGKey(0)
    return patch_render(model, variables, camera_input, ri, robot_input, key,
                        patch_size=patch_size * n_dev, render_height=height,
                        render_width=width)
