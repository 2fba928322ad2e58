"""Bilinear feature lookup (grid_sample equivalent).

Replaces torch.nn.functional.grid_sample as used by the reference's
pixel-aligned feature projection (model_components/pixel_aligned_features.py:
29-31: bilinear, align_corners=True, padding_mode="border").

TPU design: NHWC layout (channels-last is the native TPU conv/gather layout),
one flattened gather of the 4 corner texels followed by a fused lerp. XLA
lowers the gather to a dynamic-slice loop over HBM; a Pallas kernel variant
(ops/pallas/gather_lerp.py) can replace it behind a flag.
"""

import jax
import jax.numpy as jnp


def grid_sample_bilinear(features: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample `features` at normalized coordinates.

    Args:
      features: [B, H, W, C] feature map (NHWC).
      coords: [B, N, 2] xy coords in [-1, 1] (align_corners=True convention:
        -1 maps to pixel center 0, +1 to pixel center W-1 / H-1). Out-of-range
        coords clamp to the border (padding_mode="border").

    Returns:
      [B, N, C] sampled features.
    """
    B, H, W, C = features.shape
    x = (coords[..., 0] + 1.0) * 0.5 * (W - 1)  # [B, N]
    y = (coords[..., 1] + 1.0) * 0.5 * (H - 1)
    x = jnp.clip(x, 0.0, W - 1)
    y = jnp.clip(y, 0.0, H - 1)

    x0 = jnp.clip(jnp.floor(x), 0, W - 1)
    y0 = jnp.clip(jnp.floor(y), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)

    wx = x - x0
    wy = y - y0

    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)

    flat = features.reshape(B, H * W, C)

    def take(yi, xi):
        idx = yi * W + xi  # [B, N]
        return jnp.take_along_axis(flat, idx[..., None], axis=1)  # [B, N, C]

    f00 = take(y0i, x0i)
    f01 = take(y0i, x1i)
    f10 = take(y1i, x0i)
    f11 = take(y1i, x1i)

    wx = wx[..., None]
    wy = wy[..., None]
    top = f00 * (1.0 - wx) + f01 * wx
    bot = f10 * (1.0 - wx) + f11 * wx
    return top * (1.0 - wy) + bot * wy
