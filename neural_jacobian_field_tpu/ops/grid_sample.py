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


def grid_sample_bilinear(features: jax.Array, coords: jax.Array,
                         padding_mode: str = "border") -> jax.Array:
    """Sample `features` at normalized coordinates.

    Args:
      features: [B, H, W, C] feature map (NHWC).
      coords: [B, N, 2] xy coords in [-1, 1] (align_corners=True convention:
        -1 maps to pixel center 0, +1 to pixel center W-1 / H-1).
      padding_mode: "border" (out-of-range coords clamp — the reference's
        pixel-aligned projection, pixel_aligned_features.py:29-31) or "zeros"
        (out-of-bounds corner texels contribute 0 — torch grid_sample's
        default, which the official RAFT correlation lookup relies on:
        princeton-vl bilinear_sampler / torchvision raft._corr_lookup).

    Returns:
      [B, N, C] sampled features.
    """
    B, H, W, C = features.shape
    x = (coords[..., 0] + 1.0) * 0.5 * (W - 1)  # [B, N]
    y = (coords[..., 1] + 1.0) * 0.5 * (H - 1)
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1
    y1 = y0 + 1

    wx = x - x0
    wy = y - y0

    if padding_mode == "zeros":
        # torch semantics: each OOB corner texel reads 0 (partial bilinear
        # weights survive); indices are clamped only to keep the gather legal
        def corner_valid(yi, xi):
            return ((xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1))

        valid = [corner_valid(y0, x0), corner_valid(y0, x1),
                 corner_valid(y1, x0), corner_valid(y1, x1)]
    else:
        valid = None

    x0i = jnp.clip(x0, 0, W - 1).astype(jnp.int32)
    y0i = jnp.clip(y0, 0, H - 1).astype(jnp.int32)
    x1i = jnp.clip(x1, 0, W - 1).astype(jnp.int32)
    y1i = jnp.clip(y1, 0, H - 1).astype(jnp.int32)

    flat = features.reshape(B, H * W, C)

    def take(yi, xi):
        idx = yi * W + xi  # [B, N]
        return jnp.take_along_axis(flat, idx[..., None], axis=1)  # [B, N, C]

    f00 = take(y0i, x0i)
    f01 = take(y0i, x1i)
    f10 = take(y1i, x0i)
    f11 = take(y1i, x1i)
    if valid is not None:
        f00 = f00 * valid[0][..., None].astype(f00.dtype)
        f01 = f01 * valid[1][..., None].astype(f01.dtype)
        f10 = f10 * valid[2][..., None].astype(f10.dtype)
        f11 = f11 * valid[3][..., None].astype(f11.dtype)

    wx = wx[..., None]
    wy = wy[..., None]
    top = f00 * (1.0 - wx) + f01 * wx
    bot = f10 * (1.0 - wx) + f11 * wx
    return top * (1.0 - wy) + bot * wy
