"""Frequency + spherical-harmonics encodings.

These replace nerfstudio's NeRFEncoding / tiny-cuda-nn's SHEncoding used by
the reference (action_decoder_jacobian.py:275-284, density_decoder.py:31-38).
Both are small closed-form polynomials / trig maps — on TPU the right design
is a plain vectorized jnp expression that XLA fuses into the consuming matmul,
not a standalone kernel.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp


def nerf_encoding_dim(in_dim: int, num_frequencies: int, include_input: bool = True) -> int:
    return in_dim * num_frequencies * 2 + (in_dim if include_input else 0)


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def nerf_positional_encoding(
    x: jax.Array,
    num_frequencies: int = 10,
    min_freq_exp: float = 0.0,
    max_freq_exp: float = 9.0,
    include_input: bool = True,
) -> jax.Array:
    """NeRF frequency encoding with nerfstudio's exact layout.

    nerfstudio scales inputs by 2*pi, uses freqs 2**linspace(min, max, F),
    and outputs [sin(all scaled), cos(all scaled), input]:
      out[..., 0:d*F]      = sin(2*pi * x * 2^f)   (x-major: (x0 f0..fF-1, x1 ...))
      out[..., d*F:2*d*F]  = cos(...)
      out[..., 2*d*F:]     = x  (if include_input)
    """
    # Compute in flat 2-D [N, d]: on 3-D [B, N, C] operands XLA's layout
    # assignment picks sample-minor {1,2,0} layouts for the sine/concat
    # chain and then inserts a [B, N, 63] relayout copy at the (default-
    # layout-pinned) Pallas trunk boundary — AFTER the 3->63 channel
    # expansion. Flat 2-D keeps the whole chain in {1,0}; any relayout of
    # the 3-channel input is ~20x cheaper than one of the 63-channel
    # output (r4 trace: maximum_convert_fusion copies, 0.31 ms/step).
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    freqs = 2.0 ** jnp.linspace(min_freq_exp, max_freq_exp, num_frequencies, dtype=x.dtype)
    scaled = (2.0 * math.pi) * x2[..., None] * freqs  # [N, d, F]
    scaled = scaled.reshape(scaled.shape[0], -1)  # [N, d*F]
    enc = jnp.sin(jnp.concatenate([scaled, scaled + 0.5 * math.pi], axis=-1))
    if include_input:
        enc = jnp.concatenate([enc, x2], axis=-1)
    return enc.reshape(*lead, enc.shape[-1])


# Hard-coded real SH basis constants (degree <= 3, i.e. 4 levels / 16 coeffs),
# matching the tiny-cuda-nn / instant-ngp polynomial convention used by
# SHEncoding(levels=4, implementation="tcnn").
def sh_encoding_deg4(directions_01: jax.Array) -> jax.Array:
    """Spherical harmonics encoding, 4 levels -> 16 features.

    Args:
      directions_01: unit directions mapped into [0, 1] (the reference calls
        get_normalized_directions first, action_decoder_jacobian.py:24-30).
    Returns [..., 16].
    """
    lead = directions_01.shape[:-1]
    d = directions_01.reshape(-1, directions_01.shape[-1])  # flat 2-D: see
    d = d * 2.0 - 1.0  # back to [-1, 1]   # nerf_positional_encoding's note
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z

    out = [
        jnp.full_like(x, 0.28209479177387814),  # l0
        -0.48860251190291987 * y,  # l1
        0.48860251190291987 * z,
        -0.48860251190291987 * x,
        1.0925484305920792 * xy,  # l2
        -1.0925484305920792 * yz,
        0.94617469575755997 * zz - 0.31539156525251999,
        -1.0925484305920792 * xz,
        0.54627421529603959 * (xx - yy),
        0.59004358992664352 * y * (-3.0 * xx + yy),  # l3
        2.8906114426405538 * xy * z,
        0.45704579946446572 * y * (1.0 - 5.0 * zz),
        0.3731763325901154 * z * (5.0 * zz - 3.0),
        0.45704579946446572 * x * (1.0 - 5.0 * zz),
        1.4453057213202769 * z * (xx - yy),
        0.59004358992664352 * x * (-xx + 3.0 * yy),
    ]
    return jnp.stack(out, axis=-1).reshape(*lead, 16)
