"""Frequency + spherical-harmonics encodings.

These replace nerfstudio's NeRFEncoding / tiny-cuda-nn's SHEncoding used by
the reference (action_decoder_jacobian.py:275-284, density_decoder.py:31-38).
Both are small closed-form polynomials / trig maps — on TPU the right design
is a plain vectorized jnp expression that XLA fuses into the consuming matmul,
not a standalone kernel.

Keep these shape-polymorphic (no internal flatten): computing in flat 2-D and
reshaping back (tried in r4, commit 79a8c4d) removes ~1.1 ms/step of relayout
copies at the Pallas-trunk boundary in the perception step but the reshape
pair breaks fusion into the action decoders' batched einsum consumers —
measured -10.6% action-flow / -5.2% tracks throughput at no perception gain
(same-day A/B, benchmarks/RESULTS.md "flat-2-D encodings attempt").
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
    freqs = 2.0 ** jnp.linspace(min_freq_exp, max_freq_exp, num_frequencies, dtype=x.dtype)
    scaled = (2.0 * math.pi) * x[..., None] * freqs  # [..., d, F]
    scaled = scaled.reshape(*scaled.shape[:-2], -1)  # [..., d*F]
    enc = jnp.sin(jnp.concatenate([scaled, scaled + 0.5 * math.pi], axis=-1))
    if include_input:
        enc = jnp.concatenate([enc, x], axis=-1)
    return enc


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
    d = directions_01 * 2.0 - 1.0  # back to [-1, 1]
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
    return jnp.stack(out, axis=-1)
