"""Inverse-CDF (PDF) resampling along rays.

Replaces the reference's PDFSampler.generate_ray_samples (rendering/
ray_samplers.py:326-451), operating in normalized spacing coordinates [0, 1].
Static shapes, explicit PRNG key, vectorized searchsorted over the bin axis —
the whole thing jits into one XLA program (sort/searchsorted run on the VPU).
"""

from functools import partial

import jax
import jax.numpy as jnp


def searchsorted_right(a: jax.Array, v: jax.Array) -> jax.Array:
    """Batched searchsorted(side="right") over the last axis.

    a: [..., M] sorted ascending; v: [..., Q]. Returns int32 [..., Q] counts
    of entries <= v. On TPU a compare-and-reduce beats a sequential binary
    search: the [..., M, Q] compare fuses into the sum reduction on the VPU.
    """
    return jnp.sum((a[..., :, None] <= v[..., None, :]).astype(jnp.int32), axis=-2)


@partial(jax.jit, static_argnames=("num_samples", "stratified", "single_jitter", "include_original"))
def sample_pdf(
    key: jax.Array,
    existing_bins: jax.Array,
    weights: jax.Array,
    num_samples: int,
    stratified: bool = True,
    single_jitter: bool = False,
    include_original: bool = False,
    histogram_padding: float = 0.01,
    eps: float = 1e-5,
) -> jax.Array:
    """Resample bin edges proportional to weights.

    Args:
      key: PRNG key (unused if stratified=False).
      existing_bins: [..., S+1] bin edges in spacing coords [0, 1].
      weights: [..., S] per-bin weights (>= 0).
      num_samples: number of output samples; output has num_samples+1 edges.
    Returns:
      [..., num_samples+1] new bin edges (gradient-stopped, matching
      ray_samplers.py:441 `bins.detach()`), sorted ascending. If
      include_original, original edges are merged in (output size
      S+1 + num_samples+1).
    """
    num_bins = num_samples + 1

    weights = weights + histogram_padding
    # Avoid NaNs on empty rays (ray_samplers.py:378-382).
    weights_sum = jnp.sum(weights, axis=-1, keepdims=True)
    padding = jax.nn.relu(eps - weights_sum)
    weights = weights + padding / weights.shape[-1]
    weights_sum = weights_sum + padding

    pdf = weights / weights_sum
    cdf = jnp.minimum(1.0, jnp.cumsum(pdf, axis=-1))
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [..., S+1]

    u = jnp.linspace(0.0, 1.0 - 1.0 / num_bins, num_bins, dtype=cdf.dtype)
    u = jnp.broadcast_to(u, (*cdf.shape[:-1], num_bins))
    if stratified:
        jitter_shape = (*cdf.shape[:-1], 1 if single_jitter else num_bins)
        u = u + jax.random.uniform(key, jitter_shape, dtype=cdf.dtype) / num_bins
    else:
        u = u + 0.5 / num_bins

    inds = searchsorted_right(cdf, u)
    max_idx = existing_bins.shape[-1] - 1
    below = jnp.clip(inds - 1, 0, max_idx)
    above = jnp.clip(inds, 0, max_idx)

    cdf_g0 = jnp.take_along_axis(cdf, below, axis=-1)
    bins_g0 = jnp.take_along_axis(existing_bins, below, axis=-1)
    cdf_g1 = jnp.take_along_axis(cdf, above, axis=-1)
    bins_g1 = jnp.take_along_axis(existing_bins, above, axis=-1)

    denom = cdf_g1 - cdf_g0
    t = jnp.where(denom > 0, (u - cdf_g0) / jnp.where(denom > 0, denom, 1.0), 0.0)
    t = jnp.clip(jnp.nan_to_num(t, nan=0.0), 0.0, 1.0)
    bins = bins_g0 + t * (bins_g1 - bins_g0)

    if include_original:
        bins = jnp.sort(jnp.concatenate([existing_bins, bins], axis=-1), axis=-1)

    return jax.lax.stop_gradient(bins)
