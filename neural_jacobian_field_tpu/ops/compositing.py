"""Volume-rendering compositing reductions.

Replaces the reference's RaySamples.get_weights (rendering/ray_samplers.py:
77-101) and Model.render_* reductions (models/model.py:257-314). All pure
functions over [..., S, 1]-shaped arrays; XLA fuses the exp/cumsum/weighted
sums into a single pass over the sample axis. A fused Pallas variant lives in
ops/pallas/composite.py.
"""

import jax
import jax.numpy as jnp


def render_weights(densities: jax.Array, deltas: jax.Array) -> jax.Array:
    """Alpha-compositing weights from densities.

    weights_i = alpha_i * T_i, alpha_i = 1 - exp(-sigma_i * delta_i),
    T_i = exp(-sum_{j<i} sigma_j delta_j). Zero-width bins (delta <= 0)
    contribute nothing (the reference masks them, ray_samplers.py:84-88).

    Args:
      densities: [..., S, 1] nonneg densities.
      deltas: [..., S, 1] bin widths (world units).
    Returns [..., S, 1] weights.
    """
    delta_density = jnp.where(deltas > 0, deltas * densities, 0.0)
    alphas = 1.0 - jnp.exp(-delta_density)
    # exclusive cumulative optical depth -> transmittance
    accum = jnp.cumsum(delta_density[..., :-1, :], axis=-2)
    accum = jnp.concatenate([jnp.zeros_like(accum[..., :1, :]), accum], axis=-2)
    transmittance = jnp.exp(-accum)
    return alphas * transmittance


def composite(weights: jax.Array, values: jax.Array, bg_value=None) -> jax.Array:
    """Weighted sum along the sample axis: sum_i w_i v_i (model.py:257-269).

    weights: [..., S, 1]; values: [..., S, C] -> [..., C].
    If bg_value is given, adds (1 - accumulation) * bg_value.
    """
    out = jnp.sum(weights * values, axis=-2)
    if bg_value is not None:
        accumulation = jnp.sum(weights, axis=-2)
        out = out + (1.0 - accumulation) * bg_value
    return out


def render_depth(weights: jax.Array, steps: jax.Array, eps: float = 1e-10) -> jax.Array:
    """Expected-depth render with clipping (model.py:271-279).

    steps: [..., S, 1] bin centers. Returns [..., 1].
    """
    depth = jnp.sum(weights * steps, axis=-2) / (jnp.sum(weights, axis=-2) + eps)
    return jnp.clip(depth, jnp.min(steps), jnp.max(steps))
