"""Evaluation metrics tracked by the rebuild (BASELINE.md):
PSNR (perception parity), Jacobian/flow error (action parity)."""

from typing import Optional

import jax
import jax.numpy as jnp


def psnr(pred: jax.Array, target: jax.Array, max_val: float = 1.0) -> jax.Array:
    """Peak signal-to-noise ratio over all pixels (dB)."""
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def flow_epe(pred: jax.Array, target: jax.Array,
             mask: Optional[jax.Array] = None) -> jax.Array:
    """End-point error of predicted flow [..., 2] (pixels)."""
    err = jnp.linalg.norm(pred - target, axis=-1)
    if mask is None:
        return jnp.mean(err)
    return jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def jacobian_error(pred_j: jax.Array, true_j: jax.Array) -> jax.Array:
    """Mean Frobenius error between Jacobian fields [..., A*3] or [..., A, 3]."""
    return jnp.mean(jnp.abs(pred_j - true_j))
