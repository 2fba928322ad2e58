"""Density activations.

TPU notes: `trunc_exp` is exp with a gradient clamped via the *saturated*
input, matching the reference semantics (forward = exp(x), backward =
g * exp(clamp(x, -15, 15))); reference: neural_jacobian_field/
model_components/activations.py:13-38. Implemented with jax.custom_jvp so it
fuses into the surrounding XLA graph (no custom kernel needed — exp runs on
the VPU).
"""

import jax
import jax.numpy as jnp


@jax.custom_jvp
def trunc_exp(x: jax.Array) -> jax.Array:
    return jnp.exp(x)


@trunc_exp.defjvp
def _trunc_exp_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    y = jnp.exp(x)
    dy = dx * jnp.exp(jnp.clip(x, -15.0, 15.0))
    return y, dy


def density_activation(kind: str = "trunc_exp"):
    """Return the density activation (reference activations.py:32-38).

    `trunc_exp` shifts the input by -1 so a zero-initialized head starts at
    density exp(-1) ≈ 0.37.
    """
    if kind == "trunc_exp":
        return lambda x: trunc_exp(x - 1.0)
    if kind == "relu":
        return jax.nn.relu
    raise ValueError(f"unknown density activation: {kind}")
