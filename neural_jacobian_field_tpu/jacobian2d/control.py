"""Closed-loop least-squares control from the 2D Jacobian field.

Re-implements the control demo's core step (tutorial notebook
3_control_demo_block_pushing.ipynb cell 14): gather the per-pixel Jacobian at
tracked visible pixels, form the desired pixel motion, and solve
`du = lstsq(J, v_desired)` — one [N*S, C] damped least-squares solve, jitted.
The MuJoCo env + tracker stay host-side (SURVEY.md §2.4: interop via NumPy).
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("model", "spatial_dim"))
def control_step(
    model,
    variables,
    obs_image: jax.Array,  # [1, H, W, 3]
    pixel_yx: jax.Array,  # [N, 2] int tracked pixel locations
    desired_motion: jax.Array,  # [N, 2] desired pixel flow
    visible: Optional[jax.Array] = None,  # [N] 0/1
    damping: float = 1e-4,
    spatial_dim: int = 2,
) -> jax.Array:
    """Returns the command [C] minimizing ||J(pixels) du - desired||^2."""
    jac_map = model.apply(variables, obs_image, method=model.compute_jacobian)
    h, w = jac_map.shape[1:3]
    flat = jac_map.reshape(jac_map.shape[0], h * w, -1)[0]
    idx = pixel_yx[:, 0] * w + pixel_yx[:, 1]
    j = flat[idx].reshape(len(idx), -1, spatial_dim)  # [N, C, S]
    j = jnp.swapaxes(j, -1, -2)  # [N, S, C]
    if visible is not None:
        j = j * visible[:, None, None]
        desired_motion = desired_motion * visible[:, None]
    a = j.reshape(-1, j.shape[-1])  # [N*S, C]
    b = desired_motion.reshape(-1)
    ata = a.T @ a + damping * jnp.eye(a.shape[-1])
    atb = a.T @ b
    return jnp.linalg.solve(ata, atb)
