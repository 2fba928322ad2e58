"""Inverse dynamics: optimize the action so predicted flow matches a target.

Re-design of the reference's optimizer loop (inference/action.py:15-92 and
notebook real_world/2_inverse_dynamics.ipynb cell 17): the field is evaluated
ONCE (`Model.encode_image`), then the optimization touches only an einsum +
projection, so the whole 100-iteration Adam loop jits into a single
`lax.scan` — one device dispatch instead of 100 (the "field queries/sec" fast
path, SURVEY.md §3.4).

Also provides the closed-form linear least-squares solve the 2D control demo
uses (notebook 3 cell 14, torch.linalg.lstsq) — valid in 3D too whenever the
projection is linearized around the current view.
"""

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.model import CameraInput, Model, ModelInferenceEncoding, RobotInput


class ActionOptResult(NamedTuple):
    action: jax.Array  # [B, A] best action found
    loss: jax.Array  # [] final loss
    losses: jax.Array  # [num_iters] loss history
    actions: jax.Array  # [num_iters, B, A] history (reference return_history)


@partial(jax.jit, static_argnames=("model", "num_iters", "learning_rate",
                                   "reg_multiplier", "action_init_var"))
def optimize_actions(
    model: Model,
    variables,
    encoding: ModelInferenceEncoding,
    camera_input: CameraInput,
    trgt_pixel_flow: jax.Array,
    key: jax.Array,
    visible_mask: Optional[jax.Array] = None,
    num_iters: int = 100,
    learning_rate: float = 0.1,
    reg_multiplier: float = 0.0,
    action_init_var: float = 0.001,
) -> ActionOptResult:
    """Adam on the action vector against target per-ray flow [B, R, 2]."""
    batch = encoding.weights.shape[0]
    action_dim = encoding.action_features.shape[-1] // 3

    def predict(action):
        return model.apply(
            variables, encoding, camera_input, RobotInput(robot_action=action),
            method=Model.infer_optical_flow,
        )

    def loss_fn(action):
        err = (predict(action) - trgt_pixel_flow) ** 2
        if visible_mask is not None:
            err = err * visible_mask[..., None]
            loss = jnp.sum(err) / jnp.maximum(jnp.sum(visible_mask), 1.0)
        else:
            loss = jnp.mean(err)
        return loss + reg_multiplier * jnp.mean(action**2)

    opt = optax.adam(learning_rate)
    action0 = jax.random.normal(key, (batch, action_dim)) * action_init_var

    def scan_step(carry, _):
        action, opt_state, best_action, best_loss = carry
        loss, grads = jax.value_and_grad(loss_fn)(action)
        updates, opt_state = opt.update(grads, opt_state)
        new_action = optax.apply_updates(action, updates)
        improved = loss < best_loss
        best_action = jnp.where(improved, action, best_action)
        best_loss = jnp.minimum(loss, best_loss)
        return (new_action, opt_state, best_action, best_loss), (loss, action)

    init = (action0, opt.init(action0), action0, jnp.asarray(jnp.inf))
    (action, _, best_action, best_loss), (losses, actions) = jax.lax.scan(
        scan_step, init, None, length=num_iters
    )
    final_loss = loss_fn(action)
    use_final = final_loss < best_loss
    best_action = jnp.where(use_final, action, best_action)
    best_loss = jnp.minimum(final_loss, best_loss)
    return ActionOptResult(action=best_action, loss=best_loss,
                           losses=losses, actions=actions)


@partial(jax.jit, static_argnames=("model",))
def solve_actions_least_squares(
    model: Model,
    variables,
    encoding: ModelInferenceEncoding,
    camera_input: CameraInput,
    trgt_pixel_flow: jax.Array,
    visible_mask: Optional[jax.Array] = None,
    damping: float = 1e-4,
) -> jax.Array:
    """Closed-form Gauss-Newton step from a=0: since flow(a) is (nearly)
    linear in a, solve min_a ||J_flow a - target||^2 by damped normal
    equations. J_flow columns come from one jacfwd over the cached encoding —
    action_dim extra einsum+project evals, no field re-eval."""
    batch = encoding.weights.shape[0]
    action_dim = encoding.action_features.shape[-1] // 3

    def predict(action):
        return model.apply(
            variables, encoding, camera_input, RobotInput(robot_action=action),
            method=Model.infer_optical_flow,
        )

    a0 = jnp.zeros((batch, action_dim))
    f0 = predict(a0)  # [B, R, 2]
    jac = jax.jacfwd(predict)(a0)  # [B, R, 2, B, A]
    # keep the diagonal over the batch axes
    jac = jnp.einsum("brcba->brca", jac)  # [B, R, 2, A]

    resid = trgt_pixel_flow - f0
    if visible_mask is not None:
        w = visible_mask[..., None]
        jac = jac * w[..., None]
        resid = resid * w

    jtj = jnp.einsum("brca,brcd->bad", jac, jac)
    jtr = jnp.einsum("brca,brc->ba", jac, resid)
    # RELATIVE Tikhonov damping: scale by the mean diagonal of J^T J so the
    # regularization strength is invariant to the field's flow magnitude (a
    # barely-trained near-zero-init Jacobian would otherwise be drowned by an
    # absolute lambda).
    scale = jnp.trace(jtj, axis1=-2, axis2=-1)[..., None, None] / action_dim
    jtj = jtj + (damping * scale + 1e-20) * jnp.eye(action_dim)
    return jnp.linalg.solve(jtj, jtr[..., None])[..., 0]
