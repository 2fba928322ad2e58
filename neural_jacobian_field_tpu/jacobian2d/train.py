"""2D pipeline training: flow-MSE step (jitted, SPMD-ready).

Replaces the reference's PusherModelWrapper / PlanarHandModelWrapper
LightningModules (jacobian/models/model_wrapper_pusher.py:71-97,
model_wrapper_planar_hand.py:110-145): loss = MSE(J(img) @ cmd, flow).
Same optax Adam + warmup stack as the 3D pipeline.
"""

from dataclasses import dataclass
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@dataclass(frozen=True)
class Train2DCfg:
    lr: float = 1e-4
    weight_decay: float = 1e-5
    warm_up_steps: int = 1000


@flax.struct.dataclass
class TrainState2D:
    step: jax.Array
    params: Any
    opt_state: Any


def make_optimizer_2d(cfg: Train2DCfg, params=None):
    schedule = optax.linear_schedule(
        init_value=cfg.lr / max(cfg.warm_up_steps, 1), end_value=cfg.lr,
        transition_steps=cfg.warm_up_steps,
    )
    tx = optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(schedule),
    )
    if params is None:
        return tx
    # The transformer model's DINO backbone is FROZEN (the reference never
    # puts it in the optimizer, transformer_jacobian.py:55-57). Its grads are
    # already structurally zero (stop_gradient in get_features), but
    # add_decayed_weights would still decay the weights — mask the whole
    # update for any `dino` subtree.
    import flax.traverse_util as tu

    flat = tu.flatten_dict(params)
    if not any("dino" in k for k in flat):
        return tx
    labels = tu.unflatten_dict({
        k: ("frozen" if "dino" in k else "trainable") for k in flat})
    return optax.multi_transform(
        {"trainable": tx, "frozen": optax.set_to_zero()}, labels)


def create_train_state_2d(key, model, sample_batch, cfg: Train2DCfg) -> TrainState2D:
    params = model.init(key, jnp.asarray(sample_batch["input_frame_curr"]),
                        jnp.asarray(sample_batch["input_command"]))["params"]
    tx = make_optimizer_2d(cfg, params)
    return TrainState2D(step=jnp.asarray(0, jnp.int32), params=params,
                        opt_state=tx.init(params))


def make_train_step_2d(model, cfg: Train2DCfg, donate: bool = True):
    """(state, batch) -> (state, metrics); batch leaves may be sharded over a
    mesh "data" axis for DP."""

    def step_fn(state: TrainState2D, batch):
        def loss_fn(params):
            out = model.apply({"params": params}, batch["input_frame_curr"],
                              batch["input_command"])
            return jnp.mean((out.flow - batch["trgt_flow_curr"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        tx = make_optimizer_2d(cfg, state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState2D(step=state.step + 1, params=params, opt_state=opt_state),
            {"train/loss": loss},
        )

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
