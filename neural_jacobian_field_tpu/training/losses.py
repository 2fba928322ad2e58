"""Training losses, assembled exactly as the reference's ModelWrapper does.

Perception stage (model_wrapper.py:117-146):
  rgb MSE + 0.08 * DS-NeRF depth (averaged over all levels, sigma 0.001)
  + 1.0 * interlevel + 0.01 * distortion.
Action stage (model_wrapper.py:148-163):
  0.01 * flow MSE, optionally masked by track visibility.
"""

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..models.model import ModelOutput, ModelTarget
from ..ops.losses import distortion_loss, ds_nerf_depth_loss, interlevel_loss


@dataclass(frozen=True)
class LossCfg:
    depth_sigma: float = 0.001  # model_wrapper.py:57-63 (no decay)
    depth_weight: float = 0.08
    interlevel_weight: float = 1.0
    distortion_weight: float = 0.01
    flow_weight: float = 0.01


def perception_loss(out: ModelOutput, target: ModelTarget,
                    cfg: LossCfg = LossCfg()) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    rgb_loss = jnp.mean((out.rgb - target.rgb) ** 2)

    depth_loss = 0.0
    n_levels = len(out.weights_list)
    for weights, tdist in zip(out.weights_list, out.tdist_list):
        steps = ((tdist[..., :-1] + tdist[..., 1:]) / 2)[..., None]
        lengths = (tdist[..., 1:] - tdist[..., :-1])[..., None]
        depth_loss += ds_nerf_depth_loss(
            weights, target.depth, steps, lengths, cfg.depth_sigma
        ) / n_levels
    depth_loss = cfg.depth_weight * depth_loss

    inter = cfg.interlevel_weight * interlevel_loss(out.sdist_list, out.weights_list)
    dist = cfg.distortion_weight * distortion_loss(out.sdist_list, out.weights_list)

    total = rgb_loss + depth_loss + inter + dist

    # depth distribution telemetry (model_wrapper.py:174-186): the valid-
    # depth stats mask out depth <= 0 first (static shapes => NaN masking)
    valid = jnp.where(target.depth > 0, target.depth, jnp.nan)
    return total, {
        "loss/rgb": rgb_loss,
        "loss/depth": depth_loss,
        "loss/interlevel": inter,
        "loss/distortion": dist,
        "loss/total": total,
        "depth/trgt_10_percentile": jnp.nanpercentile(valid, 10.0),
        "depth/trgt_90_percentile": jnp.nanpercentile(valid, 90.0),
        "depth/trgt_mean": jnp.nanmean(valid),
        "depth/pred_10_percentile": jnp.percentile(out.depth, 10.0),
        "depth/pred_90_percentile": jnp.percentile(out.depth, 90.0),
        "depth/pred_mean": jnp.mean(out.depth),
    }


def action_loss(out: ModelOutput, target: ModelTarget,
                cfg: LossCfg = LossCfg()) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    err = cfg.flow_weight * (out.optical_flow - target.optical_flow) ** 2
    if target.visible_mask is not None:
        err = err * target.visible_mask[..., None]
        flow_loss = jnp.sum(err) / jnp.maximum(jnp.sum(target.visible_mask), 1.0)
    else:
        flow_loss = jnp.mean(err)
    return flow_loss, {"loss/flow": flow_loss, "loss/total": flow_loss}
