"""2D Jacobian field models (the `jacobian` toy package, Flax).

Re-design of jacobian/models/jacobian_models/:
  - UnetJacobianField (unet_jacobian.py:14-66): image -> UNet ->
    per-pixel Jacobian [command_dim, spatial_dim]; flow = J @ cmd.
  - TransformerJacobianField (transformer_jacobian.py:27-210): frozen ViT-S/14
    (DINOv2 arch) patch features nearest-upsampled to pixels, concat RGB ->
    UNet decoder -> J.

All NHWC: jacobian maps are [B, H, W, command_dim*spatial_dim]; the flow
einsum contracts the command axis per pixel (one fused VPU pass).
"""

from dataclasses import dataclass, field
from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp
from flax import linen as nn

from .unet import UNet
from .vit import ViTCfg, ViTS14


@dataclass(frozen=True)
class JacobianFieldCfg:
    """base_jacobian.py:14-20."""

    name: str = "unet"
    command_dim: int = 2
    spatial_dim: int = 2
    consistency_loss_type: str = "image"
    consistency_loss_weight: float = 0.0


@dataclass(frozen=True)
class UnetJacobianFieldCfg(JacobianFieldCfg):
    name: str = "unet"
    depth: int = 3
    start_filts: int = 32


@dataclass(frozen=True)
class TransformerJacobianFieldCfg(JacobianFieldCfg):
    name: str = "transformer"
    vit: ViTCfg = field(default_factory=ViTCfg)
    decoder_depth: int = 3


@flax.struct.dataclass
class JacobianNetOutput:
    """base_jacobian.py:24-27. jacobian: [B, H, W, C*S]; flow: [B, H, W, S]."""

    jacobian: jax.Array
    flow: jax.Array


def _flow_from_jacobian(jacobian: jax.Array, cmd: jax.Array, spatial_dim: int):
    j = jacobian.reshape(*jacobian.shape[:-1], -1, spatial_dim)
    return jnp.einsum("bhwcs,bc->bhws", j, cmd)


class UnetJacobianField(nn.Module):
    cfg: UnetJacobianFieldCfg = UnetJacobianFieldCfg()
    compute_dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.jacobian_field = UNet(
            out_channels=self.cfg.command_dim * self.cfg.spatial_dim,
            depth=self.cfg.depth, start_filts=self.cfg.start_filts,
            compute_dtype=self.compute_dtype, name="jacobian_field",
        )

    def compute_jacobian(self, input_img: jax.Array) -> jax.Array:
        return self.jacobian_field(input_img)

    def get_features(self, input_img: jax.Array) -> jax.Array:
        _, feats = self.jacobian_field(input_img, return_features=True)
        return feats

    def __call__(self, input_img: jax.Array, input_cmd: jax.Array) -> JacobianNetOutput:
        jacobian = self.compute_jacobian(input_img)
        flow = _flow_from_jacobian(jacobian, input_cmd, self.cfg.spatial_dim)
        return JacobianNetOutput(jacobian=jacobian, flow=flow)


class TransformerJacobianField(nn.Module):
    """ViT features are computed under stop_gradient (the reference freezes
    DINO, transformer_jacobian.py:55-57); only the UNet decoder trains unless
    the vit params are explicitly unfrozen by the optimizer mask."""

    cfg: TransformerJacobianFieldCfg = TransformerJacobianFieldCfg()
    compute_dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.dino = ViTS14(cfg=self.cfg.vit, compute_dtype=self.compute_dtype,
                           name="dino")
        self.decoder = UNet(
            out_channels=self.cfg.command_dim * self.cfg.spatial_dim,
            depth=self.cfg.decoder_depth, compute_dtype=self.compute_dtype,
            name="decoder",
        )

    def get_features(self, input_img: jax.Array) -> jax.Array:
        """Patch tokens nearest-upsampled to pixel resolution
        (transformer_jacobian.py:134-145). Returns [B, H, W, 384]."""
        b, h, w, _ = input_img.shape
        ps = self.cfg.vit.patch_size
        tokens = self.dino(input_img)
        tokens = jax.lax.stop_gradient(tokens)
        gh, gw = h // ps, w // ps
        tokens = tokens.reshape(b, gh, gw, -1)
        tokens = jnp.repeat(jnp.repeat(tokens, ps, axis=1), ps, axis=2)
        return tokens

    def compute_jacobian(self, input_img: jax.Array) -> jax.Array:
        feats = self.get_features(input_img)
        x = jnp.concatenate([input_img, feats], axis=-1)
        return self.decoder(x)

    def __call__(self, input_img: jax.Array, input_cmd: jax.Array) -> JacobianNetOutput:
        jacobian = self.compute_jacobian(input_img)
        flow = _flow_from_jacobian(jacobian, input_cmd, self.cfg.spatial_dim)
        return JacobianNetOutput(jacobian=jacobian, flow=flow)


MODELS_2D = {
    "unet": (UnetJacobianFieldCfg, UnetJacobianField),
    "transformer": (TransformerJacobianFieldCfg, TransformerJacobianField),
}


def get_model(cfg, compute_dtype=None):
    """jacobian/models/jacobian_models/__init__.py:14-20."""
    _, cls = MODELS_2D[cfg.name]
    return cls(cfg=cfg, compute_dtype=compute_dtype)


def compute_sensitivity(jacobian: jax.Array, spatial_dim: int = 2) -> jax.Array:
    """Per-command sensitivity ||J_c|| min-max normalized over the image
    (model_wrapper_pusher.py:21-47). [B,H,W,C*S] -> [B,H,W,C] in [0,1]."""
    j = jacobian.reshape(*jacobian.shape[:-1], -1, spatial_dim)
    sens = jnp.linalg.norm(j, axis=-1)
    minima = jnp.min(sens, axis=(-3, -2), keepdims=True)
    maxima = jnp.max(sens, axis=(-3, -2), keepdims=True)
    return jnp.clip((sens - minima) / (maxima - minima + 1e-10), 0.0, 1.0)
