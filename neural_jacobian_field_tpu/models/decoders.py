"""Density + action decoders (the Jacobian field heads).

Re-design of the reference's models/decoder/ package:
  - DensityDecoderMlp         (density_decoder.py:16-71)  — proposal nets
  - ActionDecoderJacobianMlp  (action_decoder_jacobian.py:253-333)
  - ActionDecoderJacobianTransformer (action_decoder_jacobian.py:336-446)
  - ActionDecoderFlowMlp      (action_decoder_flow.py:64-286) — non-Jacobian baseline

All decode per-point: world xyz -> NeRF positional encoding + pixel-aligned
context features -> ResnetFC trunks. The Jacobian head outputs
J(x) in R^{action_dim x 3}; scene flow = J(x) @ action, linear in the action
(the key property exploited by inverse dynamics, SURVEY.md §3.4).

TPU notes: every head is a batched [B*R*S, d] MLP — pure MXU work. The
transformer variant cross-attends each point's query token into `action_dim`
learned index embeddings (KV length ~8) — small batched matmuls, fused by XLA.
Param freezing for stage-2 training is an optax mask over param-path
substrings (see `action_param_pattern`), replacing requires_grad=False
(action_decoder_jacobian.py:251-258).
"""

from dataclasses import dataclass, field
from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.activations import density_activation
from ..ops.encodings import nerf_positional_encoding, sh_encoding_deg4
from . import initializers as init
from .pixel_aligned import get_pixel_aligned_features
from .resnet_fc import MlpCfg, ResnetFC
from .transformer import Transformer


@flax.struct.dataclass
class PixelEncoding:
    """Context-image encoding consumed by all decoders (action_decoder.py:11-17).

    features: [B, Hf, Wf, C] NHWC feature map; extrinsics: [B, 4, 4] cam2world;
    intrinsics: [B, 3, 3] normalized; action: [B, action_dim].
    """

    features: jax.Array
    extrinsics: jax.Array
    intrinsics: jax.Array
    action: jax.Array


@flax.struct.dataclass
class DensityHeadOutput:
    density: jax.Array  # [B, N, 1]
    density_features: jax.Array  # [B, N, geo_dim]
    xyz_features: jax.Array  # [B, N, pe_dim]
    pixel_aligned_features: jax.Array  # [B, N, C]


@flax.struct.dataclass
class DecoderOutput:
    density: jax.Array  # [B, R, S, 1]
    color: jax.Array  # [B, R, S, 3]
    flow: jax.Array  # [B, R, S, 3]
    action_features: jax.Array  # [B, R, S, dim]


@dataclass(frozen=True)
class TransformerCfg:
    attn_feat_dim: int = 64
    attn_head_dim: int = 64
    num_attn_heads: int = 8
    attn_depth: int = 3
    attn_mlp_dim: int = 64


@dataclass(frozen=True)
class DensityDecoderMlpCfg:
    name: str = "density_mlp"
    mlp: MlpCfg = field(default_factory=MlpCfg)
    num_frequencies: int = 10


@dataclass(frozen=True)
class ActionDecoderJacobianMlpCfg:
    name: str = "jacobian_mlp"
    mlp: MlpCfg = field(default_factory=MlpCfg)
    num_frequencies: int = 10
    geometry_feature_dim: int = 15
    use_arm_model: bool = False
    arm_action_dim: Optional[int] = None


@dataclass(frozen=True)
class ActionDecoderJacobianTransformerCfg:
    name: str = "jacobian_transformer"
    mlp: MlpCfg = field(default_factory=MlpCfg)
    transformer: TransformerCfg = field(default_factory=TransformerCfg)
    num_frequencies: int = 10
    geometry_feature_dim: int = 15
    use_arm_model: bool = False
    arm_action_dim: Optional[int] = None


@dataclass(frozen=True)
class ActionDecoderFlowMlpCfg:
    name: str = "flow_mlp"
    mlp: MlpCfg = field(default_factory=MlpCfg)
    num_frequencies: int = 10
    geometry_feature_dim: int = 15
    use_arm_model: bool = False
    arm_action_dim: Optional[int] = None


def action_param_pattern(cfg) -> str:
    """Substring identifying trainable (action-stage) params; everything else
    is frozen in stage 2 (reference `action_param_glob_pattern`)."""
    return {
        "jacobian_mlp": "jacobian_head",
        "jacobian_transformer": "jacobian",
        "flow_mlp": "flow_head",
    }[cfg.name]


def _normalized_directions(directions: jax.Array) -> jax.Array:
    """Map unit directions into [0, 1] for the SH basis
    (action_decoder_jacobian.py:24-30)."""
    return (directions + 1.0) / 2.0


def _cat_features(z):
    """Pixel-aligned features arrive as a lazy KnotFeatures in the epipolar
    path (pixel_aligned.py); ResnetFC trunks consume it directly (knot-side
    projection + K7), every other consumer materializes here."""
    from ..ops.epipolar import KnotFeatures

    if isinstance(z, KnotFeatures):
        return z.concat()
    return jnp.concatenate(z, axis=-1) if isinstance(z, (tuple, list)) else z


def _trunk_cls(remat: bool):
    """ResnetFC, optionally rematerialized (activations of the B*R*S point
    evals recomputed in backward instead of stored). compute_features is the
    only static arg (flax numbers remat static_argnums past self)."""
    return nn.remat(ResnetFC, static_argnums=(2,)) if remat else ResnetFC


class DensityDecoderMlp(nn.Module):
    """Proposal-network density field (density_decoder.py:23-71)."""

    cfg: DensityDecoderMlpCfg
    encoder_dim: int
    compute_dtype: Optional[jnp.dtype] = None
    remat: bool = False
    fused_trunk: bool = False

    def setup(self):
        self.density_head = _trunk_cls(self.remat)(
            cfg=self.cfg.mlp, d_out=1, d_latent=self.encoder_dim,
            compute_dtype=self.compute_dtype, fused_trunk=self.fused_trunk,
            name="density_head",
        )
        self._activation = density_activation("trunc_exp")

    def __call__(self, world_space_xyz: jax.Array, pixel_encoding: PixelEncoding) -> jax.Array:
        """[B, R, S, 3] world points -> [B, R, S, 1] densities."""
        b, r, s = world_space_xyz.shape[:3]
        xyz = world_space_xyz.reshape(b, r * s, 3)
        aligned, cam_xyz, _ = get_pixel_aligned_features(
            xyz, pixel_encoding.extrinsics, pixel_encoding.intrinsics,
            pixel_encoding.features,
        )
        pe = nerf_positional_encoding(
            cam_xyz, self.cfg.num_frequencies, 0.0, self.cfg.num_frequencies - 1.0
        )
        raw, _ = self.density_head(aligned, pe)
        return self._activation(raw).reshape(b, r, s, 1)


class _ColorHead(nn.Module):
    """Shared RGB head: MLP(geo feats ++ SH dir feats) -> sigmoid RGB
    (action_decoder_jacobian.py:311-318)."""

    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        dt = self.compute_dtype
        x = nn.Dense(64, kernel_init=init.torch_linear, dtype=dt, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(64, kernel_init=init.torch_linear, dtype=dt, name="fc2")(x)
        x = nn.relu(x)
        x = nn.Dense(3, kernel_init=init.torch_linear, dtype=dt, name="fc3")(x)
        return nn.sigmoid(x.astype(jnp.float32))


class ActionDecoderBase(nn.Module):
    """Shared density/color/flow plumbing (action_decoder_jacobian.py:87-249).

    Subclasses define `_setup_heads` and `compute_jacobian_or_flow`.
    """

    action_dim: int = 0  # overridden
    spatial_dim: int = 3

    def compute_density(self, world_space_xyz: jax.Array,
                        pixel_encoding: PixelEncoding) -> DensityHeadOutput:
        """xyz [B, N, 3] -> densities + intermediate features."""
        aligned, cam_xyz, _ = get_pixel_aligned_features(
            world_space_xyz, pixel_encoding.extrinsics, pixel_encoding.intrinsics,
            pixel_encoding.features,
        )
        xyz_features = nerf_positional_encoding(
            cam_xyz, self.cfg.num_frequencies, 0.0, self.cfg.num_frequencies - 1.0
        )
        raw, _ = self.density_head(aligned, xyz_features)
        density_features = raw[..., : self.cfg.geometry_feature_dim]
        density = self._activation(raw[..., self.cfg.geometry_feature_dim :])
        return DensityHeadOutput(
            density=density,
            density_features=density_features,
            xyz_features=xyz_features,
            pixel_aligned_features=aligned,
        )

    def compute_flow(self, action: jax.Array, dho: DensityHeadOutput,
                     arm: bool = False) -> Tuple[jax.Array, jax.Array]:
        """action [B, N, A] -> (flow [B, N, 3], action_features=J [B, N, A*3])."""
        jacobian = self.compute_jacobian(dho, arm=arm)
        j = jacobian.reshape(*jacobian.shape[:-1], -1, self.spatial_dim)
        flow = jnp.einsum("bnas,bna->bns", j, action)
        return flow, jacobian

    def __call__(self, world_space_xyz: jax.Array, world_space_dir: jax.Array,
                 pixel_encoding: PixelEncoding, arm: bool = False) -> DecoderOutput:
        b, r, s = world_space_xyz.shape[:3]
        xyz = world_space_xyz.reshape(b, r * s, 3)
        dho = self.compute_density(xyz, pixel_encoding)

        action = jnp.broadcast_to(
            pixel_encoding.action[:, None, :], (b, r * s, pixel_encoding.action.shape[-1])
        )
        flow, action_features = self.compute_flow(action, dho, arm=arm)

        # flax materializes params lazily: touch the arm head at init so its
        # params exist even though training calls arm=False (the reference
        # constructs both heads eagerly, action_decoder_jacobian.py:300-308)
        if self.is_initializing() and self.cfg.use_arm_model and not arm:
            arm_action = jnp.zeros((b, r * s, self.cfg.arm_action_dim))
            self.compute_flow(arm_action, dho, arm=True)

        dirs = _normalized_directions(world_space_dir.reshape(b, r * s, 3))
        dir_features = sh_encoding_deg4(dirs)
        color = self.color_head(
            jnp.concatenate([dho.density_features, dir_features], axis=-1)
        )

        def unflatten(x):
            return x.reshape(b, r, s, x.shape[-1])

        return DecoderOutput(
            density=unflatten(dho.density),
            color=unflatten(color),
            flow=unflatten(flow),
            action_features=unflatten(action_features),
        )

    def encode_image(self, world_space_xyz: jax.Array,
                     pixel_encoding: PixelEncoding) -> Tuple[jax.Array, jax.Array]:
        """Inverse-dynamics fast path: evaluate density + Jacobian once
        (action_decoder_jacobian.py:217-249). Returns ([B,R,S,1], [B,R,S,A*3])."""
        b, r, s = world_space_xyz.shape[:3]
        xyz = world_space_xyz.reshape(b, r * s, 3)
        dho = self.compute_density(xyz, pixel_encoding)
        jacobian = self.compute_jacobian(dho)
        return (
            dho.density.reshape(b, r, s, 1),
            jacobian.reshape(b, r, s, jacobian.shape[-1]),
        )


class ActionDecoderJacobianMlp(ActionDecoderBase):
    """Jacobian field with a ResnetFC head (action_decoder_jacobian.py:253-333)."""

    cfg: ActionDecoderJacobianMlpCfg = ActionDecoderJacobianMlpCfg()
    encoder_dim: int = 512
    compute_dtype: Optional[jnp.dtype] = None
    remat: bool = False
    fused_trunk: bool = False

    def setup(self):
        cfg = self.cfg
        trunk = _trunk_cls(self.remat)
        self.density_head = trunk(
            cfg=cfg.mlp, d_out=cfg.geometry_feature_dim + 1, d_latent=self.encoder_dim,
            compute_dtype=self.compute_dtype, fused_trunk=self.fused_trunk,
            name="density_head",
        )
        self._activation = density_activation("trunc_exp")
        self.jacobian_head = trunk(
            cfg=cfg.mlp, d_out=self.spatial_dim * self.action_dim,
            d_latent=self.encoder_dim, compute_dtype=self.compute_dtype,
            kernel_override=init.near_zero_normal(), bias_override=init.near_zero_normal(),
            fused_trunk=self.fused_trunk, name="jacobian_head",
        )
        if cfg.use_arm_model:
            self.jacobian_head_arm = ResnetFC(
                cfg=cfg.mlp, d_out=self.spatial_dim * cfg.arm_action_dim,
                d_latent=self.encoder_dim, compute_dtype=self.compute_dtype,
                kernel_override=init.near_zero_normal(), bias_override=init.near_zero_normal(),
                name="jacobian_head_arm",
            )
        self.color_head = _ColorHead(compute_dtype=self.compute_dtype, name="color_head")

    def compute_jacobian(self, dho: DensityHeadOutput, arm: bool = False) -> jax.Array:
        head = self.jacobian_head_arm if arm else self.jacobian_head
        out, _ = head(dho.pixel_aligned_features, dho.xyz_features)
        return out


class ActionDecoderJacobianTransformer(ActionDecoderBase):
    """Jacobian via cross-attention into learned per-action index embeddings
    (action_decoder_jacobian.py:336-446)."""

    cfg: ActionDecoderJacobianTransformerCfg = ActionDecoderJacobianTransformerCfg()
    encoder_dim: int = 512
    compute_dtype: Optional[jnp.dtype] = None
    remat: bool = False
    fused_trunk: bool = False

    def setup(self):
        cfg = self.cfg
        tcfg = cfg.transformer
        trunk = _trunk_cls(self.remat)
        self.density_head = trunk(
            cfg=cfg.mlp, d_out=cfg.geometry_feature_dim + 1, d_latent=self.encoder_dim,
            compute_dtype=self.compute_dtype, fused_trunk=self.fused_trunk,
            name="density_head",
        )
        self._activation = density_activation("trunc_exp")

        self.jacobian_index_embedding = self.param(
            "jacobian_index_embedding", nn.initializers.normal(1.0),
            (1, self.action_dim, tcfg.attn_feat_dim),
        )
        self.jacobian_query_mlp = nn.Dense(
            tcfg.attn_feat_dim, kernel_init=init.torch_linear, name="jacobian_query_mlp",
        )
        self.jacobian_attn_decoder = Transformer(
            dim=tcfg.attn_feat_dim, depth=tcfg.attn_depth, heads=tcfg.num_attn_heads,
            dim_head=tcfg.attn_head_dim, mlp_dim=tcfg.attn_mlp_dim, selfatt=False,
            kv_dim=tcfg.attn_feat_dim, compute_dtype=self.compute_dtype,
            name="jacobian_attn_decoder",
        )
        self.jacobian_head = nn.Dense(
            self.spatial_dim * self.action_dim,
            kernel_init=init.near_zero_normal(), bias_init=init.near_zero_normal(),
            name="jacobian_head",
        )
        if cfg.use_arm_model:
            self.jacobian_head_arm = ResnetFC(
                cfg=cfg.mlp, d_out=self.spatial_dim * cfg.arm_action_dim,
                d_latent=self.encoder_dim, compute_dtype=self.compute_dtype,
                kernel_override=init.near_zero_normal(), bias_override=init.near_zero_normal(),
                name="jacobian_head_arm",
            )
        self.color_head = _ColorHead(compute_dtype=self.compute_dtype, name="color_head")

    def compute_jacobian(self, dho: DensityHeadOutput, arm: bool = False) -> jax.Array:
        if arm:
            out, _ = self.jacobian_head_arm(dho.pixel_aligned_features, dho.xyz_features)
            return out
        query = jnp.concatenate(
            [dho.xyz_features, _cat_features(dho.pixel_aligned_features)], axis=-1)
        query = self.jacobian_query_mlp(query)
        tokens = self.jacobian_attn_decoder(query, z=self.jacobian_index_embedding)
        return self.jacobian_head(tokens.astype(jnp.float32))


class ActionDecoderFlowMlp(ActionDecoderBase):
    """Direct flow baseline — flow conditioned on the action, NOT linear in it
    (action_decoder_flow.py:64-286)."""

    cfg: ActionDecoderFlowMlpCfg = ActionDecoderFlowMlpCfg()
    encoder_dim: int = 512
    compute_dtype: Optional[jnp.dtype] = None
    remat: bool = False
    fused_trunk: bool = False

    def setup(self):
        cfg = self.cfg
        trunk = _trunk_cls(self.remat)
        self.density_head = trunk(
            cfg=cfg.mlp, d_out=cfg.geometry_feature_dim + 1, d_latent=self.encoder_dim,
            compute_dtype=self.compute_dtype, fused_trunk=self.fused_trunk,
            name="density_head",
        )
        self._activation = density_activation("trunc_exp")
        self.flow_head = trunk(
            cfg=cfg.mlp, d_out=self.spatial_dim,
            d_latent=self.encoder_dim + self.action_dim,
            compute_dtype=self.compute_dtype,
            kernel_override=init.near_zero_normal(), bias_override=init.near_zero_normal(),
            fused_trunk=self.fused_trunk, name="flow_head",
        )
        if cfg.use_arm_model:
            self.flow_head_arm = ResnetFC(
                cfg=cfg.mlp, d_out=self.spatial_dim,
                d_latent=self.encoder_dim + cfg.arm_action_dim,
                compute_dtype=self.compute_dtype,
                kernel_override=init.near_zero_normal(), bias_override=init.near_zero_normal(),
                name="flow_head_arm",
            )
        self.color_head = _ColorHead(compute_dtype=self.compute_dtype, name="color_head")

    def compute_jacobian(self, dho: DensityHeadOutput, arm: bool = False) -> jax.Array:
        raise NotImplementedError("flow_mlp has no Jacobian; use compute_flow")

    def compute_flow(self, action: jax.Array, dho: DensityHeadOutput,
                     arm: bool = False) -> Tuple[jax.Array, jax.Array]:
        head = self.flow_head_arm if arm else self.flow_head
        flow, features = head(
            jnp.concatenate([_cat_features(dho.pixel_aligned_features), action],
                            axis=-1),
            dho.xyz_features, compute_features=True,
        )
        return flow, features

    def encode_image(self, world_space_xyz, pixel_encoding):
        raise NotImplementedError(
            "flow_mlp does not support the cached-Jacobian inverse-dynamics path "
            "(flow is nonlinear in the action); see action_decoder_flow.py:248-278"
        )


DECODERS = {
    "density_mlp": (DensityDecoderMlpCfg, DensityDecoderMlp),
    "jacobian_mlp": (ActionDecoderJacobianMlpCfg, ActionDecoderJacobianMlp),
    "jacobian_transformer": (ActionDecoderJacobianTransformerCfg, ActionDecoderJacobianTransformer),
    "flow_mlp": (ActionDecoderFlowMlpCfg, ActionDecoderFlowMlp),
}


def get_action_decoder(cfg, action_dim: int, encoder_dim: int, compute_dtype=None,
                       remat: bool = False, fused_trunk: bool = False):
    """Registry dispatch (models/decoder/__init__.py:37-44). remat
    rematerializes the ResnetFC trunk activations in backward; fused_trunk
    routes ResnetFC heads through the K7 Pallas kernel on TPU."""
    _, cls = DECODERS[cfg.name]
    return cls(cfg=cfg, action_dim=action_dim, encoder_dim=encoder_dim,
               compute_dtype=compute_dtype, remat=remat, fused_trunk=fused_trunk)
