"""Composed neural-Jacobian-field model (encoder + proposal sampling + decoder).

Re-design of the reference's models/model.py:147-628 as a pure-functional Flax
module. Key differences forced by XLA (SURVEY.md §7):
  - the ProposalNetworkSampler's mutable anneal/update state becomes explicit
    `anneal`/`updated` scalars computed from the step index (see
    `step_schedules`) so the whole train step jits into one graph;
  - all sampling takes explicit PRNG keys;
  - `self.training` flags become static `train` args;
  - outputs are flax.struct pytrees with static shapes.
"""

from dataclasses import dataclass, field
from typing import Optional, Tuple, Union

import flax.struct
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..rendering.geometry import project_world_coords_to_camera
from ..rendering.samplers import (
    ProposalSamplerCfg,
    RayBundle,
    proposal_anneal,
    proposal_sample,
    sdist_edges,
    tdist_edges,
)
from .decoders import (
    DECODERS,
    ActionDecoderFlowMlpCfg,
    ActionDecoderJacobianMlpCfg,
    ActionDecoderJacobianTransformerCfg,
    DensityDecoderMlp,
    DensityDecoderMlpCfg,
    PixelEncoding,
    get_action_decoder,
)
from .encoder_resnet import EncoderResnet, EncoderResnetCfg


@dataclass(frozen=True)
class RenderingCfg:
    """models/model.py:35-44."""

    num_proposal_samples: Tuple[int, ...] = (256,)
    num_nerf_samples: int = 256
    single_jitter: bool = False
    proposal_warmup: int = 5000
    proposal_update_every: int = 5
    use_proposal_weight_anneal: bool = True
    proposal_weights_anneal_max_num_iters: int = 1000
    proposal_weights_anneal_slope: float = 10.0
    # fused K5 Pallas PDF resampling — DEFAULT ON (9% step speedup measured on
    # TPU; identical distribution, bin-boundary ties may resolve to the
    # adjacent bin because the MXU cumsum accumulates in a different order —
    # ops/pallas/pdf_resample.py). Set false for bit-exact XLA resampling.
    use_pallas_pdf: bool = True
    # pixel-aligned feature sampling path (ops/epipolar.py): "exact" gathers
    # one row per sample per pyramid level (reference-parity bilinear);
    # "epipolar" caches per-ray knot textures along the projected ray segment
    # and interpolates them per sample — ~10x fewer gather/scatter rows, the
    # K1b TPU-native path. epipolar_knots = (fine, mid, coarse) knots/ray.
    pixel_feature_mode: str = "exact"
    epipolar_knots: Tuple[int, int, int] = (64, 16, 8)
    # K7: route the ResnetFC trunks (proposal/density/jacobian heads) through
    # the fused Pallas train kernel (ops/pallas/field_mlp_train.py) on TPU.
    # The kernel computes in bf16; it only engages when the model's
    # compute_dtype is bfloat16 (f32 models keep the XLA chain — resnet_fc.py).
    use_fused_trunk: bool = False


@dataclass(frozen=True)
class ModelCfg:
    """models/model.py:47-53."""

    action_dim: int = 8
    rendering: RenderingCfg = field(default_factory=RenderingCfg)
    encoder: EncoderResnetCfg = field(default_factory=EncoderResnetCfg)
    density_decoder: DensityDecoderMlpCfg = field(default_factory=DensityDecoderMlpCfg)
    action_decoder: Union[
        ActionDecoderJacobianMlpCfg,
        ActionDecoderJacobianTransformerCfg,
        ActionDecoderFlowMlpCfg,
    ] = field(default_factory=ActionDecoderJacobianTransformerCfg)


@flax.struct.dataclass
class CameraInput:
    """models/model.py:56-64. input_image is NHWC."""

    input_image: jax.Array  # [B, H, W, 3]
    ctxt_extrinsics: jax.Array  # [B, 4, 4]
    ctxt_intrinsics: jax.Array  # [B, 3, 3]
    trgt_extrinsics: jax.Array  # [B, 4, 4]
    trgt_intrinsics: jax.Array  # [B, 3, 3]


@flax.struct.dataclass
class RenderingInput:
    """models/model.py:67-72."""

    origins: jax.Array  # [B, R, 3]
    directions: jax.Array  # [B, R, 3]
    z_near: jax.Array  # [B]
    z_far: jax.Array  # [B]


@flax.struct.dataclass
class RobotInput:
    robot_action: jax.Array  # [B, A]


@flax.struct.dataclass
class ModelInput:
    camera_input: CameraInput
    rendering_input: RenderingInput
    robot_input: RobotInput


@flax.struct.dataclass
class ModelTarget:
    """models/model.py:91-96; optional supervision is zero-filled + masked."""

    rgb: jax.Array  # [B, R, 3]
    depth: jax.Array  # [B, R, 1]
    optical_flow: Optional[jax.Array] = None  # [B, R, 2]
    visible_mask: Optional[jax.Array] = None  # [B, R]


@flax.struct.dataclass
class ModelOutput:
    """Flattened union of the reference's Standard/Training/Vis outputs
    (models/model.py:99-126); unset members are None (static pytree holes)."""

    rgb: jax.Array  # [B, R, 3]
    depth: jax.Array  # [B, R, 1]
    optical_flow: jax.Array  # [B, R, 2]
    weights_list: Optional[tuple] = None  # per level [B, R, S, 1]
    sdist_list: Optional[tuple] = None  # per level [B, R, S+1] spacing edges
    tdist_list: Optional[tuple] = None  # per level [B, R, S+1] euclidean edges
    action_features: Optional[jax.Array] = None  # [B, R, A*3]
    ray_positions: Optional[jax.Array] = None  # [B, R, 3]
    ray_positions_warped: Optional[jax.Array] = None  # [B, R, 3]
    weights: Optional[jax.Array] = None  # [B, R, S]
    steps: Optional[jax.Array] = None  # [B, R, S]


@flax.struct.dataclass
class ModelInferenceEncoding:
    """Cached field evaluation for inverse dynamics (models/model.py:129-134)."""

    density: jax.Array  # [B, R, S, 1]
    action_features: jax.Array  # [B, R, S, A*3]
    weights: jax.Array  # [B, R, S, 1]
    ray_samples_positions: jax.Array  # [B, R, S, 3]


@flax.struct.dataclass
class StepCtx:
    """Per-step sampler context (replaces sampler mutable state)."""

    key: jax.Array
    anneal: jax.Array
    updated: jax.Array


def step_schedules(step: jax.Array, steps_since_update: jax.Array,
                   cfg: RenderingCfg) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Traced versions of the reference's anneal + update schedules.

    anneal: models/model.py:201-209 (mip-NeRF 360 eq. 18 bias).
    updated: ray_samplers.py:513-515 — steps_since_update > update_sched(step)
      or step < 10, where update_sched interpolates [0, warmup] -> [0,
      update_every], clipped to [1, update_every].
    Returns (anneal, updated, new_steps_since_update) — the counter is carried
    in the train state (ray_samplers.py:492-495,548-549).
    """
    if cfg.use_proposal_weight_anneal:
        anneal = proposal_anneal(
            step, cfg.proposal_weights_anneal_max_num_iters,
            cfg.proposal_weights_anneal_slope,
        )
    else:
        anneal = jnp.asarray(1.0)
    sched = jnp.clip(
        step / cfg.proposal_warmup * cfg.proposal_update_every,
        1.0, cfg.proposal_update_every,
    )
    updated = (steps_since_update > sched) | (step < 10)
    new_ssu = jnp.where(updated, 0, steps_since_update) + 1
    return anneal, updated, new_ssu


class Model(nn.Module):
    """models/model.py:147-628, Flax edition.

    Methods other than __call__ are invoked via `model.apply(vars, ...,
    method=Model.<name>)`.

    remat=True rematerializes the decoder + proposal-net evaluations in the
    backward pass (jax.checkpoint): activations for B*R*S point-MLP evals are
    recomputed instead of stored, trading ~1 extra forward for O(samples)
    less HBM — the lever for scaling rays_per_batch (README.md:161-165's OOM
    hazard becomes a flag).
    """

    cfg: ModelCfg = ModelCfg()
    compute_dtype: Optional[jnp.dtype] = None
    remat: bool = False

    def setup(self):
        cfg = self.cfg
        self.encoder = EncoderResnet(cfg=cfg.encoder, compute_dtype=self.compute_dtype,
                                     name="encoder")
        encoder_dim = EncoderResnet.output_dim(cfg.encoder)
        self.decoder = get_action_decoder(
            cfg.action_decoder, action_dim=cfg.action_dim, encoder_dim=encoder_dim,
            compute_dtype=self.compute_dtype, remat=self.remat,
            fused_trunk=cfg.rendering.use_fused_trunk,
        )
        self.proposal_networks = [
            DensityDecoderMlp(cfg=cfg.density_decoder, encoder_dim=encoder_dim,
                              compute_dtype=self.compute_dtype, remat=self.remat,
                              fused_trunk=cfg.rendering.use_fused_trunk,
                              name=f"proposal_networks_{i}")
            for i in range(len(cfg.rendering.num_proposal_samples))
        ]
        self.sampler_cfg = ProposalSamplerCfg(
            num_proposal_samples=tuple(cfg.rendering.num_proposal_samples),
            num_nerf_samples=cfg.rendering.num_nerf_samples,
            single_jitter=cfg.rendering.single_jitter,
            initial_spacing="uniform",
            # resolved per-backend: off-TPU the kernel would run in Pallas
            # interpret mode, far slower than the XLA sampler it replaces
            use_pallas_pdf=cfg.rendering.use_pallas_pdf
            and jax.default_backend() == "tpu",
        )

    # -- building blocks ----------------------------------------------------

    def compute_ray_bundle(self, rendering_input: RenderingInput) -> RayBundle:
        ones = jnp.ones_like(rendering_input.origins[..., :1])
        return RayBundle(
            origins=rendering_input.origins,
            directions=rendering_input.directions,
            nears=ones * rendering_input.z_near[:, None, None],
            fars=ones * rendering_input.z_far[:, None, None],
        )

    def compute_pixel_encoding(self, camera_input: CameraInput,
                               robot_input: RobotInput,
                               train: bool = False) -> PixelEncoding:
        """models/model.py:398-414. The feature map is kept in compute_dtype:
        the pixel-aligned gathers (and their backward scatters) are the
        train step's HBM bottleneck — bf16 halves that traffic. In the
        "pyramid" encoder layout the levels are repacked HERE, once per step,
        into the K1 gather-ready layout (ops/pixel_gather.py)."""
        from ..ops.pixel_gather import FeaturePyramid, pack_pyramid

        features = self.encoder(camera_input.input_image, train=train)
        if self.compute_dtype is not None:
            features = features.astype(self.compute_dtype)
        if isinstance(features, FeaturePyramid):
            features = pack_pyramid(features)
        return PixelEncoding(
            features=features,
            extrinsics=camera_input.ctxt_extrinsics,
            intrinsics=camera_input.ctxt_intrinsics,
            action=robot_input.robot_action,
        )

    def attach_ray_features(self, pixel_encoding: PixelEncoding,
                            ray_bundle: RayBundle) -> PixelEncoding:
        """K1b: in "epipolar" mode, swap the PackedPyramid for per-ray knot
        textures (ops/epipolar.py) once the rays are known. Knots are built
        once and shared by the proposal and nerf stages. No-op in "exact"
        mode or when the encoder layout is not the pyramid."""
        from ..ops.epipolar import build_ray_knots
        from ..ops.pixel_gather import PackedPyramid

        if (self.cfg.rendering.pixel_feature_mode != "epipolar"
                or not isinstance(pixel_encoding.features, PackedPyramid)):
            return pixel_encoding
        knots = build_ray_knots(
            pixel_encoding.features,
            ray_bundle.origins, ray_bundle.directions,
            ray_bundle.nears[..., 0], ray_bundle.fars[..., 0],
            pixel_encoding.extrinsics, pixel_encoding.intrinsics,
            num_knots=tuple(self.cfg.rendering.epipolar_knots),
        )
        return pixel_encoding.replace(features=knots)

    def compute_proposal(self, ray_bundle: RayBundle, pixel_encoding: PixelEncoding,
                         ctx: StepCtx, stratified: bool = True):
        """models/model.py:227-255."""
        density_fns = [
            (lambda xyz, net=net: net(xyz, pixel_encoding))
            for net in self.proposal_networks
        ]
        ray_samples, weights_list, ray_samples_list = proposal_sample(
            ctx.key, ray_bundle, density_fns, self.sampler_cfg,
            anneal=ctx.anneal, updated=ctx.updated, stratified=stratified,
        )
        positions = ray_samples.get_positions()
        directions = jnp.broadcast_to(
            ray_bundle.directions[..., None, :], positions.shape
        )
        return ray_samples, positions, directions, weights_list, ray_samples_list

    @staticmethod
    def render_optical_flow(weights, ray_positions, scene_flow,
                            trgt_extrinsics, trgt_intrinsics):
        """Composite t0/warped positions, project both, subtract
        (models/model.py:288-314). Differentiable wrt the action."""
        warped = ray_positions + scene_flow
        pos = jnp.sum(weights * ray_positions, axis=-2)
        pos_warped = jnp.sum(weights * warped, axis=-2)
        uv = project_world_coords_to_camera(pos, trgt_extrinsics, trgt_intrinsics)
        uv_warped = project_world_coords_to_camera(pos_warped, trgt_extrinsics, trgt_intrinsics)
        return uv_warped - uv, pos, pos_warped

    # -- main forward --------------------------------------------------------

    def __call__(self, model_input: ModelInput, ctx: StepCtx, train: bool = False,
                 compute_vis_features: bool = False) -> ModelOutput:
        """models/model.py:316-396."""
        camera_input = model_input.camera_input
        ray_bundle = self.compute_ray_bundle(model_input.rendering_input)
        pixel_encoding = self.compute_pixel_encoding(
            camera_input, model_input.robot_input, train=train
        )
        pixel_encoding = self.attach_ray_features(pixel_encoding, ray_bundle)

        (ray_samples, positions, directions, weights_list, ray_samples_list) = (
            self.compute_proposal(ray_bundle, pixel_encoding, ctx, stratified=train)
        )

        decoder_output = self.decoder(positions, directions, pixel_encoding)

        weights = ray_samples.get_weights(decoder_output.density)
        weights_list = weights_list + [weights]
        ray_samples_list = ray_samples_list + [ray_samples]

        rgb = jnp.sum(weights * decoder_output.color, axis=-2)
        steps = (ray_samples.starts + ray_samples.ends) / 2
        depth = jnp.sum(weights * steps, axis=-2) / (jnp.sum(weights, axis=-2) + 1e-10)
        depth = jnp.clip(depth, jnp.min(steps), jnp.max(steps))

        optical_flow, pos, pos_warped = self.render_optical_flow(
            weights, positions, decoder_output.flow[..., :3],
            camera_input.trgt_extrinsics, camera_input.trgt_intrinsics,
        )

        out = ModelOutput(rgb=rgb, depth=depth, optical_flow=optical_flow)
        if train:
            out = out.replace(
                weights_list=tuple(weights_list),
                sdist_list=tuple(sdist_edges(rs) for rs in ray_samples_list),
                tdist_list=tuple(tdist_edges(rs) for rs in ray_samples_list),
            )
        if compute_vis_features:
            out = out.replace(
                action_features=jnp.sum(weights * decoder_output.action_features, axis=-2),
                ray_positions=pos,
                ray_positions_warped=pos_warped,
                weights=weights[..., 0],
                steps=steps[..., 0],
            )
        return out

    # -- inference surface ---------------------------------------------------

    def encode_image(self, camera_input: CameraInput,
                     rendering_input: RenderingInput, robot_input: RobotInput,
                     ctx: StepCtx) -> ModelInferenceEncoding:
        """Evaluate the field once for inverse dynamics (models/model.py:458-495)."""
        ray_bundle = self.compute_ray_bundle(rendering_input)
        pixel_encoding = self.compute_pixel_encoding(camera_input, robot_input)
        pixel_encoding = self.attach_ray_features(pixel_encoding, ray_bundle)
        ray_samples, positions, _, _, _ = self.compute_proposal(
            ray_bundle, pixel_encoding, ctx, stratified=False
        )
        density, action_features = self.decoder.encode_image(positions, pixel_encoding)
        weights = ray_samples.get_weights(density)
        return ModelInferenceEncoding(
            density=density, action_features=action_features, weights=weights,
            ray_samples_positions=positions,
        )

    def infer_optical_flow(self, encoding: ModelInferenceEncoding,
                           camera_input: CameraInput,
                           robot_input: RobotInput) -> jax.Array:
        """Flow from a cached encoding — einsum + projection only, no field
        re-eval (models/model.py:497-525). Returns [B, R, 2]."""
        action = robot_input.robot_action
        j = encoding.action_features.reshape(
            *encoding.action_features.shape[:-1], action.shape[-1], -1
        )
        scene_flow = jnp.einsum("brsat,ba->brst", j, action)
        optical_flow, _, _ = self.render_optical_flow(
            encoding.weights, encoding.ray_samples_positions, scene_flow[..., :3],
            camera_input.trgt_extrinsics, camera_input.trgt_intrinsics,
        )
        return optical_flow


def make_model_cfg(action_decoder_name: str = "jacobian_transformer",
                   action_dim: int = 8, **overrides) -> ModelCfg:
    """Convenience constructor dispatching the action-decoder union by name
    (models/decoder/__init__.py:22-27)."""
    decoder_cfg_cls, _ = DECODERS[action_decoder_name]
    return ModelCfg(
        action_dim=action_dim,
        action_decoder=decoder_cfg_cls(),
        **overrides,
    )
