"""PixelNeRF-style ResNet-34 feature-pyramid encoder (Flax, NHWC).

Re-design of the reference's models/encoder/encoder_resnet.py:15-89 +
model_components/get_norm_layer.py:6-27: a ResNet-34 trunk whose
conv1/layer1..layer{num_layers-1} activations are all bilinearly upsampled to
conv1's resolution (H/2, W/2) and concatenated channel-wise (512 channels at
num_layers=4).

TPU notes:
  - NHWC layout end to end (XLA's native conv layout on TPU; avoids the
    transposes a torch NCHW port would bake in).
  - Convs run on the MXU; `compute_dtype=bfloat16` halves HBM traffic with
    f32 params.
  - Norm options mirror the reference: "batch" (mutable running stats under
    the `batch_stats` collection), "instance" (no affine), "group" (32
    groups), "none". GroupNorm is the recommended choice under pjit — no
    cross-device stat sync needed (SURVEY.md §7 hard part (b)).
"""

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import initializers as init


@dataclass(frozen=True)
class EncoderResnetCfg:
    name: str = "resnet"
    upsample_interp: str = "bilinear"
    num_layers: int = 4
    use_first_pool: bool = True
    norm_type: str = "group"  # batch | instance | group | none
    # "pyramid": return a FeaturePyramid (layer2/3 kept at native resolution)
    # for the K1 gather path (ops/pixel_gather.py) — the TPU-fast default.
    # "concat": materialize the reference's upsampled 512-ch concat
    # (encoder_resnet.py:78-86) — bit-path parity mode. Requires num_layers=4
    # for "pyramid".
    feature_layout: str = "pyramid"
    # "pallas": route every BasicBlock 3x3 through the K9 fused-K Pallas
    # kernels and every 1x1 downsample through the conv-free einsum path
    # (ops/pallas/conv_suite.py) — NHWC-native grads, no conv-backward
    # layout churn. Unsupported shapes fall back to XLA per conv. The stem
    # 7x7 + max-pool stay on XLA either way (r3: strided-stem relowering
    # measured 2.4-2.7x worse).
    # "pallas_fused": K9 convs PLUS the K10 BatchNorm-stats fold — each
    # stride-1 3x3's training-mode batch stats come out of the conv
    # kernel's f32 accumulator (conv_suite.conv3x3_stats), so the BN stats
    # pass never re-reads the conv output from HBM. Only meaningful with
    # norm_type="batch"; otherwise identical to "pallas". Param tree is
    # identical across all three impls (checkpoints interchangeable).
    conv_impl: str = "xla"  # xla | pallas | pallas_fused


# ResNet-34 stage spec: (num_blocks, channels) per layer.
_RESNET34_STAGES: Sequence = ((3, 64), (4, 128), (6, 256), (3, 512))


def _norm(norm_type: str, dtype, name: str):
    if norm_type == "batch":
        # use_running_average is bound by the caller via `train` kwarg.
        return nn.BatchNorm(use_running_average=None, momentum=0.9, epsilon=1e-5,
                            dtype=dtype, name=name)
    if norm_type == "instance":
        # torch InstanceNorm2d(affine=False): normalize over H, W per channel.
        return nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                            use_bias=False, use_scale=False, dtype=dtype, name=name)
    if norm_type == "group":
        return nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=dtype, name=name)
    if norm_type == "none":
        return None
    raise ValueError(f"unknown norm_type: {norm_type}")


class _ConvK9(nn.Module):
    """Drop-in nn.Conv replacement routing through the K9 Pallas conv suite
    (ops/pallas/conv_suite.py). Param tree is identical to nn.Conv
    ({name}/kernel, HWIO, f32 params) so checkpoints are interchangeable
    between conv_impl settings. Off-family shapes fall back to the same
    lax.conv_general_dilated call nn.Conv would emit.

    With `emit_stats=True` (K10, stride-1 3x3 on-family only) __call__
    returns (y, sum, sumsq) — per-channel output stats from the conv
    kernel's f32 accumulator, for BatchNormFromStats; otherwise
    (y, None, None) so the caller's BN computes its own stats."""

    features: int
    kernel_size: int  # 3 (BasicBlock convs) or 1 (downsample projection)
    strides: int
    compute_dtype: Optional[jnp.dtype] = None
    emit_stats: bool = False

    @nn.compact
    def __call__(self, x):
        from ..ops.pallas import conv_suite as k9

        kernel = self.param(
            "kernel", init.kaiming_normal_out,
            (self.kernel_size, self.kernel_size, x.shape[-1], self.features))
        dt = self.compute_dtype
        if dt is not None:
            x = x.astype(dt)
            kernel = kernel.astype(dt)
        if self.kernel_size == 1:
            return k9.conv1x1(x, kernel, self.strides), None, None
        if k9.conv3x3_supported(x.shape, self.features, self.strides,
                                dtype=x.dtype):
            if self.emit_stats and self.strides == 1:
                return k9.conv3x3_stats(x, kernel)
            return k9.conv3x3(x, kernel, self.strides), None, None
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(self.strides, self.strides),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y, None, None


class BatchNormFromStats(nn.Module):
    """nn.BatchNorm-equivalent normalization that can consume a precomputed
    per-channel (sum, sumsq) of its input over the (B, H, W) axes — K10:
    the stats arrive free from the K9 conv epilogue
    (ops/pallas/conv_suite.conv3x3_stats), so training-mode BN never
    re-reads the conv output from HBM. With s1/s2 None it computes the same
    stats itself (mean / E[x^2] - mean^2 in f32 — flax's own formulation),
    so it is usable for every norm site in the block.

    Param/variable tree is IDENTICAL to nn.BatchNorm (params {scale, bias},
    batch_stats {mean, var}; momentum 0.9, biased variance) — checkpoints
    are interchangeable with the other conv_impl settings, and the torch
    running-stats semantics proven in tests/test_torch_golden.py carry
    over unchanged."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, y, s1=None, s2=None, use_running_average: bool = False):
        c = y.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            ft = jnp.promote_types(y.dtype, jnp.float32)
            n = y.size // c
            if s1 is None:
                yf = y.astype(ft)
                s1 = jnp.sum(yf, axis=(0, 1, 2))
                s2 = jnp.sum(yf * yf, axis=(0, 1, 2))
            mean = s1.astype(ft) / n
            # biased variance, clamped: the sumsq form can go slightly
            # negative under rounding where the true variance is ~0
            var = jnp.maximum(s2.astype(ft) / n - mean * mean, 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (m * ra_mean.value
                                 + (1.0 - m) * mean.astype(jnp.float32))
                ra_var.value = (m * ra_var.value
                                + (1.0 - m) * var.astype(jnp.float32))
        # match flax._normalize: math in the promoted (>= f32) dtype, one
        # downcast at the end
        mul = jax.lax.rsqrt(var + self.epsilon) * scale
        out = (y - mean) * mul + bias
        return out.astype(self.dtype or out.dtype)


class BasicBlock(nn.Module):
    """ResNet basic block (two 3x3 convs + identity/projection shortcut)."""

    channels: int
    strides: int
    norm_type: str
    compute_dtype: Optional[jnp.dtype] = None
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.compute_dtype
        needs_proj = self.strides != 1 or x.shape[-1] != self.channels
        pallas = self.conv_impl in ("pallas", "pallas_fused")
        # K10: fold training-mode BN stats into the stride-1 conv kernels
        fuse_bn = (self.conv_impl == "pallas_fused"
                   and self.norm_type == "batch")

        def norm(name):
            if fuse_bn:
                layer = BatchNormFromStats(dtype=dt, name=name)
                return lambda v, s1=None, s2=None: layer(
                    v, s1, s2, use_running_average=not train)
            layer = _norm(self.norm_type, dt, name)
            if layer is None:
                return lambda v, s1=None, s2=None: v
            if self.norm_type == "batch":
                return lambda v, s1=None, s2=None: layer(
                    v, use_running_average=not train)
            return lambda v, s1=None, s2=None: layer(v)

        def conv(name, ksize, strides):
            if pallas:
                k9 = _ConvK9(self.channels, ksize, strides, compute_dtype=dt,
                             emit_stats=fuse_bn and train, name=name)
                return lambda v: k9(v)
            mod = nn.Conv(self.channels, (ksize, ksize), strides=strides,
                          padding=(ksize - 1) // 2, use_bias=False,
                          kernel_init=init.kaiming_normal_out, dtype=dt,
                          name=name)
            return lambda v: (mod(v), None, None)

        residual = x
        y, s1, s2 = conv("conv1", 3, self.strides)(x)
        y = norm("bn1")(y, s1, s2)
        y = nn.relu(y)
        y, s1, s2 = conv("conv2", 3, 1)(y)
        y = norm("bn2")(y, s1, s2)

        if needs_proj:
            residual, s1, s2 = conv("downsample_conv", 1, self.strides)(x)
            residual = norm("downsample_norm")(residual, s1, s2)

        return nn.relu(y + residual)


class EncoderResnet(nn.Module):
    """ResNet-34 multi-scale feature extractor.

    __call__(rgb [B, H, W, 3]) -> feature_layout="concat": one
    [B, H/2, W/2, C_total] map (C_total = 64 + sum of stage channels for
    stages < num_layers); feature_layout="pyramid": a FeaturePyramid
    (ops/pixel_gather.py) with the same channels split across native
    resolutions.
    """

    cfg: EncoderResnetCfg
    compute_dtype: Optional[jnp.dtype] = None

    @staticmethod
    def output_dim(cfg: EncoderResnetCfg) -> int:
        dims = 64
        for i in range(cfg.num_layers - 1):
            dims += _RESNET34_STAGES[i][1]
        return dims

    @nn.compact
    def __call__(self, rgb: jax.Array, train: bool = False):
        cfg = self.cfg
        dt = self.compute_dtype
        x = rgb.astype(dt) if dt is not None else rgb

        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    kernel_init=init.kaiming_normal_out, dtype=dt, name="conv1")(x)
        norm1 = _norm(cfg.norm_type, dt, "bn1")
        if norm1 is not None:
            x = norm1(x, use_running_average=not train) if cfg.norm_type == "batch" else norm1(x)
        x = nn.relu(x)

        latents = [x]
        for stage_idx in range(cfg.num_layers - 1):
            num_blocks, channels = _RESNET34_STAGES[stage_idx]
            if stage_idx == 0:
                if cfg.use_first_pool:
                    x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
                strides = 1
            else:
                strides = 2
            for block_idx in range(num_blocks):
                x = BasicBlock(
                    channels=channels,
                    strides=strides if block_idx == 0 else 1,
                    norm_type=cfg.norm_type,
                    compute_dtype=dt,
                    conv_impl=cfg.conv_impl,
                    name=f"layer{stage_idx + 1}_block{block_idx}",
                )(x, train=train)
            latents.append(x)

        target_hw = latents[0].shape[1:3]

        def up_to_fine(lat):
            # encoder_resnet.py:78-86: bilinear align_corners=False ==
            # jax.image.resize "linear".
            return jax.image.resize(
                lat, (lat.shape[0], *target_hw, lat.shape[-1]), method="linear"
            )

        if cfg.feature_layout == "pyramid" and cfg.num_layers == 4:
            # K1 layout: conv1 ++ up2(layer1) at conv1 res; layer2/3 native.
            # Channel order matches the reference concat exactly, so trunk
            # lin_z weights are interchangeable between layouts. (Other
            # num_layers fall through to the concat layout — the pyramid
            # split is a num_layers=4 optimization.)
            from ..ops.pixel_gather import FeaturePyramid

            return FeaturePyramid(
                fine=jnp.concatenate([latents[0], up_to_fine(latents[1])], axis=-1),
                mid=latents[2],
                coarse=latents[3],
            )

        # "concat": materialize the reference's upsampled concat map.
        resized = [latents[0]] + [up_to_fine(lat) for lat in latents[1:]]
        out = jnp.concatenate(resized, axis=-1)
        # pin f32 only when computing in a reduced dtype (bf16); must not
        # downcast f64 golden-parity runs
        return out.astype(jnp.float32) if dt is not None else out
