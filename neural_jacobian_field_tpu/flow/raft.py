"""RAFT optical flow (Flax/JAX, TPU-native port).

Replaces the reference's torchvision `raft_large` wrapper
(project/raft_wrapper/raft.py:77-137) used to precompute flow supervision.
Architecture follows the official RAFT (princeton-vl/RAFT, ECCV'20):
  - feature encoder (instance-norm residual CNN) -> [H/8, W/8, 256] per image;
  - context encoder (batch-norm-free here: instance norm) -> hidden(128,tanh)
    + context(128, relu);
  - 4-level all-pairs correlation pyramid, radius-4 lookups;
  - SepConvGRU update block iterated `num_iters` times (default 20, matching
    raft.py:94), flow head + convex-upsampling mask.

TPU design notes:
  - the all-pairs correlation volume is ONE big [N, HW, HW] matmul (MXU) and
    the pyramid is average-pooling over the last two dims; lookups are the
    fused bilinear gather from ops/grid_sample.py;
  - the GRU iteration is a `lax.scan` — one compiled step, 20x unrolled by XLA
    scheduling, not 20 dispatches;
  - weights port from an official RAFT checkpoint via
    `load_torch_raft_state_dict` (zero-egress fallback: random init, still
    useful for tests/shape-parity; flow *quality* then requires the ported
    checkpoint file).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.grid_sample import grid_sample_bilinear

NUM_LEVELS = 4
RADIUS = 4


class _FrozenBatchNorm(nn.Module):
    """Eval-mode BatchNorm with checkpoint-ported statistics.

    The official raft-things/raft_large CONTEXT encoder uses BatchNorm2d
    (norm_fn="batch"); frozen at inference it is a per-channel affine built
    from the running stats + learned scale/bias. mean/var carry
    stop_gradient so a from-scratch training run (the synthetic sanity test)
    can't drift them — they stay identity unless ported.
    """

    eps: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (ch,))
        bias = self.param("bias", nn.initializers.zeros, (ch,))
        mean = jax.lax.stop_gradient(self.param("mean", nn.initializers.zeros, (ch,)))
        var = jax.lax.stop_gradient(self.param("var", nn.initializers.ones, (ch,)))
        w = scale * jax.lax.rsqrt(var + self.eps)
        b = bias - mean * w
        return x * w.astype(x.dtype) + b.astype(x.dtype)


def _make_norm(norm_type: str, dtype, name: str):
    if norm_type == "batch":
        return _FrozenBatchNorm(dtype=dtype, name=name)
    # instance norm, no affine (official fnet); eps 1e-5 = torch
    # InstanceNorm2d's default (flax GroupNorm defaults to 1e-6)
    return nn.GroupNorm(num_groups=None, group_size=1, use_bias=False,
                        use_scale=False, epsilon=1e-5, dtype=dtype, name=name)


class _ResBlock(nn.Module):
    ch: int
    stride: int = 1
    norm_type: str = "instance"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        def norm(name):
            return _make_norm(self.norm_type, self.dtype, name)

        y = nn.Conv(self.ch, (3, 3), strides=self.stride, padding=1,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(norm("norm1")(y))
        y = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(norm("norm2")(y))
        if self.stride != 1 or x.shape[-1] != self.ch:
            x = nn.Conv(self.ch, (1, 1), strides=self.stride, dtype=self.dtype,
                        name="downsample")(x)
            x = norm("norm3")(x)
        return nn.relu(x + y)


class _Encoder(nn.Module):
    """fnet/cnet trunk: 1/8 resolution, `out_ch` channels.

    norm_type: "instance" for fnet, "batch" (frozen) for cnet — matching the
    official raft-things/raft_large norm_fn split so ported checkpoints
    reproduce the torch numerics.
    """

    out_ch: int = 256
    norm_type: str = "instance"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        x = nn.Conv(64, (7, 7), strides=2, padding=3, dtype=dt, name="conv1")(x)
        x = _make_norm(self.norm_type, dt, "norm1")(x)
        x = nn.relu(x)
        for i, (ch, stride) in enumerate(((64, 1), (96, 2), (128, 2))):
            x = _ResBlock(ch=ch, stride=stride, norm_type=self.norm_type,
                          dtype=dt, name=f"layer{i + 1}_0")(x)
            x = _ResBlock(ch=ch, stride=1, norm_type=self.norm_type,
                          dtype=dt, name=f"layer{i + 1}_1")(x)
        return nn.Conv(self.out_ch, (1, 1), dtype=dt, name="conv2")(x)


def _corr_pyramid(f1: jax.Array, f2: jax.Array):
    """All-pairs correlation + avg-pool pyramid.

    f1, f2: [N, H, W, C]. Returns list of [N*H*W, h_l, w_l, 1] volumes.
    """
    n, h, w, c = f1.shape
    corr = jnp.einsum("nxc,nyc->nxy", f1.reshape(n, h * w, c),
                      f2.reshape(n, h * w, c)) / jnp.sqrt(c).astype(f1.dtype)
    corr = corr.reshape(n * h * w, h, w, 1)
    pyramid = [corr]
    for _ in range(NUM_LEVELS - 1):
        corr = nn.avg_pool(corr, (2, 2), strides=(2, 2))
        pyramid.append(corr)
    return pyramid


def _corr_lookup(pyramid, coords: jax.Array):
    """Radius-4 bilinear lookups at every level.

    coords: [N, H, W, 2] current correspondence (x, y) at 1/8 res.
    Returns [N, H, W, NUM_LEVELS*(2r+1)^2].
    """
    n, h, w, _ = coords.shape
    r = RADIUS
    # official channel order: delta = stack(meshgrid(di, dj, indexing="ij"))
    # added to (x, y) — the X offset varies SLOWEST across the 81 lookup
    # channels (princeton-vl corr.py / torchvision raft CorrBlock). The
    # "xy" form is the same lookup set in transposed order, which would
    # scramble the channels into update_motion.convc1 under ported weights.
    d = jnp.stack(jnp.meshgrid(jnp.arange(-r, r + 1.0), jnp.arange(-r, r + 1.0),
                               indexing="ij"), -1).reshape(-1, 2)  # [(2r+1)^2, 2]
    out = []
    for lvl, corr in enumerate(pyramid):
        ch, cw = corr.shape[1:3]
        centers = coords.reshape(n * h * w, 1, 2) / (2.0 ** lvl)
        pts = centers + d[None]  # [NHW, K, 2]
        # to [-1, 1] (align_corners=True convention of grid_sample)
        gx = pts[..., 0] / jnp.maximum(cw - 1, 1) * 2.0 - 1.0
        gy = pts[..., 1] / jnp.maximum(ch - 1, 1) * 2.0 - 1.0
        # zeros padding: the official bilinear_sampler is F.grid_sample with
        # the DEFAULT padding_mode — OOB corr entries read 0, not the border
        # value (matters for every pixel within `r` texels of the edge)
        sampled = grid_sample_bilinear(corr, jnp.stack([gx, gy], -1),
                                       padding_mode="zeros")
        out.append(sampled.reshape(n, h, w, -1))
    return jnp.concatenate(out, axis=-1)


class _MotionEncoder(nn.Module):
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, flow, corr):
        dt = self.dtype
        c = nn.relu(nn.Conv(256, (1, 1), dtype=dt, name="convc1")(corr))
        c = nn.relu(nn.Conv(192, (3, 3), padding=1, dtype=dt, name="convc2")(c))
        f = nn.relu(nn.Conv(128, (7, 7), padding=3, dtype=dt, name="convf1")(flow))
        f = nn.relu(nn.Conv(64, (3, 3), padding=1, dtype=dt, name="convf2")(f))
        cf = jnp.concatenate([c, f], -1)
        cf = nn.relu(nn.Conv(126, (3, 3), padding=1, dtype=dt, name="conv")(cf))
        return jnp.concatenate([cf, flow], -1)  # 128


class _SepConvGRU(nn.Module):
    hidden: int = 128
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, h, x):
        dt = self.dtype

        def gru(h, x, ks, name):
            hx = jnp.concatenate([h, x], -1)
            z = nn.sigmoid(nn.Conv(self.hidden, ks, padding="SAME", dtype=dt,
                                   name=f"{name}_convz")(hx))
            r = nn.sigmoid(nn.Conv(self.hidden, ks, padding="SAME", dtype=dt,
                                   name=f"{name}_convr")(hx))
            q = nn.tanh(nn.Conv(self.hidden, ks, padding="SAME", dtype=dt,
                                name=f"{name}_convq")(
                jnp.concatenate([r * h, x], -1)))
            return (1 - z) * h + z * q

        h = gru(h, x, (1, 5), "horiz")
        h = gru(h, x, (5, 1), "vert")
        return h


class _FlowHead(nn.Module):
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, h):
        x = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h))
        out = nn.Conv(2, (3, 3), padding=1, name="conv2")(x)
        # pin f32 only when running a reduced compute dtype (bf16); a
        # no-op in f32 and it must not downcast the f64 golden tests
        return out.astype(jnp.float32) if self.dtype is not None else out


class RAFT(nn.Module):
    """__call__(image1, image2 [N, H, W, 3] in [0,1]) -> flow [N, H, W, 2]
    (pixels). H, W must be multiples of 8 (use InputPadder)."""

    num_iters: int = 20
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, image1: jax.Array, image2: jax.Array,
                 return_low_res: bool = False):
        dt = self.dtype
        # official RAFT normalizes to [-1, 1]
        x1 = (image1 * 2.0 - 1.0).astype(dt) if dt else image1 * 2.0 - 1.0
        x2 = (image2 * 2.0 - 1.0).astype(dt) if dt else image2 * 2.0 - 1.0

        fnet = _Encoder(out_ch=256, dtype=dt, name="fnet")
        def pin(t):
            # f32 accumulators when computing in bf16; identity otherwise
            return t.astype(jnp.float32) if dt is not None else t

        f1 = pin(fnet(x1))
        f2 = pin(fnet(x2))
        pyramid = _corr_pyramid(f1, f2)

        cmap = _Encoder(out_ch=256, norm_type="batch", dtype=dt, name="cnet")(x1)
        hidden = pin(nn.tanh(cmap[..., :128]))
        context = pin(nn.relu(cmap[..., 128:]))

        n, h, w, _ = f1.shape
        xs, ys = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                              jnp.arange(h, dtype=jnp.float32), indexing="xy")
        coords0 = jnp.broadcast_to(jnp.stack([xs, ys], -1)[None], (n, h, w, 2))

        motion_encoder = _MotionEncoder(dtype=dt, name="update_motion")
        gru = _SepConvGRU(dtype=dt, name="update_gru")
        flow_head = _FlowHead(dtype=dt, name="update_flow_head")
        # convex upsampling mask head (official: 256 -> 64*9)
        mask_c1 = nn.Conv(256, (3, 3), padding=1, dtype=dt, name="mask_conv1")
        mask_c2 = nn.Conv(64 * 9, (1, 1), name="mask_conv2")

        # Unrolled refinement loop (matches the official implementation;
        # modules can't be called inside lax.scan under nn.compact — XLA
        # still schedules the 20 GRU steps as one fused program).
        coords = coords0
        for _ in range(self.num_iters):
            coords = jax.lax.stop_gradient(coords)  # official detach per iter
            corr = _corr_lookup(pyramid, coords)
            flow = coords - coords0
            motion = motion_encoder(flow, corr)
            inp = jnp.concatenate([context, motion], -1)
            hidden = gru(hidden, inp)
            delta = flow_head(hidden)
            coords = coords + delta

        flow_low = coords - coords0  # [N, h, w, 2]
        if return_low_res:
            return flow_low

        # convex upsampling (official upsample_flow); the 0.25 mask-logit
        # scale is the official BasicUpdateBlock's "scale mask to balance
        # gradients" — it changes the softmax temperature, so ported
        # checkpoints need it for numeric parity
        mask = 0.25 * pin(mask_c2(nn.relu(mask_c1(hidden))))
        mask = mask.reshape(n, h, w, 9, 8 * 8)
        mask = jax.nn.softmax(mask, axis=-2)
        # 3x3 neighborhood of the low-res flow, scaled by 8
        pads = [(0, 0), (1, 1), (1, 1), (0, 0)]
        fl = jnp.pad(flow_low * 8.0, pads)
        neighbors = jnp.stack([
            fl[:, dy:dy + h, dx:dx + w] for dy in range(3) for dx in range(3)
        ], axis=-2)  # [N, h, w, 9, 2]
        up = jnp.einsum("nhwkp,nhwkc->nhwpc", mask, neighbors)  # p=64
        up = up.reshape(n, h, w, 8, 8, 2)
        up = up.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * 8, w * 8, 2)
        return up


class InputPadder:
    """Pad images to a multiple of 8 (raft_wrapper/raft.py:51-74)."""

    def __init__(self, shape: Tuple[int, ...]):
        h, w = shape[-3:-1]
        pad_h = (-h) % 8
        pad_w = (-w) % 8
        self._pad = (pad_h // 2, pad_h - pad_h // 2, pad_w // 2, pad_w - pad_w // 2)
        self._hw = (h, w)

    def pad(self, *images):
        t, b, l, r = self._pad
        out = [jnp.pad(im, [(0, 0), (t, b), (l, r), (0, 0)], mode="edge")
               for im in images]
        return out if len(out) > 1 else out[0]

    def unpad(self, flow):
        t, b, l, r = self._pad
        h, w = self._hw
        return flow[:, t:t + h, l:l + w]


def compute_video_flow(raft: RAFT, variables, video: jax.Array,
                       chunk: int = 8, backward: bool = False) -> jax.Array:
    """Sliding-window chunked video flow (raft_wrapper/raft.py:96-137).

    video: [T, H, W, 3] in [0,1]. Returns [T-1, H, W, 2] fwd (or bwd) flow.
    """
    src = video[:-1] if not backward else video[1:]
    dst = video[1:] if not backward else video[:-1]
    padder = InputPadder(src.shape)

    @jax.jit
    def run(a, b):
        a, b = padder.pad(a, b)
        return padder.unpad(raft.apply(variables, a, b))

    outs = []
    for i in range(0, len(src), chunk):
        outs.append(run(src[i:i + chunk], dst[i:i + chunk]))
    return jnp.concatenate(outs, axis=0)


def resize_batched_flow(flow: jax.Array, target_hw: Tuple[int, int]) -> jax.Array:
    """Resize flow maps, rescaling magnitudes with resolution
    (raft_wrapper/raft.py:32-48). flow: [B, H, W, 2]."""
    b, h, w, _ = flow.shape
    th, tw = target_hw
    scale = jnp.array([tw / w, th / h], dtype=flow.dtype)
    resized = jax.image.resize(flow, (b, th, tw, 2), method="bilinear")
    return resized * scale


def resize_batched_frames(frames: jax.Array, target_hw: Tuple[int, int]) -> jax.Array:
    """raft_wrapper/raft.py:13-29. frames: [B, H, W, C]."""
    b, _, _, c = frames.shape
    th, tw = target_hw
    return jax.image.resize(frames, (b, th, tw, c), method="bilinear")


def _translate_torchvision_raft_names(state_dict) -> dict:
    """torchvision `raft_large` state_dict names -> princeton-vl canonical.

    The reference consumes torchvision's RAFT (raft_wrapper/raft.py:8,81:
    `raft_large(weights=Raft_Large_Weights.DEFAULT)`), whose modules are
    Conv2dNormActivation Sequentials (`feature_encoder.convnormrelu.0` etc.)
    while the porter below speaks princeton names (`fnet.conv1`). The two
    architectures are weight-identical; this is a pure rename.
    """
    renames = {}

    def enc(tv, pv):
        renames[f"{tv}.convnormrelu.0"] = f"{pv}.conv1"
        renames[f"{tv}.convnormrelu.1"] = f"{pv}.norm1"
        renames[f"{tv}.conv"] = f"{pv}.conv2"
        for li in (1, 2, 3):
            for bi in (0, 1):
                b_tv = f"{tv}.layer{li}.{bi}"
                b_pv = f"{pv}.layer{li}.{bi}"
                renames[f"{b_tv}.convnormrelu1.0"] = f"{b_pv}.conv1"
                renames[f"{b_tv}.convnormrelu1.1"] = f"{b_pv}.norm1"
                renames[f"{b_tv}.convnormrelu2.0"] = f"{b_pv}.conv2"
                renames[f"{b_tv}.convnormrelu2.1"] = f"{b_pv}.norm2"
                renames[f"{b_tv}.downsample.0"] = f"{b_pv}.downsample.0"
                renames[f"{b_tv}.downsample.1"] = f"{b_pv}.norm3"

    enc("feature_encoder", "fnet")
    enc("context_encoder", "cnet")
    me = "update_block.motion_encoder"
    for tv, pv in (("convcorr1", "convc1"), ("convcorr2", "convc2"),
                   ("convflow1", "convf1"), ("convflow2", "convf2"),
                   ("conv", "conv")):
        renames[f"{me}.{tv}.0"] = f"update_block.encoder.{pv}"
    for tv_idx, pv_idx in (("1", "1"), ("2", "2")):
        for gate in ("convz", "convr", "convq"):
            renames[f"update_block.recurrent_block.convgru{tv_idx}.{gate}"] = \
                f"update_block.gru.{gate}{pv_idx}"
    renames["update_block.flow_head.conv1"] = "update_block.flow_head.conv1"
    renames["update_block.flow_head.conv2"] = "update_block.flow_head.conv2"
    renames["mask_predictor.convrelu.0"] = "update_block.mask.0"
    renames["mask_predictor.conv"] = "update_block.mask.2"

    out = {}
    for k, v in state_dict.items():
        base = k[len("module."):] if k.startswith("module.") else k
        stem, _, leaf = base.rpartition(".")
        new = renames.get(stem)
        out[f"{new}.{leaf}" if new is not None else base] = v
    return out


def load_torch_raft_state_dict(params, state_dict, unused_out: list = None) -> dict:
    """Port an official princeton-vl RAFT checkpoint (raft-things.pth etc.,
    'module.'-prefixed torch state_dict) OR a torchvision `raft_large`
    state_dict (the reference's actual dependency — names are auto-detected
    and translated) into RAFT Flax params.

    Consumes every tensor in the checkpoint (cnet BatchNorm scale/bias/
    running stats land in the _FrozenBatchNorm params); leftover keys other
    than num_batches_tracked counters are reported (appended to `unused_out`
    if given, printed otherwise) — a non-empty leftover set means the port
    is structurally incomplete for that checkpoint.
    """
    import numpy as np
    import flax.traverse_util as tu

    if any(k.split("module.")[-1].startswith(("feature_encoder.",
                                              "context_encoder."))
           for k in state_dict):
        state_dict = _translate_torchvision_raft_names(state_dict)

    flat = dict(tu.flatten_dict(params, sep="/"))
    used = set()

    def t(name):
        key = name if name in state_dict else f"module.{name}"
        used.add(key)
        return np.asarray(state_dict[key])

    def has(name):
        return name in state_dict or f"module.{name}" in state_dict

    def conv(dst, src):
        flat[f"{dst}/kernel"] = t(f"{src}.weight").transpose(2, 3, 1, 0)
        if has(f"{src}.bias"):
            flat[f"{dst}/bias"] = t(f"{src}.bias")

    def frozen_bn(dst, src):
        # BatchNorm2d: weight/bias + running stats -> _FrozenBatchNorm params
        if not has(f"{src}.running_mean"):
            return  # instance-norm checkpoint side (fnet): no tensors
        flat[f"{dst}/scale"] = t(f"{src}.weight")
        flat[f"{dst}/bias"] = t(f"{src}.bias")
        flat[f"{dst}/mean"] = t(f"{src}.running_mean")
        flat[f"{dst}/var"] = t(f"{src}.running_var")

    for net in ("fnet", "cnet"):
        conv(f"{net}/conv1", f"{net}.conv1")
        frozen_bn(f"{net}/norm1", f"{net}.norm1")
        conv(f"{net}/conv2", f"{net}.conv2")
        for li, layer in enumerate(("layer1", "layer2", "layer3"), start=1):
            for bi in range(2):
                base = f"{net}.{layer}.{bi}"
                dst = f"{net}/layer{li}_{bi}"
                conv(f"{dst}/conv1", f"{base}.conv1")
                conv(f"{dst}/conv2", f"{base}.conv2")
                frozen_bn(f"{dst}/norm1", f"{base}.norm1")
                frozen_bn(f"{dst}/norm2", f"{base}.norm2")
                if any(k.startswith(f"{base}.downsample") or
                       k.startswith(f"module.{base}.downsample")
                       for k in state_dict):
                    conv(f"{dst}/downsample", f"{base}.downsample.0")
                    # norm3 is registered both as .norm3 and .downsample.1
                    frozen_bn(f"{dst}/norm3", f"{base}.norm3")
                    for alias in (f"{base}.downsample.1", f"module.{base}.downsample.1"):
                        used.update(k for k in state_dict if k.startswith(alias))

    me = "update_block.encoder"
    conv("update_motion/convc1", f"{me}.convc1")
    conv("update_motion/convc2", f"{me}.convc2")
    conv("update_motion/convf1", f"{me}.convf1")
    conv("update_motion/convf2", f"{me}.convf2")
    conv("update_motion/conv", f"{me}.conv")
    for direction, prefix in (("horiz", "1"), ("vert", "2")):
        for gate in ("convz", "convr", "convq"):
            conv(f"update_gru/{direction}_{gate}", f"update_block.gru.{gate}{prefix}")
    conv("update_flow_head/conv1", "update_block.flow_head.conv1")
    conv("update_flow_head/conv2", "update_block.flow_head.conv2")
    conv("mask_conv1", "update_block.mask.0")
    conv("mask_conv2", "update_block.mask.2")

    leftovers = sorted(
        k for k in state_dict
        if k not in used and not k.endswith("num_batches_tracked")
    )
    if unused_out is not None:
        unused_out.extend(leftovers)
    elif leftovers:
        print(f"load_torch_raft_state_dict: {len(leftovers)} unported checkpoint "
              f"tensors: {leftovers[:8]}{'...' if len(leftovers) > 8 else ''}")
    return tu.unflatten_dict(flat, sep="/")
