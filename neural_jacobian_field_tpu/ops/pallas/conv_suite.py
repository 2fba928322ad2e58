"""K9: the production Pallas conv suite for the ResNet-34 encoder.

VERDICT r4 item 1: round 4 priced the K8 prototype (ops/pallas/conv3x3.py)
at ~25% per-conv over XLA's lowering at the layer2 shape, and the round's
bucket attribution showed ~2.0 ms/step of conv-backward layout churn that
only NHWC-native grads can delete. This module is the full suite:

  - `conv3x3(x, w, stride)` — 3x3 same-pad conv, NHWC end to end:
      * stride 1 (custom_vjp, the 27-of-30 hot family):
        fwd: fused-K Pallas kernel (all nine taps assembled into one
        [rows, 9C] x [9C, Cout] MXU matmul — the variant that measured
        32.7 TFLOP/s vs XLA's 24.9 in benchmarks/conv_kernel_bench.py);
        dgrad: the SAME fwd kernel on the rotated/transposed weights (a
        stride-1 same-pad conv's input grad is itself such a conv) — no
        XLA conv op, so none of the {3,2,1,0}<->{3,0,2,1} layout copies
        its grad lowering inserts;
        wgrad: fused assembly contracted against the cotangent, dW[9C,
        Cout] accumulated across the sequential Pallas grid in f32.
      * stride 2 (3 stage-entry convs per forward): a conv-free
        phase-split einsum in plain XLA (pad once, nine strided-slice +
        [C, Cout] matmul taps) — Mosaic cannot lower the in-kernel
        decimation a fused-K stride-2 kernel needs (>2-D gather, measured
        on-chip), and slice+einsum autodiff is already the NHWC-native
        dgrad/wgrad pair with no conv op emitted.
  - `conv1x1(x, w, stride)` — strided slice + einsum (plain jnp): no
    lax.conv op is ever emitted, so XLA tiles it straight onto the MXU
    with no internal conv layouts; autodiff of slice+einsum is already
    the right scatter/matmul pair.
  - `conv3x3_supported(...)` — static predicate the encoder uses to fall
    back to `lax.conv_general_dilated` off the known-good shape family.

Reference counterpart: every BasicBlock conv in torchvision resnet34
(reference models/encoder/encoder_resnet.py:15-89). The stem 7x7 and
max-pool stay on XLA (r3 measured strided-stem relowering 2.4-2.7x WORSE).

Layout notes (pallas_guide.md): blocks are NHWC with C on lanes and W on
sublanes; halo rows are fetched as clamped neighbor-block views and
zero-masked at the image border (K8's trick), so every tap becomes a
zero-filled column shift — pure sublane moves, no gathers. Accumulation is
at least f32 (`preferred_element_type=promote(input, f32)` — f64 inputs
keep f64 accumulation so the f64 parity tests are meaningful).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ---------------------------------------------------------------- helpers

_VMEM_ASM_CAP = 6 * 1024 * 1024  # cap on the fused assembly buffer (bytes)


def _acc_t(dtype):
    """Accumulator type: at least f32, f64 for f64 inputs."""
    return jnp.promote_types(dtype, jnp.float32)


def _shift_cols(rows, dx):
    """rows [..., W, C] shifted along W by (dx - 1) with zero fill."""
    if dx == 0:  # tap reads column j-1: shift right, zero at col 0
        return jnp.concatenate(
            [jnp.zeros_like(rows[..., :1, :]), rows[..., :-1, :]], axis=-2)
    if dx == 2:  # tap reads column j+1: shift left, zero at col W-1
        return jnp.concatenate(
            [rows[..., 1:, :], jnp.zeros_like(rows[..., :1, :])], axis=-2)
    return rows


def _pick_rb(h_out: int) -> int | None:
    """Output-row block size: prefer the measured-best 10 (conv_kernel_bench
    rb sweep), else the largest divisor of h_out in [4, 16]."""
    if h_out % 10 == 0:
        return 10
    for rb in range(16, 3, -1):
        if h_out % rb == 0:
            return rb
    return None


def conv3x3_supported(x_shape, cout: int, stride: int,
                      dtype=jnp.bfloat16) -> bool:
    """Static predicate: is (shape, stride) on the kernel's shape family?"""
    if len(x_shape) != 4 or stride not in (1, 2):
        return False
    b, h, w, c = x_shape
    if stride == 2 and (h % 2 or w % 2):
        return False
    h_out, w_out = h // stride, w // stride
    rb = _pick_rb(h_out)
    if rb is None or w_out < 2:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    asm_bytes = rb * w_out * 9 * c * itemsize
    return asm_bytes <= _VMEM_ASM_CAP


# ------------------------------------------------------- stride-1 kernels


def _s1_fwd_kernel(top_ref, mid_ref, bot_ref, w_ref, out_ref, *, rb, nrb):
    r = pl.program_id(1)
    top = top_ref[0]  # [RB, W, C] block r-1 (clamped) — only its last row
    mid = mid_ref[0]
    bot = bot_ref[0]  # block r+1 (clamped) — only its first row
    zt = jnp.where(r == 0, 0.0, 1.0).astype(mid.dtype)
    zb = jnp.where(r == nrb - 1, 0.0, 1.0).astype(mid.dtype)
    xblk = jnp.concatenate([top[-1:] * zt, mid, bot[:1] * zb], axis=0)
    w, c = mid.shape[1], mid.shape[2]
    pieces = []
    for dy in range(3):
        rows = xblk[dy:dy + rb]
        for dx in range(3):
            pieces.append(_shift_cols(rows, dx).reshape(rb * w, c))
    asm = jnp.concatenate(pieces, axis=-1)  # [RB*W, 9C], tap-major (dy*3+dx)
    acc = jnp.dot(asm, w_ref[...], preferred_element_type=_acc_t(asm.dtype))
    out_ref[0] = acc.reshape(rb, w, -1).astype(out_ref.dtype)


def _s1_wgrad_kernel(top_ref, mid_ref, bot_ref, g_ref, out_ref, *, rb, nrb):
    bi = pl.program_id(0)
    r = pl.program_id(1)
    top = top_ref[0]
    mid = mid_ref[0]
    bot = bot_ref[0]
    zt = jnp.where(r == 0, 0.0, 1.0).astype(mid.dtype)
    zb = jnp.where(r == nrb - 1, 0.0, 1.0).astype(mid.dtype)
    xblk = jnp.concatenate([top[-1:] * zt, mid, bot[:1] * zb], axis=0)
    w, c = mid.shape[1], mid.shape[2]
    pieces = []
    for dy in range(3):
        rows = xblk[dy:dy + rb]
        for dx in range(3):
            pieces.append(_shift_cols(rows, dx).reshape(rb * w, c))
    asm = jnp.concatenate(pieces, axis=-1)  # [RB*W, 9C]
    gf = g_ref[0].reshape(rb * w, -1)       # [RB*W, Cout]

    @pl.when((bi == 0) & (r == 0))
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += jax.lax.dot_general(
        asm, gf, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _s1_fwd(x, w, interpret=False):
    """x [B, H, W, C], w [3, 3, C, Cout] -> [B, H, W, Cout]."""
    interpret = interpret or jax.default_backend() != "tpu"
    b, h, wd, c = x.shape
    rb = _pick_rb(h)
    nrb = h // rb
    cout = w.shape[-1]
    wk = w.reshape(9 * c, cout).astype(x.dtype)
    spec = lambda fn: pl.BlockSpec((1, rb, wd, c), fn, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_s1_fwd_kernel, rb=rb, nrb=nrb),
        grid=(b, nrb),
        in_specs=[
            spec(lambda bi, r: (bi, jnp.maximum(r - 1, 0), 0, 0)),
            spec(lambda bi, r: (bi, r, 0, 0)),
            spec(lambda bi, r: (bi, jnp.minimum(r + 1, nrb - 1), 0, 0)),
            pl.BlockSpec((9 * c, cout), lambda bi, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rb, wd, cout), lambda bi, r: (bi, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, cout), x.dtype),
        interpret=interpret,
    )(x, x, x, wk)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _s1_wgrad(x, g, interpret=False):
    """dW [3, 3, C, Cout] f32 for the stride-1 conv."""
    interpret = interpret or jax.default_backend() != "tpu"
    b, h, wd, c = x.shape
    rb = _pick_rb(h)
    nrb = h // rb
    cout = g.shape[-1]
    spec = lambda sh: (lambda fn: pl.BlockSpec((1, rb, wd, sh), fn,
                                               memory_space=pltpu.VMEM))
    xs, gs = spec(c), spec(cout)
    out = pl.pallas_call(
        functools.partial(_s1_wgrad_kernel, rb=rb, nrb=nrb),
        grid=(b, nrb),
        in_specs=[
            xs(lambda bi, r: (bi, jnp.maximum(r - 1, 0), 0, 0)),
            xs(lambda bi, r: (bi, r, 0, 0)),
            xs(lambda bi, r: (bi, jnp.minimum(r + 1, nrb - 1), 0, 0)),
            gs(lambda bi, r: (bi, r, 0, 0)),
        ],
        out_specs=pl.BlockSpec((9 * c, cout), lambda bi, r: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9 * c, cout), _acc_t(x.dtype)),
        interpret=interpret,
    )(x, x, x, g)
    return out.reshape(3, 3, c, cout)


# ------------------------------------------ K10: stride-1 fwd + BN stats
#
# The r4 trace attributed ~3.1 ms/step to BatchNorm batch-stats work:
# per-channel sum/sumsq reductions that RE-READ every conv output from HBM
# (reference model_components/get_norm_layer.py:6-27 — every BasicBlock
# conv is followed by a train-mode BatchNorm). The fwd kernel already holds
# each output block's f32 accumulator in VMEM, so emitting per-channel
# partial sums there makes the training-mode stats pass HBM-free. Priced in
# benchmarks/conv_stats_proto.py; integrated via `conv3x3_stats` +
# models/encoder_resnet.BatchNormFromStats behind conv_impl="pallas_fused".
#
# VJP: s1 = sum(y), s2 = sum(y*y) over (B, H, W), so the cotangents fold
# into a single effective output cotangent before the K9 backward pair:
#   g_eff = gy + gs1 + 2 * y * gs2          (gs1/gs2 broadcast per channel)


def _s1_fwd_stats_kernel(top_ref, mid_ref, bot_ref, w_ref, out_ref,
                         s1_ref, s2_ref, *, rb, nrb):
    bi = pl.program_id(0)
    r = pl.program_id(1)
    top = top_ref[0]
    mid = mid_ref[0]
    bot = bot_ref[0]
    zt = jnp.where(r == 0, 0.0, 1.0).astype(mid.dtype)
    zb = jnp.where(r == nrb - 1, 0.0, 1.0).astype(mid.dtype)
    xblk = jnp.concatenate([top[-1:] * zt, mid, bot[:1] * zb], axis=0)
    w, c = mid.shape[1], mid.shape[2]
    pieces = []
    for dy in range(3):
        rows = xblk[dy:dy + rb]
        for dx in range(3):
            pieces.append(_shift_cols(rows, dx).reshape(rb * w, c))
    asm = jnp.concatenate(pieces, axis=-1)
    acc = jnp.dot(asm, w_ref[...], preferred_element_type=_acc_t(asm.dtype))
    out_ref[0] = acc.reshape(rb, w, -1).astype(out_ref.dtype)

    # stats epilogue: VPU reductions on the accumulator already in VMEM —
    # accumulated across the sequential TPU grid into one [1, Cout] buffer.
    @pl.when((bi == 0) & (r == 0))
    def _init():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    s1_ref[...] += jnp.sum(acc, axis=0, keepdims=True).astype(s1_ref.dtype)
    s2_ref[...] += jnp.sum(acc * acc, axis=0,
                           keepdims=True).astype(s2_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _s1_fwd_stats(x, w, interpret=False):
    """x [B, H, W, C], w [3, 3, C, Cout] -> (y [B, H, W, Cout] in x.dtype,
    sum [Cout], sumsq [Cout]) — stats of the OUTPUT, taken from the f32
    accumulator (pre-downcast), accumulated in _acc_t(x.dtype)."""
    interpret = interpret or jax.default_backend() != "tpu"
    b, h, wd, c = x.shape
    rb = _pick_rb(h)
    nrb = h // rb
    cout = w.shape[-1]
    wk = w.reshape(9 * c, cout).astype(x.dtype)
    st = _acc_t(x.dtype)
    spec = lambda fn: pl.BlockSpec((1, rb, wd, c), fn, memory_space=pltpu.VMEM)
    y, s1, s2 = pl.pallas_call(
        functools.partial(_s1_fwd_stats_kernel, rb=rb, nrb=nrb),
        grid=(b, nrb),
        in_specs=[
            spec(lambda bi, r: (bi, jnp.maximum(r - 1, 0), 0, 0)),
            spec(lambda bi, r: (bi, r, 0, 0)),
            spec(lambda bi, r: (bi, jnp.minimum(r + 1, nrb - 1), 0, 0)),
            pl.BlockSpec((9 * c, cout), lambda bi, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rb, wd, cout), lambda bi, r: (bi, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda bi, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda bi, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, wd, cout), x.dtype),
            jax.ShapeDtypeStruct((1, cout), st),
            jax.ShapeDtypeStruct((1, cout), st),
        ],
        interpret=interpret,
    )(x, x, x, wk)
    return y, s1[0], s2[0]


@jax.custom_vjp
def _conv_s1_stats(x, w):
    return _s1_fwd_stats(x, w)


def _conv_s1_stats_f(x, w):
    y, s1, s2 = _s1_fwd_stats(x, w)
    # y rides along as a residual: it is already materialized as a primal
    # output, so this costs no extra HBM write.
    return (y, s1, s2), (x, w, y)


def _conv_s1_stats_b(res, cts):
    x, w, y = res
    gy, gs1, gs2 = cts
    at = _acc_t(y.dtype)
    # fold the stats cotangents into one effective output cotangent (one
    # fused elementwise pass; XLA fuses the broadcast adds into it)
    g = (gy.astype(at) + gs1.astype(at)
         + 2.0 * y.astype(at) * gs2.astype(at)).astype(y.dtype)
    wr = jnp.flip(w, (0, 1)).swapaxes(2, 3)
    return _s1_fwd(g, wr), _s1_wgrad(x, g).astype(w.dtype)


_conv_s1_stats.defvjp(_conv_s1_stats_f, _conv_s1_stats_b)


def conv3x3_stats(x: jax.Array, w: jax.Array):
    """Differentiable stride-1 3x3 same-pad conv (NHWC) that ALSO returns
    per-channel (sum, sumsq) of its output over (B, H, W) — the K10 fused
    BatchNorm-stats epilogue. Caller must have checked `conv3x3_supported`
    at stride 1."""
    return _conv_s1_stats(x, w)


# --------------------------------------------------------- stride-2 path
#
# The stride-2 stage-entry convs (3 per forward) are NOT Pallas: Mosaic
# cannot lower the column/row decimation a fused-K stride-2 kernel needs
# (strided slicing inside the kernel becomes an unsupported >2-D gather;
# measured on-chip r5). Instead: a conv-free phase-split einsum in plain
# XLA — output (i, j) = sum_{dy,dx} x[2i+dy-1, 2j+dx-1] . w[dy, dx], so
# after a 1-px top-left pad each tap is a strided slice + [C, Cout] matmul.
# No lax.conv op is ever emitted (no conv layout churn), the nine matmuls
# land on the MXU, and XLA autodiff of slice+einsum is already the
# NHWC-native pad-scatter dgrad / slice-contract wgrad pair.


def _s2_phase_einsum(x, w):
    """x [B, H, W, C] (H, W even), w [3,3,C,Cout] -> [B, H/2, W/2, Cout]."""
    b, h, wd, c = x.shape
    ho, wo = h // 2, wd // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            sl = jax.lax.slice(xp, (0, dy, dx, 0),
                               (b, dy + 2 * ho, dx + 2 * wo, c),
                               strides=(1, 2, 2, 1))
            t = jnp.einsum("bhwc,co->bhwo", sl, w[dy, dx],
                           preferred_element_type=_acc_t(x.dtype))
            acc = t if acc is None else acc + t
    return acc.astype(x.dtype)


# -------------------------------------------------------------- custom_vjp


@jax.custom_vjp
def _conv_s1(x, w):
    return _s1_fwd(x, w)


def _conv_s1_f(x, w):
    return _s1_fwd(x, w), (x, w)


def _conv_s1_b(res, g):
    x, w = res
    # stride-1 same-pad dgrad == the same conv on rotated/transposed weights
    wr = jnp.flip(w, (0, 1)).swapaxes(2, 3)
    return _s1_fwd(g, wr), _s1_wgrad(x, g).astype(w.dtype)


_conv_s1.defvjp(_conv_s1_f, _conv_s1_b)


# ----------------------------------------------------------- public entry


def conv3x3(x: jax.Array, w: jax.Array, stride: int = 1) -> jax.Array:
    """Differentiable 3x3 same-pad conv (NHWC), stride 1 or 2, Pallas fwd +
    NHWC-native grads. Caller must have checked `conv3x3_supported`."""
    if stride == 1:
        return _conv_s1(x, w)
    if stride == 2:
        return _s2_phase_einsum(x, w)
    raise ValueError(f"conv3x3: unsupported stride {stride}")


def conv1x1(x: jax.Array, w: jax.Array, stride: int = 1) -> jax.Array:
    """1x1 conv as strided slice + einsum — no lax.conv op is emitted, so
    XLA maps it straight onto the MXU (autodiff gives the pad-scatter dgrad
    and the slice-contract wgrad for free). w is [1, 1, C, Cout] or
    [C, Cout]."""
    if w.ndim == 4:
        w = w[0, 0]
    if stride != 1:
        x = x[:, ::stride, ::stride, :]
    return jnp.einsum("bhwc,co->bhwo", x, w,
                      preferred_element_type=_acc_t(x.dtype)).astype(x.dtype)
