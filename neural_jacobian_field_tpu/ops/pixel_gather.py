"""K1: pixel-aligned feature gathers, TPU-native.

The reference leans on cuDNN `grid_sample` over a single 512-channel feature
map materialized at conv1 resolution (model_components/pixel_aligned_features
.py:29-31, encoder upsample at encoder_resnet.py:78-86). On TPU that becomes
XLA row gathers/scatters that are ROW-COUNT bound (~15 ns/row regardless of
row width — benchmarks/k1_microbench.py), which round 1's trace showed to be
51% of the train step (173 of 342 ms).

Attack: stop materializing the 512-ch upsampled concat. Sample each pyramid
level at its NATIVE resolution (the composed interpolation is exact for the
conv1+layer1 channels and a knot-refinement of the reference's
upsample-then-sample for layer2/3 — see `pyramid_pixel_features`), with a
per-level strategy chosen by what the hardware rewards:

  fine   conv1 ++ up2(layer1)  128ch @ H/2   -> 4x-packed "patch rows": the
         map is repacked once per step so row (y, x) holds the full 2x2
         bilinear patch; each query point then costs ONE ~1KB row fetch
         instead of four (row count is the cost, width is nearly free).
  mid    layer2               128ch @ H/8   -> same packed-row trick (the
         map is tiny; only the row count matters).
  coarse layer3               256ch @ H/16  -> the whole map fits in VMEM:
         the gather becomes a dense blocked ONE-HOT MATMUL out = onehot @ F
         (pure MXU, zero random HBM access) and the backward scatter becomes
         the transposed matmul. Pallas kernel in ops/pallas/onehot_gather.py
         builds the one-hot on the fly in VMEM; an XLA fallback below serves
         non-TPU backends and parity tests.

Channel order of the concatenated result matches the reference exactly:
[conv1 (64), layer1 (64), layer2 (128), layer3 (256)] — so trunk lin_z
weights are interchangeable with the "concat" layout (weight-port parity).

Both gather primitives carry a custom VJP that (a) implements the backward
scatter as above and (b) returns ZERO gradient for the query coordinates: in
this model the sample positions are non-differentiable leaves (ray
origins/directions come from cameras, stratified jitter is random, PDF bins
are gradient-stopped — rendering/samplers.py:441 equivalent), so the
grid-gradient torch's grid_sample would compute is dead work.
"""

import functools
from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp


def bilinear_corners(x: jax.Array, y: jax.Array, width: int, height: int):
    """Continuous (x, y) in pixel units -> clamped corner base + weights.

    x0 = clamp(floor(clamp(x, 0, W-1)), 0, W-2) keeps the 2x2 patch
    (x0..x0+1, y0..y0+1) in-bounds while reproducing border-clamped bilinear
    exactly (x == W-1 gives x0 = W-2, wx = 1). Matches ops/grid_sample.py /
    torch grid_sample(align_corners=True, padding_mode="border").
    """
    # NaN coords (e.g. 0/0 z-divide for a sample at the context camera
    # center) would survive clip/floor and make the int32 corner index
    # undefined — an unchecked OOB row read under promise_in_bounds. Zero
    # them; the op is elementwise and fuses.
    x = jnp.nan_to_num(x, nan=0.0)
    y = jnp.nan_to_num(y, nan=0.0)
    x = jnp.clip(x, 0.0, width - 1)
    y = jnp.clip(y, 0.0, height - 1)
    x0 = jnp.clip(jnp.floor(x), 0, width - 2)
    y0 = jnp.clip(jnp.floor(y), 0, height - 2)
    wx = x - x0
    wy = y - y0
    return x0.astype(jnp.int32), y0.astype(jnp.int32), wx, wy


def _corner_weights(wx, wy):
    """[..., 4] weights in corner order (y0x0, y0x1, y1x0, y1x1)."""
    return jnp.stack(
        [(1 - wy) * (1 - wx), (1 - wy) * wx, wy * (1 - wx), wy * wx], axis=-1
    )


# --------------------------------------------------------------------------
# Packed-row gather (fine + mid levels)
# --------------------------------------------------------------------------


def pack_2x2(level: jax.Array) -> jax.Array:
    """[B, H, W, C] -> [B, H, W, 4C]: row (y, x) holds the 2x2 patch
    [F[y,x], F[y,x+1], F[y+1,x], F[y+1,x+1]].

    Plain differentiable ops: the backward "fold" of the four shifted copies
    is ordinary autodiff. The +1 shifts replicate the last row/column; those
    entries are never read (corner bases clamp to H-2/W-2).
    """
    right = jnp.concatenate([level[:, :, 1:], level[:, :, -1:]], axis=2)
    down = jnp.concatenate([level[:, 1:], level[:, -1:]], axis=1)
    down_right = jnp.concatenate([down[:, :, 1:], down[:, :, -1:]], axis=2)
    return jnp.concatenate([level, right, down, down_right], axis=-1)


@jax.custom_vjp
def gather_packed_rows(packed: jax.Array, idx: jax.Array, w4: jax.Array) -> jax.Array:
    """packed [B, HW, 4C] (from pack_2x2), idx [B, N] flat row ids,
    w4 [B, N, 4] corner weights -> [B, N, C] bilinear samples.

    One row fetch per point forward; one row scatter-add per point backward.
    """
    out, _ = _gather_packed_fwd(packed, idx, w4)
    return out


def _gather_packed_fwd(packed, idx, w4):
    b, hw, c4 = packed.shape
    c = c4 // 4
    # indices come from bilinear_corners and are always in-bounds; the
    # default "fill" mode would emit a full-width OOB select pass (~1.4 ms
    # per call at reference shapes)
    rows = jnp.take_along_axis(
        packed, idx[..., None], axis=1, mode="promise_in_bounds"
    )  # [B, N, 4C]
    # Lane-aligned channel slices + bf16 math: a [B, N, 4, C] reshape would
    # force a T(8,128)->T(4,128) relayout and an f32 materialization of the
    # 4C-wide rows (measured ~6 ms/call at reference shapes — trace r2).
    w4 = w4.astype(packed.dtype)
    out = sum(
        rows[..., cnr * c : (cnr + 1) * c] * w4[..., cnr : cnr + 1]
        for cnr in range(4)
    )
    # zero-size array smuggles the packed map's static shape/dtype to bwd
    spec = jnp.zeros((b, hw, 0), packed.dtype)
    return out, (idx, w4, spec)


def _gather_packed_bwd(res, g):
    idx, w4, spec = res
    b, hw, _ = spec.shape
    c = g.shape[-1]
    g = g.astype(spec.dtype)
    g_rows = jnp.concatenate(
        [g * w4[..., cnr : cnr + 1].astype(spec.dtype) for cnr in range(4)],
        axis=-1,
    )
    g_packed = jnp.zeros((b, hw, 4 * c), spec.dtype)
    g_packed = g_packed.at[jnp.arange(b)[:, None], idx].add(
        g_rows, mode="promise_in_bounds"
    )
    return g_packed, None, None


gather_packed_rows.defvjp(_gather_packed_fwd, _gather_packed_bwd)


# --------------------------------------------------------------------------
# One-hot MXU gather (coarse level)
# --------------------------------------------------------------------------


def _onehot_block(idx_blk, w_blk, k, dtype):
    """[blk, 4] corner ids + weights -> [blk, K] one-hot matrix."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (idx_blk.shape[0], k), 1)
    oh = jnp.zeros((idx_blk.shape[0], k), dtype)
    for cnr in range(4):
        oh = oh + jnp.where(
            cols == idx_blk[:, cnr : cnr + 1], w_blk[:, cnr : cnr + 1], 0.0
        ).astype(dtype)
    return oh


def _corner_ids(cx, cy, width, height):
    x0, y0, wx, wy = bilinear_corners(cx, cy, width, height)
    base = y0 * width + x0
    idx = jnp.stack([base, base + 1, base + width, base + width + 1], axis=-1)
    return idx, _corner_weights(wx, wy)


def _onehot_gather_xla(level_flat, idx, w4, block=1024):
    """level_flat [B, K, C]; idx/w4 [B, N, 4] -> [B, N, C] f32 via blocked
    one-hot matmuls. Fallback + parity reference for the Pallas kernel."""
    bsz, k, c = level_flat.shape
    n = idx.shape[1]
    pad = (-n) % block
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, pad), (0, 0)))
        w4 = jnp.pad(w4, ((0, 0), (0, pad), (0, 0)))
    nblk = (n + pad) // block
    idx_b = idx.reshape(bsz, nblk, block, 4)
    w_b = w4.reshape(bsz, nblk, block, 4).astype(level_flat.dtype)

    def per_image(feat_i, idx_i, w_i):
        def body(_, blk):
            i_blk, w_blk = blk
            oh = _onehot_block(i_blk, w_blk, k, feat_i.dtype)
            return _, jnp.dot(oh, feat_i, preferred_element_type=jnp.float32)

        _, outs = jax.lax.scan(body, None, (idx_i, w_i))
        return outs.reshape(n + pad, c)

    out = jax.vmap(per_image)(level_flat, idx_b, w_b)
    return out[:, :n]


def _onehot_scatter_xla(g, idx, w4, k, block=1024):
    """Transposed one-hot matmul: grad wrt the flat level map.
    g [B, N, C] -> [B, K, C] with f32 accumulation."""
    bsz, n, c = g.shape
    pad = (-n) % block
    if pad:
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
        idx = jnp.pad(idx, ((0, 0), (0, pad), (0, 0)))
        w4 = jnp.pad(w4, ((0, 0), (0, pad), (0, 0)))
    nblk = (n + pad) // block
    g_b = g.reshape(bsz, nblk, block, c)
    idx_b = idx.reshape(bsz, nblk, block, 4)
    w_b = w4.reshape(bsz, nblk, block, 4).astype(g.dtype)

    def per_image(g_i, idx_i, w_i):
        def body(acc, blk):
            g_blk, i_blk, w_blk = blk
            oh = _onehot_block(i_blk, w_blk, k, g_blk.dtype)
            acc = acc + jax.lax.dot_general(
                oh, g_blk,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc, None

        acc, _ = jax.lax.scan(body, jnp.zeros((k, c), jnp.float32), (g_i, idx_i, w_i))
        return acc

    return jax.vmap(per_image)(g_b, idx_b, w_b)


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


@jax.custom_vjp
def gather_bilinear_onehot(level: jax.Array, cx: jax.Array, cy: jax.Array) -> jax.Array:
    """Bilinear-sample `level` [B, Hc, Wc, C] at pixel coords (cx, cy) [B, N]
    via one-hot matmuls (MXU; the map stays resident in VMEM). Intended for
    maps with K = Hc*Wc up to a few thousand texels. Returns [B, N, C] f32."""
    out, _ = _onehot_fwd(level, cx, cy)
    return out


def _onehot_fwd(level, cx, cy):
    b, hc, wc, c = level.shape
    idx, w4 = _corner_ids(cx, cy, wc, hc)
    flat = level.reshape(b, hc * wc, c)
    if _use_pallas():
        from .pallas.onehot_gather import onehot_gather_fwd_pallas

        out = onehot_gather_fwd_pallas(flat, idx, w4)
    else:
        out = _onehot_gather_xla(flat, idx, w4)
    return out, (idx, w4, jnp.zeros((hc, wc, 0), level.dtype))


def _onehot_bwd(res, g):
    idx, w4, spec = res
    hc, wc, _ = spec.shape
    dtype = spec.dtype
    g = g.astype(dtype)
    if _use_pallas():
        from .pallas.onehot_gather import onehot_scatter_bwd_pallas

        g_flat = onehot_scatter_bwd_pallas(g, idx, w4, hc * wc)
    else:
        g_flat = _onehot_scatter_xla(g, idx, w4, hc * wc)
    b, c = g.shape[0], g.shape[-1]
    return g_flat.reshape(b, hc, wc, c).astype(dtype), None, None


gather_bilinear_onehot.defvjp(_onehot_fwd, _onehot_bwd)


# --------------------------------------------------------------------------
# Pyramid assembly
# --------------------------------------------------------------------------


@flax.struct.dataclass
class FeaturePyramid:
    """Encoder output in pyramid layout (encoder_resnet.py feature_layout=
    "pyramid"): fine = conv1 ++ up2(layer1) at conv1 resolution; mid = layer2
    and coarse = layer3 at their native resolutions."""

    fine: jax.Array  # [B, Hf, Wf, 128]
    mid: jax.Array  # [B, Hf/4, Wf/4, 128]
    coarse: jax.Array  # [B, Hf/8, Wf/8, 256]

    def astype(self, dtype):
        return FeaturePyramid(
            fine=self.fine.astype(dtype),
            mid=self.mid.astype(dtype),
            coarse=self.coarse.astype(dtype),
        )


@flax.struct.dataclass
class PackedPyramid:
    """Native-resolution feature pyramid, gather-ready.

    fine2/mid2 are pack_2x2 layouts (flattened spatially); coarse is the raw
    layer3 map for the one-hot path. fine_hw/mid_hw are static shapes.
    """

    fine2: jax.Array  # [B, Hf*Wf, 4*Cf]   conv1 ++ up2(layer1), packed
    mid2: jax.Array  # [B, Hm*Wm, 4*Cm]    layer2, packed
    coarse: jax.Array  # [B, Hc, Wc, Cc]   layer3, raw
    fine_hw: tuple = flax.struct.field(pytree_node=False)
    mid_hw: tuple = flax.struct.field(pytree_node=False)


def pack_pyramid(pyr: FeaturePyramid) -> PackedPyramid:
    """Repack a FeaturePyramid into gather-ready layout (once per step).

    The fine/mid packing runs through the K6 fused Pallas kernel on TPU
    (ops/pallas/pack2x2.py) — one read + one write in the final row-major
    layout, vs XLA's 4-slice concat + layout copies (~9 ms/step at the
    reference fine shape)."""
    from .pallas.pack2x2 import pack_2x2_flat

    fine, mid, coarse = pyr.fine, pyr.mid, pyr.coarse
    b, hf, wf, cf = fine.shape
    _, hm, wm, cm = mid.shape
    return PackedPyramid(
        fine2=pack_2x2_flat(fine),
        mid2=pack_2x2_flat(mid),
        coarse=coarse,
        fine_hw=(hf, wf),
        mid_hw=(hm, wm),
    )


def _level_coords(fx, fy, stride):
    """Fine-grid pixel coords -> coarser-level pixel coords. Composes the
    reference's align_corners=False upsample with its align_corners=True
    grid_sample: c = (f + 0.5)/s - 0.5."""
    return (fx + 0.5) / stride - 0.5, (fy + 0.5) / stride - 0.5


def pyramid_pixel_features(pyr: PackedPyramid, fx: jax.Array, fy: jax.Array) -> jax.Array:
    """Sample all pyramid levels at fine-grid pixel coords (fx, fy) [B, N] and
    concatenate channels in reference order. Returns [B, N, C_total] f32.

    Numerics note: for layer2/3 this samples the coarse bilinear surface
    directly, where the reference samples a bilinearly-UPSAMPLED copy — a
    piecewise refinement of the same surface. The two agree exactly at fine-
    grid knots and differ by O(h^2 * curvature) in between; the "concat"
    encoder layout (encoder_resnet.py) reproduces the reference bit path for
    parity checks.
    """
    hf, wf = pyr.fine_hw
    hm, wm = pyr.mid_hw
    hc, wc = pyr.coarse.shape[1:3]

    x0, y0, wx, wy = bilinear_corners(fx, fy, wf, hf)
    fine = gather_packed_rows(pyr.fine2, y0 * wf + x0, _corner_weights(wx, wy))

    sm = (hf + hm - 1) // hm  # fine->mid stride (4 at the reference shapes)
    mx, my = _level_coords(fx, fy, sm)
    x0, y0, wx, wy = bilinear_corners(mx, my, wm, hm)
    mid = gather_packed_rows(pyr.mid2, y0 * wm + x0, _corner_weights(wx, wy))

    sc = (hf + hc - 1) // hc
    cx, cy = _level_coords(fx, fy, sc)
    coarse = gather_bilinear_onehot(pyr.coarse, cx, cy)

    return jnp.concatenate([fine, mid, coarse], axis=-1)
