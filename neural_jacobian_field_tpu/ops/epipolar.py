"""K1b: epipolar ray-knot feature caching — the TPU-native pixel-aligned
sampling path.

The exact path (ops/pixel_gather.py) pays one random row fetch per SAMPLE per
pyramid level, and microbenchmarks show TPU gathers/scatters are ROW-COUNT
bound (~23 ns/row gather, ~41 ns/row scatter, independent of locality and —
beyond ~1 KB — superlinear in width; benchmarks/RESULTS.md r2). At the
reference workload that is ~917k gather rows + 917k scatter rows per train
step = ~86 ms, the single largest cost.

The structural fix: all S samples of a ray lie on one 3D line, so their
projections into the context image lie on ONE 2D line segment (a pinhole
camera maps lines to lines). Instead of gathering per sample:

  1. per ray, gather M knot features along the projected [z_near, z_far]
     segment, per pyramid level (`build_ray_knots`) — B*R*M rows, shared by
     the proposal AND nerf sampling stages (knots depend only on ray
     geometry, not on where the samplers place points);
  2. per sample, exactly project the point (same math as the exact path),
     compute its scalar position s on the segment, and linearly interpolate
     the two neighbouring knots — a dense 2-sparse-one-hot matmul on the MXU
     (`sample_ray_knots`), zero random access.

Row count drops from rays*samples*levels*stages to rays*sum(M): ~10x at the
reference shapes. The price is approximation: features between knots are the
linear interpolation of two exact bilinear samples along the line, i.e. the
feature surface is low-pass filtered along the epipolar direction with knot
spacing |segment|/(M-1) level-pixels (exact wherever the segment spans fewer
than M-1 texels, and exact in the common same-camera case where the segment
collapses to a point). Enabled via RenderingCfg.pixel_feature_mode=
"epipolar"; quality impact is measured E2E in benchmarks/RESULTS.md.

Reference counterpart: model_components/pixel_aligned_features.py:11-35
(cuDNN grid_sample per sample — cheap on GPU, the wrong shape for TPU).
"""

import os
from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp

from ..rendering.geometry import (
    homogenize_points,
    project_z_divide,
    transform_world2cam,
)
from .pixel_gather import (
    PackedPyramid,
    _corner_weights,
    _level_coords,
    bilinear_corners,
    gather_packed_rows,
)


# A/B flag for the project_then_interp contraction form (see its docstring);
# default stays the 2-D merged-batch dot that every prior measurement used.
_KW_DOT_4D = os.environ.get("NJF_KW_DOT", "2d") == "4d"


@flax.struct.dataclass
class RayKnots:
    """Per-ray epipolar knot textures + segment parameterization.

    Levels mirror PackedPyramid (fine = conv1++up2(layer1), mid = layer2,
    coarse = layer3); p0/pdir parameterize the clipped projected segment in
    FINE pixel coords; inv_len2 = 1/max(|pdir|^2, eps).
    """

    fine: jax.Array  # [B, R, Mf, Cf]
    mid: jax.Array  # [B, R, Mm, Cm]
    coarse: jax.Array  # [B, R, Mc, Cc]
    p0: jax.Array  # [B, R, 2]
    pdir: jax.Array  # [B, R, 2]
    inv_len2: jax.Array  # [B, R, 1]
    fine_hw: tuple = flax.struct.field(pytree_node=False)


def _clip_segment(p0, p1, width, height):
    """Liang-Barsky clip of 2D segments to the (slightly padded) image box.

    Off-image knots only ever read border-clamped texels, but clipping keeps
    the M knots concentrated on the visible part of the segment (otherwise a
    segment that shoots far off-screen wastes most of its knots on clamped
    duplicates). Degenerate/fully-outside segments keep (p0, p1) unchanged —
    every knot clamps to the border, matching the exact path's clamp."""
    d = p1 - p0
    lo = jnp.array([-1.0, -1.0], p0.dtype)
    hi = jnp.array([width + 0.0, height + 0.0], p0.dtype)
    safe_d = jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
    ta = (lo - p0) / safe_d
    tb = (hi - p0) / safe_d
    tmin = jnp.minimum(ta, tb)
    tmax = jnp.maximum(ta, tb)
    # axes where the segment is (near-)parallel and outside never intersect
    parallel = jnp.abs(d) < 1e-9
    outside = (p0 < lo) | (p0 > hi)
    tmin = jnp.where(parallel, jnp.where(outside, jnp.inf, -jnp.inf), tmin)
    tmax = jnp.where(parallel, jnp.where(outside, -jnp.inf, jnp.inf), tmax)
    t0 = jnp.clip(jnp.max(tmin, axis=-1), 0.0, 1.0)
    t1 = jnp.clip(jnp.min(tmax, axis=-1), 0.0, 1.0)
    valid = t1 > t0
    t0 = jnp.where(valid, t0, 0.0)[..., None]
    t1 = jnp.where(valid, t1, 1.0)[..., None]
    return p0 + t0 * d, p0 + t1 * d


def _gather_level_knots(packed, hw, stride, p0, pdir, m):
    """Gather m bilinear knots per ray from one packed level.

    packed [B, HW, 4C]; p0/pdir [B, R, 2] in fine px -> [B, R, m, C]."""
    h, w = hw
    b, r = p0.shape[:2]
    frac = jnp.linspace(0.0, 1.0, m, dtype=p0.dtype)
    pk = p0[:, :, None, :] + frac[None, None, :, None] * pdir[:, :, None, :]
    lx, ly = _level_coords(pk[..., 0], pk[..., 1], stride)
    x0, y0, wx, wy = bilinear_corners(lx.reshape(b, r * m), ly.reshape(b, r * m), w, h)
    knots = gather_packed_rows(packed, y0 * w + x0, _corner_weights(wx, wy))
    return knots.reshape(b, r, m, knots.shape[-1])


def build_ray_knots(
    pyr: PackedPyramid,
    origins: jax.Array,
    directions: jax.Array,
    z_near: jax.Array,
    z_far: jax.Array,
    cam2world: jax.Array,
    intrinsics: jax.Array,
    num_knots: Tuple[int, int, int] = (64, 16, 8),
) -> RayKnots:
    """Project each ray's [z_near, z_far] span into the context camera, clip,
    and gather per-level knot textures. origins/directions [B, R, 3];
    z_near/z_far [B, R] (per-ray); intrinsics normalized."""
    hf, wf = pyr.fine_hw
    hm, wm = pyr.mid_hw
    hc, wc = pyr.coarse.shape[1:3]
    b, r = origins.shape[:2]

    ends = jnp.stack(
        [
            origins + z_near[..., None] * directions,
            origins + z_far[..., None] * directions,
        ],
        axis=2,
    )  # [B, R, 2, 3]
    cam_hom = transform_world2cam(homogenize_points(ends), cam2world[:, None, None])
    # clamp depth so a segment straddling the camera plane projects to a
    # finite (if meaningless) line — the exact path degrades the same way
    # (border clamp) for such samples
    cam = cam_hom[..., :3]
    cam = cam.at[..., 2].set(jnp.maximum(cam[..., 2], 1e-6))
    uvw, _ = project_z_divide(cam, intrinsics[:, None, None])
    px = jnp.stack([uvw[..., 0] * (wf - 1), uvw[..., 1] * (hf - 1)], axis=-1)
    p0, p1 = _clip_segment(px[:, :, 0], px[:, :, 1], float(wf - 1), float(hf - 1))
    pdir = p1 - p0
    inv_len2 = 1.0 / jnp.maximum(jnp.sum(pdir * pdir, axis=-1, keepdims=True), 1e-8)

    sm = (hf + hm - 1) // hm
    sc = (hf + hc - 1) // hc
    from .pallas.pack2x2 import pack_2x2_flat

    coarse2 = pack_2x2_flat(pyr.coarse)
    mf, mm, mc = num_knots
    return RayKnots(
        fine=_gather_level_knots(pyr.fine2, (hf, wf), 1, p0, pdir, mf),
        mid=_gather_level_knots(pyr.mid2, (hm, wm), sm, p0, pdir, mm),
        coarse=_gather_level_knots(coarse2, (hc, wc), sc, p0, pdir, mc),
        p0=p0,
        pdir=pdir,
        inv_len2=inv_len2,
        fine_hw=(hf, wf),
    )


def _hat_matrix(s: jax.Array, m: int, dtype) -> jax.Array:
    """2-sparse linear-interp hat weights over m knots: [B, R, S, m] with
    (1-w) at floor(s*(m-1)) and w at the next knot."""
    pos = s * (m - 1)
    k0 = jnp.clip(jnp.floor(pos), 0, m - 2)
    w = (pos - k0).astype(dtype)
    k0 = k0.astype(jnp.int32)[..., None]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, m), 3)
    onehot = jnp.where(cols == k0, (1.0 - w)[..., None], 0.0).astype(dtype)
    return onehot + jnp.where(cols == k0 + 1, w[..., None], 0.0).astype(dtype)


def _interp_knots(level: jax.Array, s: jax.Array) -> jax.Array:
    """Linear interp along the knot axis via a 2-sparse one-hot matmul (MXU;
    a take_along_axis here would reintroduce the per-sample gather this
    module exists to remove). level [B, R, M, C], s [B, R, S] in [0, 1].

    Lowered as a (B*R)-batched dot_general rather than an einsum with two
    batch axes: measured 2x faster fwd+bwd on-chip (the einsum form makes
    XLA materialize an extra [B, R, S, C] layout copy each way)."""
    b, r, m, c = level.shape
    sn = s.shape[2]
    onehot = _hat_matrix(s, m, level.dtype)
    out = jax.lax.dot_general(
        onehot.reshape(b * r, sn, m), level.reshape(b * r, m, c),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(level.dtype)
    return out.reshape(b, r, sn, c)


@flax.struct.dataclass
class KnotFeatures:
    """Lazy pixel-aligned features: the per-ray knot textures plus each
    sample's segment position, NOT yet interpolated.

    Because both the knot->sample interpolation H and the trunk's latent
    projection W are linear, tz = (H @ K) @ W can be computed as
    H @ (K @ W): project the M knots (M=88 rows/ray) instead of the S
    samples (S=256+) and interpolate the projections. ResnetFC's fused path
    exploits this (resnet_fc.py) — the lin_z contraction drops from
    N x 512 x (n*128) per trunk pass to the knot-sized equivalent, removing
    ~half the trunk FLOPs from K7's fwd AND recompute-bwd. `interp_levels`/
    `concat` materialize the classic per-sample features for every other
    consumer.
    """

    levels: Tuple[jax.Array, ...]  # ([B,R,Mf,Cf], [B,R,Mm,Cm], [B,R,Mc,Cc])
    s: jax.Array  # [B, R, S] segment positions in [0, 1], stop-gradient

    def interp_levels(self) -> Tuple[jax.Array, ...]:
        b, r, sn = self.s.shape
        return tuple(
            _interp_knots(level, self.s).reshape(b, r * sn, -1)
            for level in self.levels
        )

    def concat(self) -> jax.Array:
        return jnp.concatenate(self.interp_levels(), axis=-1)

    def project_then_interp(self, w_rows, bias=None) -> jax.Array:
        """tz = sum_l H_l @ (K_l @ W_l) (+ bias): the knot-side form of
        concat() @ W for row blocks W_l of W matching the level channel
        dims. Returns [B, N, d] in the levels' dtype.

        The per-level projections are STACKED along the knot axis and
        contracted in ONE batched matmul against the stacked hat blocks —
        three separate H_l @ KW_l dots each write a full-width [N, d]
        partial (measured a net LOSS vs the in-kernel lin_z at reference
        shapes); the stacked form writes the [N, d] output once."""
        b, r, sn = self.s.shape
        kws, hats = [], []
        for level, w in zip(self.levels, w_rows):
            lb, lr, m, c = level.shape
            # plain 2-D matmul (an einsum here lowered as a convolution +
            # convert chain, ~0.7 ms each on-chip)
            kw_l = level.reshape(lb * lr * m, c) @ w.astype(level.dtype)
            kws.append(kw_l.reshape(lb, lr, m, -1))
            hats.append(_hat_matrix(self.s, m, level.dtype))
        kw = jnp.concatenate(kws, axis=2)  # [B, R, M_total, d]
        hat = jnp.concatenate(hats, axis=-1)  # [B, R, S, M_total]
        m, d = kw.shape[2], kw.shape[3]
        if _KW_DOT_4D:
            # A/B variant (NJF_KW_DOT=4d): contract in 4-D with two batch
            # dims instead of reshaping to [B*R, ...]. Under the producer's
            # {3,1,2,0} layout for kw, the [B,R,M,d]->[B*R,M,d] reshape is
            # not a bitcast and XLA inserts a [7,256,88,384] copy x2/step
            # (the r4 trace's epipolar-relayout family); batch dims carry
            # no layout constraint, so the 4-D form lets XLA keep the
            # producer layout. Measured in-program before adoption.
            out = jax.lax.dot_general(
                hat, kw,
                dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.float32,
            ).astype(kw.dtype).reshape(b, r * sn, d)
        else:
            out = jax.lax.dot_general(
                hat.reshape(b * r, sn, m), kw.reshape(b * r, m, d),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(kw.dtype).reshape(b, r * sn, d)
        if bias is not None:
            # prefer passing the bias to the K7 tz kernel instead (adds in
            # VMEM); a broadcast add here costs a [N, d] HBM round-trip
            out = out + bias.astype(out.dtype)
        return out


def knot_features(knots: RayKnots, fx: jax.Array, fy: jax.Array) -> KnotFeatures:
    """Bind the ray's knot textures to the samples' segment positions
    (lazily — see KnotFeatures). fx/fy [B, N] fine-px projections; N must
    be R*S for the knots' R."""
    b, n = fx.shape
    r = knots.p0.shape[1]
    assert n % r == 0, f"sample count {n} not a multiple of ray count {r}"
    s_per_ray = n // r
    p = jnp.stack([fx, fy], axis=-1).reshape(b, r, s_per_ray, 2)
    rel = p - knots.p0[:, :, None, :]
    s = jnp.sum(rel * knots.pdir[:, :, None, :], axis=-1) * knots.inv_len2[:, :, None, 0]
    s = jax.lax.stop_gradient(jnp.clip(s, 0.0, 1.0))
    return KnotFeatures(levels=(knots.fine, knots.mid, knots.coarse), s=s)


def sample_ray_knots_levels(knots: RayKnots, fx: jax.Array,
                            fy: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-sample features from the ray's knot textures, one array per
    pyramid level (fine, mid, coarse) — consumers that need the
    materialized features (the XLA trunk path, the transformer head) concat
    these; the K7 fused trunk instead takes the lazy KnotFeatures."""
    return knot_features(knots, fx, fy).interp_levels()


def sample_ray_knots(knots: RayKnots, fx: jax.Array, fy: jax.Array) -> jax.Array:
    """Per-sample features from the ray's knot textures.

    fx/fy [B, N] fine-px projections of the samples (computed exactly by the
    caller — the approximation is only in the feature interp, never in the
    sample's position on the segment). N must be R*S for the knots' R.
    Returns [B, N, Cf+Cm+Cc] in the knots' own dtype (bf16 in the flagship
    bf16 config; upcasting to f32 here cost a 940 MB HBM round-trip per
    stage — trace r3 convert_element_type.134/135 — and added no
    information, since every downstream consumer either computes in bf16 or
    upcasts lazily) in reference channel order."""
    return jnp.concatenate(sample_ray_knots_levels(knots, fx, fy), axis=-1)
