"""K1 (coarse level): one-hot MXU bilinear gather / scatter kernels.

For a feature map small enough to sit in VMEM (layer3: 30x40x256 at the
reference 480x640 input), bilinear sampling of N points is a dense matmul

    out[N, C] = onehot[N, K] @ F[K, C],        K = Hc*Wc

where row p of `onehot` carries the 4 bilinear corner weights of point p.
The backward scatter is the transposed matmul  gF[K, C] = onehot^T @ g[N, C].
Both run on the MXU with ZERO random HBM access — the XLA alternative is a
row-gather/scatter that is row-count bound at ~15 ns/row
(benchmarks/k1_microbench.py), 3-10x slower at these shapes.

The one-hot block is built on the fly in VMEM (4 iota-compare passes on the
VPU); the XLA fallback in ops/pixel_gather.py materializes the same matrix
through HBM and is the parity reference (tests/test_pixel_gather.py runs the
kernels in interpret mode against it).

Replaces the grid_sample backing of the reference's
model_components/pixel_aligned_features.py:29-31 for the coarse pyramid
level.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 1024  # points per grid step


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _build_onehot(idx_blk, w_blk, k_pad, dtype):
    """idx_blk/w_blk [4, BLK] -> one-hot [BLK, k_pad].

    Built in f32 (Mosaic only supports minor-dim insertion on 32-bit types)
    and cast once at the end.
    """
    blk = idx_blk.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (blk, k_pad), 1)
    oh = jnp.zeros((blk, k_pad), jnp.float32)
    for c in range(4):
        sel = cols == idx_blk[c][:, None]
        oh = oh + jnp.where(sel, w_blk[c][:, None].astype(jnp.float32), 0.0)
    return oh.astype(dtype)


def _fwd_kernel(flat_ref, idx_ref, w_ref, out_ref, *, k_pad):
    flat = flat_ref[0]  # [K_pad, C]
    oh = _build_onehot(idx_ref[0], w_ref[0], k_pad, flat.dtype)
    out_ref[0] = jnp.dot(oh, flat, preferred_element_type=jnp.float32)


def _bwd_kernel(g_ref, idx_ref, w_ref, out_ref, *, k_pad):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    g = g_ref[0]  # [BLK, C]
    oh = _build_onehot(idx_ref[0], w_ref[0], k_pad, g.dtype)
    out_ref[0] += jax.lax.dot_general(
        oh, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _pad_points(idx, w4, n_pad):
    """[B, N, 4] -> [B, 4, n_pad] (transposed so the point dim rides lanes);
    padding points get idx 0 / weight 0 (they contribute nothing)."""
    b, n, _ = idx.shape
    idx_t = jnp.transpose(idx, (0, 2, 1))
    w_t = jnp.transpose(w4, (0, 2, 1)).astype(jnp.float32)
    if n_pad != n:
        idx_t = jnp.pad(idx_t, ((0, 0), (0, 0), (0, n_pad - n)))
        w_t = jnp.pad(w_t, ((0, 0), (0, 0), (0, n_pad - n)))
    return idx_t, w_t


@functools.partial(jax.jit, static_argnames=("interpret",))
def onehot_gather_fwd_pallas(flat: jax.Array, idx: jax.Array, w4: jax.Array,
                             interpret: bool = False) -> jax.Array:
    """flat [B, K, C]; idx/w4 [B, N, 4] -> [B, N, C] f32."""
    interpret = interpret or jax.default_backend() != "tpu"
    b, k, c = flat.shape
    n = idx.shape[1]
    k_pad = _round_up(k, 128)
    n_pad = _round_up(n, BLK)
    if k_pad != k:
        flat = jnp.pad(flat, ((0, 0), (0, k_pad - k), (0, 0)))
    idx_t, w_t = _pad_points(idx, w4, n_pad)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, k_pad=k_pad),
        grid=(b, n_pad // BLK),
        in_specs=[
            pl.BlockSpec((1, k_pad, c), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, BLK), lambda bi, i: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, BLK), lambda bi, i: (bi, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLK, c), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c), jnp.float32),
        interpret=interpret,
    )(flat, idx_t, w_t)
    return out[:, :n]


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def onehot_scatter_bwd_pallas(g: jax.Array, idx: jax.Array, w4: jax.Array,
                              k: int, interpret: bool = False) -> jax.Array:
    """Transposed gather: g [B, N, C] point grads -> [B, K, C] f32 map grad."""
    interpret = interpret or jax.default_backend() != "tpu"
    b, n, c = g.shape
    k_pad = _round_up(k, 128)
    n_pad = _round_up(n, BLK)
    if n_pad != n:
        g = jnp.pad(g, ((0, 0), (0, n_pad - n), (0, 0)))
    idx_t, w_t = _pad_points(idx, w4, n_pad)

    out = pl.pallas_call(
        functools.partial(_bwd_kernel, k_pad=k_pad),
        grid=(b, n_pad // BLK),
        in_specs=[
            pl.BlockSpec((1, BLK, c), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, BLK), lambda bi, i: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, BLK), lambda bi, i: (bi, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k_pad, c), lambda bi, i: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k_pad, c), jnp.float32),
        interpret=interpret,
    )(g, idx_t, w_t)
    return out[:, :k]
