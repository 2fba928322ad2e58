"""K6: fused 2x2 patch packing for the pixel-gather layout.

pack_2x2 + flatten (ops/pixel_gather.py) asks XLA to materialize a 4-slice
concat [B, H, W, 4C] and then fix its layout for the row-gather consumer —
at the reference fine-level shape that chain costs ~6 ms forward and ~3 ms
backward of pure data movement (trace r2: concatenate.74 + copy.3197/3064 +
the backward fold fusions). This kernel writes the packed flat rows
directly: one grid step per (batch, image row) reads rows y and y+1 and
emits the [W, 4C] packed block in its final row-major layout — one read of
the map (x2 for the row overlap), one write, no layout copies.

Row semantics match pack_2x2 exactly, including the duplicated last row /
column (right/down shifts replicate the border, and the backward folds the
duplicate's gradient back onto the border texel).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(a_ref, b_ref, out_ref):
    a = a_ref[0, 0]  # [W, C] row y
    b = b_ref[0, 0]  # [W, C] row min(y+1, H-1)
    c = a.shape[-1]
    a_r = jnp.concatenate([a[1:], a[-1:]], axis=0)
    b_r = jnp.concatenate([b[1:], b[-1:]], axis=0)
    out_ref[0, :, 0 * c:1 * c] = a
    out_ref[0, :, 1 * c:2 * c] = a_r
    out_ref[0, :, 2 * c:3 * c] = b
    out_ref[0, :, 3 * c:4 * c] = b_r


def _bwd_kernel(g_ref, gp_ref, out_ref, *, h):
    """d_fine row y from packed grads of rows y (g) and y-1 (gp).

    Forward: out[y] = [a, a_r, b, b_r] with a = fine[y], b = fine[y+1]
    (clamped at H-1). Transpose:
      d[y] = g[y].a-chans + unshift(g[y].a_r-chans)
           + g[y-1].b-chans + unshift(g[y-1].b_r-chans)      (y >= 1)
           + [y == H-1] (g[y].b-chans + unshift(g[y].b_r-chans))
    where unshift(v)[x] = v[x-1] (v[-1] dropped to x=0? no: x=0 gets none)
    plus the border duplicate: unshift(v)[W-1] += v[W-1].
    """
    y = pl.program_id(1)
    g = g_ref[0]   # [W, 4C] row y
    gp = gp_ref[0]  # [W, 4C] row max(y-1, 0)
    c = out_ref.shape[-1]

    def unshift(v):
        # transpose of right = concat(x[1:], x[-1:]): d[x] = v[x-1] (x>=1),
        # d[W-1] += v[W-1]. (iota mask instead of .at[...] — Mosaic has no
        # dynamic_update_slice on values)
        zero = jnp.zeros_like(v[:1])
        d = jnp.concatenate([zero, v[:-1]], axis=0)
        rows = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        return d + jnp.where(rows == v.shape[0] - 1, v, 0)

    acc = g[:, 0 * c:1 * c] + unshift(g[:, 1 * c:2 * c])
    from_above = gp[:, 2 * c:3 * c] + unshift(gp[:, 3 * c:4 * c])
    acc = acc + jnp.where(y >= 1, 1.0, 0.0).astype(acc.dtype) * from_above
    dup = g[:, 2 * c:3 * c] + unshift(g[:, 3 * c:4 * c])
    acc = acc + jnp.where(y == h - 1, 1.0, 0.0).astype(acc.dtype) * dup
    out_ref[0, 0] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pack_fwd_pallas(fine: jax.Array, interpret: bool = False) -> jax.Array:
    b, h, w, c = fine.shape
    return pl.pallas_call(
        _fwd_kernel,
        grid=(b, h),
        in_specs=[
            pl.BlockSpec((1, 1, w, c), lambda bi, y: (bi, y, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w, c),
                         lambda bi, y: (bi, jnp.minimum(y + 1, h - 1), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, w, 4 * c), lambda bi, y: (bi, y, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * w, 4 * c), fine.dtype),
        interpret=interpret,
    )(fine, fine)


@functools.partial(jax.jit, static_argnames=("h", "interpret"))
def _pack_bwd_pallas(g: jax.Array, h: int, interpret: bool = False) -> jax.Array:
    b, hw, c4 = g.shape
    w = hw // h
    c = c4 // 4
    return pl.pallas_call(
        functools.partial(_bwd_kernel, h=h),
        grid=(b, h),
        in_specs=[
            pl.BlockSpec((1, w, c4), lambda bi, y: (bi, y, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, c4),
                         lambda bi, y: (bi, jnp.maximum(y - 1, 0), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, w, c), lambda bi, y: (bi, y, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), g.dtype),
        interpret=interpret,
    )(g, g)


def _use_pallas(h: int, w: int, c: int) -> bool:
    """Mosaic requires the trailing two block dims be (8, 128)-divisible (or
    equal to the array dims); tiny maps — e.g. a 3x4 coarse level on a toy
    scene — fall back to the XLA pack."""
    return (jax.default_backend() == "tpu" and w % 8 == 0
            and c % 128 == 0)


@jax.custom_vjp
def pack_2x2_flat(fine: jax.Array) -> jax.Array:
    """[B, H, W, C] -> [B, H*W, 4C] packed rows (pack_2x2 + flatten fused)."""
    out, _ = _pack_flat_fwd(fine)
    return out


def _pack_flat_fwd(fine):
    b, h, w, c = fine.shape
    if _use_pallas(h, w, c):
        out = _pack_fwd_pallas(fine)
    else:
        from ..pixel_gather import pack_2x2

        out = pack_2x2(fine).reshape(b, h * w, 4 * c)
    return out, (jnp.zeros((h, w, 0), fine.dtype),)


def _pack_flat_bwd(res, g):
    (spec,) = res
    h, w, _ = spec.shape
    if _use_pallas(h, w, g.shape[-1] // 4):
        return (_pack_bwd_pallas(g, h),)
    b = g.shape[0]
    c = g.shape[-1] // 4
    gi = g.reshape(b, h, w, 4 * c)

    def unshift_x(v):
        d = jnp.concatenate([jnp.zeros_like(v[:, :, :1]), v[:, :, :-1]], axis=2)
        return d.at[:, :, -1].add(v[:, :, -1])

    def unshift_y(v):
        d = jnp.concatenate([jnp.zeros_like(v[:, :1]), v[:, :-1]], axis=1)
        return d.at[:, -1].add(v[:, -1])

    d = gi[..., 0 * c:1 * c]
    d = d + unshift_x(gi[..., 1 * c:2 * c])
    d = d + unshift_y(gi[..., 2 * c:3 * c])
    d = d + unshift_y(unshift_x(gi[..., 3 * c:4 * c]))
    return (d,)


pack_2x2_flat.defvjp(_pack_flat_fwd, _pack_flat_bwd)
