"""K8 (pricing prototype): 3x3 stride-1 same-pad conv forward + wgrad.

NOT production-wired. VERDICT r3 item 5b: the encoder's remaining conv
headroom (layer1-3 wgrad/dgrad at ~63 TFLOP/s avg) was declared XLA-internal
in r3 without a Pallas prototype to price it; this kernel is that price
check, measured against XLA's own lowering at the layer2 shape
([7, 60, 80, 128] x [3, 3, 128, 128] — the biggest single conv cost in the
r3 trace) by benchmarks/conv_kernel_bench.py. If it loses, the
measured-and-rejected record closes the question; if it wins, it becomes the
template for a conv suite.

Design: grid over (batch, row-blocks). Each step assembles the row block
plus one halo row on each side (three clamped BlockSpec views of x, zero-
masked at the image borders — same trick as pack2x2.py's two-row read), then
accumulates the nine taps as [RB*W, C] @ [C, Cout] MXU matmuls with the
column shift applied by zero-filled concatenation. wgrad accumulates
dW[9, C, Cout] across the sequential grid (K7's weight-grad pattern).
Reference counterpart: torchvision resnet34 BasicBlock convs
(models/encoder/encoder_resnet.py:35).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_cols(rows, dx):
    """rows [R, W, C] shifted along W by (dx - 1) with zero fill."""
    if dx == 0:  # tap reads column j-1: shift right, zero at col 0
        return jnp.concatenate([jnp.zeros_like(rows[:, :1]), rows[:, :-1]], axis=1)
    if dx == 2:  # tap reads column j+1: shift left, zero at col W-1
        return jnp.concatenate([rows[:, 1:], jnp.zeros_like(rows[:, :1])], axis=1)
    return rows


def _fwd_kernel(top_ref, mid_ref, bot_ref, w_ref, out_ref, *, rb, nrb):
    r = pl.program_id(1)
    # assemble [RB+2, W, C] with zero halo at the image borders
    top = top_ref[0]  # [RB, W, C] block r-1 (clamped) — only its last row used
    mid = mid_ref[0]
    bot = bot_ref[0]  # block r+1 (clamped) — only its first row used
    zero_top = jnp.where(r == 0, 0.0, 1.0).astype(mid.dtype)
    zero_bot = jnp.where(r == nrb - 1, 0.0, 1.0).astype(mid.dtype)
    xblk = jnp.concatenate(
        [top[-1:] * zero_top, mid, bot[:1] * zero_bot], axis=0
    )  # [RB+2, W, C]
    wk = w_ref[...]  # [9, C, Cout]
    w, c = mid.shape[1], mid.shape[2]
    acc = jnp.zeros((rb * w, wk.shape[-1]), jnp.float32)
    for dy in range(3):
        rows = xblk[dy:dy + rb]
        for dx in range(3):
            shifted = _shift_cols(rows, dx).reshape(rb * w, c)
            acc = acc + jnp.dot(shifted, wk[dy * 3 + dx],
                                preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(rb, w, -1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rb", "interpret"))
def conv3x3_fwd_pallas(x: jax.Array, w: jax.Array, rb: int = 6,
                       interpret: bool = False) -> jax.Array:
    """x [B, H, W, C] (H % rb == 0), w [3, 3, C, Cout] -> [B, H, W, Cout]."""
    b, h, wd, c = x.shape
    assert h % rb == 0, (h, rb)
    nrb = h // rb
    cout = w.shape[-1]
    wk = w.reshape(9, c, cout).astype(x.dtype)
    spec = lambda fn: pl.BlockSpec((1, rb, wd, c), fn, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, rb=rb, nrb=nrb),
        grid=(b, nrb),
        in_specs=[
            spec(lambda bi, r: (bi, jnp.maximum(r - 1, 0), 0, 0)),
            spec(lambda bi, r: (bi, r, 0, 0)),
            spec(lambda bi, r: (bi, jnp.minimum(r + 1, nrb - 1), 0, 0)),
            pl.BlockSpec((9, c, cout), lambda bi, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rb, wd, cout), lambda bi, r: (bi, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, cout), x.dtype),
        interpret=interpret,
    )(x, x, x, wk)


def _wgrad_kernel(top_ref, mid_ref, bot_ref, g_ref, out_ref, *, rb, nrb):
    bi = pl.program_id(0)
    r = pl.program_id(1)
    top = top_ref[0]
    mid = mid_ref[0]
    bot = bot_ref[0]
    g = g_ref[0]  # [RB, W, Cout]
    zero_top = jnp.where(r == 0, 0.0, 1.0).astype(mid.dtype)
    zero_bot = jnp.where(r == nrb - 1, 0.0, 1.0).astype(mid.dtype)
    xblk = jnp.concatenate(
        [top[-1:] * zero_top, mid, bot[:1] * zero_bot], axis=0
    )
    w, c = mid.shape[1], mid.shape[2]
    cout = g.shape[-1]
    gf = g.reshape(rb * w, cout)

    @pl.when((bi == 0) & (r == 0))
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    for dy in range(3):
        rows = xblk[dy:dy + rb]
        for dx in range(3):
            shifted = _shift_cols(rows, dx).reshape(rb * w, c)
            # dW[tap] += x_shifted^T @ g   ([C, N] @ [N, Cout])
            contrib = jax.lax.dot_general(
                shifted, gf, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            tap = dy * 3 + dx
            out_ref[tap] = out_ref[tap] + contrib


@functools.partial(jax.jit, static_argnames=("rb", "interpret"))
def conv3x3_wgrad_pallas(x: jax.Array, g: jax.Array, rb: int = 6,
                         interpret: bool = False) -> jax.Array:
    """dW for the 3x3 same-pad conv: x [B, H, W, C], g [B, H, W, Cout]
    -> [3, 3, C, Cout] float32 (accumulated across the sequential grid)."""
    b, h, wd, c = x.shape
    assert h % rb == 0, (h, rb)
    nrb = h // rb
    cout = g.shape[-1]
    spec = lambda fn: pl.BlockSpec((1, rb, wd, c), fn, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_wgrad_kernel, rb=rb, nrb=nrb),
        grid=(b, nrb),
        in_specs=[
            spec(lambda bi, r: (bi, jnp.maximum(r - 1, 0), 0, 0)),
            spec(lambda bi, r: (bi, r, 0, 0)),
            spec(lambda bi, r: (bi, jnp.minimum(r + 1, nrb - 1), 0, 0)),
            pl.BlockSpec((1, rb, wd, cout), lambda bi, r: (bi, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9, c, cout), lambda bi, r: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9, c, cout), jnp.float32),
        interpret=interpret,
    )(x, x, x, g)
    return out.reshape(3, 3, c, cout)
