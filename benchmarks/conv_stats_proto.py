"""K10 prototype: fold BatchNorm batch-stats accumulation into the K9
stride-1 conv epilogue.

Motivation (VERDICT r4 item 1 "while there" + item 6): the r4 trace showed
~3.1 ms/step of BatchNorm stats work — per-channel sum/sumsq reductions
that RE-READ every conv output from HBM. The K9 fwd kernel already holds
each output block's f32 accumulator in VMEM; emitting per-channel partial
sums there makes the stats pass HBM-free.

This file prices the idea WITHOUT touching the production encoder:
  - `conv3x3_stats(x, w)` -> (y, sum[Cout], sumsq[Cout])  (stride 1)
  - CPU interpret-mode parity vs XLA conv + jnp reductions
  - on-chip microbench: fused kernel vs K9-conv-then-XLA-stats vs
    XLA-conv-then-XLA-stats at the three production stride-1 shapes

Usage:
  python benchmarks/conv_stats_proto.py parity    # CPU, interpret mode
  python benchmarks/conv_stats_proto.py bench     # real chip

If the fused variant prices at ~conv-only time (stats ~free) the full
integration (custom VJP: cotangents (gy, gs1, gs2) fold into
g_eff = gy + gs1 + 2*y*gs2 before the K9 backward) is worth building;
otherwise this file is the measured-and-rejected record.
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neural_jacobian_field_tpu.ops.pallas.conv_suite import (
    _pick_rb, _shift_cols, conv3x3,
)


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
    acc = jnp.dot(asm, w_ref[...],
                  preferred_element_type=jnp.promote_types(asm.dtype,
                                                           jnp.float32))
    out_ref[0] = acc.reshape(rb, w, -1).astype(out_ref.dtype)

    # stats epilogue: per-channel partial sums of the f32 accumulator,
    # accumulated across the sequential grid (VPU reductions on data
    # already in VMEM — the whole point: no second HBM read of y).
    @pl.when((bi == 0) & (r == 0))
    def _init():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    s1_ref[...] += jnp.sum(acc, axis=0, keepdims=True)
    s2_ref[...] += jnp.sum(acc * acc, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3x3_stats(x, w, interpret=False):
    """Stride-1 3x3 same-pad conv + per-channel (sum, sumsq) of the OUTPUT.

    x [B, H, W, C], w [3, 3, C, Cout] -> (y [B, H, W, Cout] in x.dtype,
    sum [Cout] f32, sumsq [Cout] f32). Stats are computed from the f32
    accumulator (pre-downcast), so they are MORE accurate than a stats
    pass over a bf16 y.
    """
    interpret = interpret or jax.default_backend() != "tpu"
    b, h, wd, c = x.shape
    rb = _pick_rb(h)
    nrb = h // rb
    cout = w.shape[-1]
    wk = w.reshape(9 * c, cout).astype(x.dtype)
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
            jax.ShapeDtypeStruct((1, cout), jnp.float32),
            jax.ShapeDtypeStruct((1, cout), jnp.float32),
        ],
        interpret=interpret,
    )(x, x, x, wk)
    return y, s1[0], s2[0]


def _xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def parity():
    for shape, cout in [((2, 20, 16, 8), 8), ((2, 10, 8, 16), 32)]:
        kx, kw = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(kx, shape, jnp.float32)
        w = jax.random.normal(kw, (3, 3, shape[-1], cout), jnp.float32) * 0.1
        y, s1, s2 = conv3x3_stats(x, w)
        want = _xla_conv(x, w)
        np.testing.assert_allclose(y, want, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(s1, jnp.sum(want, axis=(0, 1, 2)),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(s2, jnp.sum(want ** 2, axis=(0, 1, 2)),
                                   rtol=1e-4, atol=1e-4)
        print(f"parity ok {shape} cout={cout}")
    print("PARITY-OK")


def _sync(x):
    return float(np.asarray(jax.device_get(jnp.ravel(x)[0])))


def _time(fn, *args, iters=50):
    out = fn(*args)
    _sync(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def bench():
    shapes = [((7, 120, 160, 64), 64), ((7, 60, 80, 128), 128),
              ((7, 30, 40, 256), 256)]
    for shape, cout in shapes:
        x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
        w = (jax.random.normal(jax.random.PRNGKey(1),
                               (3, 3, shape[-1], cout)) * 0.05
             ).astype(jnp.bfloat16)

        @jax.jit
        def fused(a, b):
            y, s1, s2 = conv3x3_stats(a, b)
            return y, s1, s2

        @jax.jit
        def k9_then_stats(a, b):
            y = conv3x3(a, b, 1)
            yf = y.astype(jnp.float32)
            return y, jnp.sum(yf, (0, 1, 2)), jnp.sum(yf * yf, (0, 1, 2))

        @jax.jit
        def xla_then_stats(a, b):
            y = _xla_conv(a, b)
            yf = y.astype(jnp.float32)
            return y, jnp.sum(yf, (0, 1, 2)), jnp.sum(yf * yf, (0, 1, 2))

        tf = _time(fused, x, w)
        tk = _time(k9_then_stats, x, w)
        tx = _time(xla_then_stats, x, w)
        tc = _time(jax.jit(lambda a, b: conv3x3(a, b, 1)), x, w)
        print(f"{shape} cout={cout}: fused {tf:.3f} ms | k9+stats {tk:.3f} "
              f"| xla+stats {tx:.3f} | k9 conv only {tc:.3f}")
    print("BENCH-OK")


if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir",
                      str(Path.home() / ".cache" / "njf_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    {"parity": parity, "bench": bench}[sys.argv[1] if len(sys.argv) > 1
                                       else "parity"]()
