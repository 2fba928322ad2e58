"""K7: fused ResnetFC trunk for TRAINING (forward + recompute-backward).

The trunk (models/resnet_fc.py; reference model_components/resnet_fc.py:
11-154) is a chain of [N, 128] matmuls over N = B*rays*samples points. XLA
evaluates it layer by layer, bouncing every [N, 128] activation through HBM
in both directions; at the reference workload the three trunk instances
(proposal density, nerf density, jacobian head) cost ~2x their MXU roofline.

This kernel evaluates the WHOLE trunk per point-tile with every weight
resident in VMEM (~0.4 MB at d_hidden=128):

  forward   one pass, bf16 matmuls with f32 accumulation, activations never
            leave VMEM; residuals are just (params, z, x).
  backward  recomputes the tile's activations in VMEM (cheaper than
            stashing ~14 [N,128] tensors to HBM), then backpropagates:
            dz via the fused lin_z matmul, per-layer dW/db accumulated in
            f32 across the sequential grid (same-block `+=` outputs).

The positional-encoding input x gets a ZERO cotangent: sample positions are
gradient-stopped at the samplers (see ops/pixel_gather.py docstring), so
XLA's dx chain is dead work this kernel skips. Parity vs the XLA trunk is
tested in tests/test_pallas.py (forward and every gradient).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.resnet_fc import MlpCfg

POINT_TILE = 512


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _dot(a, w):
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_t(a, w):
    """a @ w.T with f32 accumulation."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _step(v):
    """Arithmetic relu' (exact step for |v| >= 1e-30 in f32). A comparison
    mask here — any (v > 0)-derived operand feeding an MXU contraction —
    SEGFAULTS this libtpu's Mosaic compiler; clip(v*1e30, 0, 1) is pure
    min/max arithmetic and lowers fine."""
    return jnp.clip(v.astype(jnp.float32) * 1e30, 0.0, 1.0)


def _dot_at(a, g):
    """a.T @ g (weight gradient) with f32 accumulation."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), g.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _forward_tile(zs, x_pe, win, bin_, wzs, bz, blocks, n_lin_z, dh, stash,
                  tz=None):
    """Shared forward chain. Returns the final pre-activation x; if `stash`,
    also returns (x_in_i, relu(x_in_i), net_i, relu(net_i)) per block.

    zs/wzs are parallel lists: the latent may arrive pre-split by pyramid
    level (fine/mid/coarse), in which case tz accumulates one matmul per
    level — mathematically the same contraction as the concatenated form,
    but the [N, 512] concat (and its backward split) never exists in HBM.
    Alternatively `tz` arrives PRECOMPUTED (knot-side projection,
    ops/epipolar.KnotFeatures) and the lin_z contraction is skipped
    entirely.

    Every layer output is cast to bf16 (mirroring the XLA trunk's
    Dense(dtype=bf16) semantics) so the fwd/bwd recompute sees identical
    ReLU masks and the numerics track the unfused path."""
    bf = lambda v: v.astype(jnp.bfloat16)
    x = bf(_dot(x_pe, win) + bin_)
    if tz is not None:
        # precomputed injection; bias (bz) added here in VMEM — an XLA-side
        # broadcast add costs a [N, n*dh] HBM round-trip (trace r3c)
        tz = bf(tz + bz) if bz is not None else bf(tz)
    elif wzs is not None:
        acc = _dot(zs[0], wzs[0])
        for zl, wl in zip(zs[1:], wzs[1:]):
            acc = acc + _dot(zl, wl)
        tz = bf(acc + bz)
    saved = []
    for i, (w0, b0, w1, b1) in enumerate(blocks):
        if tz is not None and i < n_lin_z:
            x = x + tz[:, i * dh:(i + 1) * dh]
        ax = jnp.maximum(x, 0.0)
        net = bf(_dot(ax, w0) + b0)
        an = jnp.maximum(net, 0.0)
        if stash:
            saved.append((x, ax, net, an))
        x = x + bf(_dot(an, w1) + b1)
    return x, saved


def _make_fwd_kernel(n_blocks, n_lin_z, dh, n_levels, tz_mode=False):
    def kernel(*refs):
        it = iter(refs)
        if tz_mode:
            z_refs, tz_ref = [], next(it)
        else:
            z_refs, tz_ref = [next(it) for _ in range(n_levels)], None
        x_ref = next(it)
        win, bin_ = next(it)[:], next(it)[:]
        wzs = None
        if n_lin_z > 0 and not tz_mode:
            wzs = [next(it)[:] for _ in range(n_levels)]
        bz = next(it)[:] if n_lin_z > 0 else None
        blocks = [(next(it)[:], next(it)[:], next(it)[:], next(it)[:])
                  for _ in range(n_blocks)]
        wout, bout = next(it)[:], next(it)[:]
        out_ref = next(it)

        x, _ = _forward_tile([z[:] for z in z_refs], x_ref[:], win, bin_,
                             wzs, bz, blocks, n_lin_z, dh, stash=False,
                             tz=tz_ref[:] if tz_mode else None)
        out_ref[:] = _dot(jnp.maximum(x, 0.0), wout) + bout

    return kernel


def _make_bwd_kernel(n_blocks, n_lin_z, dh, n_levels, tz_mode=False):
    def kernel(*refs):
        it = iter(refs)
        if tz_mode:
            z_refs, tz_ref = [], next(it)
        else:
            z_refs, tz_ref = [next(it) for _ in range(n_levels)], None
        x_ref, g_ref = next(it), next(it)
        win, bin_ = next(it)[:], next(it)[:]
        wzs = None
        if n_lin_z > 0 and not tz_mode:
            wzs = [next(it)[:] for _ in range(n_levels)]
        bz = next(it)[:] if n_lin_z > 0 else None
        blocks = [(next(it)[:], next(it)[:], next(it)[:], next(it)[:])
                  for _ in range(n_blocks)]
        wout, bout = next(it)[:], next(it)[:]
        # outputs: dz* (or dtz), dwin, dbin, [dwz*] dbz, [dw0 db0 dw1 db1]*,
        # dwout, dbout
        if tz_mode:
            dz_refs, dtz_ref = [], next(it)
        else:
            dz_refs, dtz_ref = [next(it) for _ in range(n_levels)], None
        dwin_ref, dbin_ref = next(it), next(it)
        dwz_refs = None
        if n_lin_z > 0 and not tz_mode:
            dwz_refs = [next(it) for _ in range(n_levels)]
        dbz_ref = next(it) if n_lin_z > 0 else None
        dblocks = [(next(it), next(it), next(it), next(it))
                   for _ in range(n_blocks)]
        dwout_ref, dbout_ref = next(it), next(it)

        first = pl.program_id(0) == 0

        @pl.when(first)
        def _():
            dwin_ref[:] = jnp.zeros_like(dwin_ref)
            dbin_ref[:] = jnp.zeros_like(dbin_ref)
            if dwz_refs is not None:
                for dwz in dwz_refs:
                    dwz[:] = jnp.zeros_like(dwz)
            if dbz_ref is not None:
                dbz_ref[:] = jnp.zeros_like(dbz_ref)
            for dw0, db0, dw1, db1 in dblocks:
                dw0[:] = jnp.zeros_like(dw0)
                db0[:] = jnp.zeros_like(db0)
                dw1[:] = jnp.zeros_like(dw1)
                db1[:] = jnp.zeros_like(db1)
            dwout_ref[:] = jnp.zeros_like(dwout_ref)
            dbout_ref[:] = jnp.zeros_like(dbout_ref)

        zs = [z[:] for z in z_refs]
        x_pe, g = x_ref[:], g_ref[:]
        x_last, saved = _forward_tile(zs, x_pe, win, bin_, wzs, bz, blocks,
                                      n_lin_z, dh, stash=True,
                                      tz=tz_ref[:] if tz_mode else None)

        # lin_out
        ax_last = jnp.maximum(x_last, 0.0)
        dwout_ref[:] += _dot_at(ax_last, g)
        dbout_ref[:] += jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)
        dx = _dot_t(g, wout) * _step(x_last)

        dtz = []  # reverse order of blocks < n_lin_z
        for i in reversed(range(n_blocks)):
            w0, b0, w1, b1 = blocks[i]
            dw0, db0, dw1, db1 = dblocks[i]
            x_in, ax, net, an = saved[i]
            # x = x_in + an @ w1 + b1
            dw1[:] += _dot_at(an, dx)
            db1[:] += jnp.sum(dx, axis=0, keepdims=True)
            dnet = _dot_t(dx, w1) * _step(net)
            dw0[:] += _dot_at(ax, dnet)
            db0[:] += jnp.sum(dnet, axis=0, keepdims=True)
            dx = dx + _dot_t(dnet, w0) * _step(x_in)
            if i < n_lin_z:
                dtz.append(dx)

        if n_lin_z > 0:
            dtz_all = jnp.concatenate(list(reversed(dtz)), axis=-1)
            if tz_mode:
                dtz_ref[:] = dtz_all.astype(dtz_ref.dtype)
            else:
                for zl, wl, dz_ref, dwz_ref in zip(zs, wzs, dz_refs, dwz_refs):
                    dwz_ref[:] += _dot_at(zl, dtz_all)
                    dz_ref[:] = _dot_t(dtz_all, wl).astype(dz_ref.dtype)
            dbz_ref[:] += jnp.sum(dtz_all, axis=0, keepdims=True)
        else:
            for dz_ref in dz_refs:
                dz_ref[:] = jnp.zeros_like(dz_ref)
            if dtz_ref is not None:
                dtz_ref[:] = jnp.zeros_like(dtz_ref)

        dwin_ref[:] += _dot_at(x_pe, dx)
        dbin_ref[:] += jnp.sum(dx, axis=0, keepdims=True)

    return kernel


def _collect_weights(params, cfg: MlpCfg, n_lin_z: int, dtype, z_dims):
    """Params dict -> flat weights list. Biases are [1, d] so every operand
    is 2-D (TPU-friendly). The fused lin_z kernel [d_latent, n*dh] is split
    into one row-block per latent level (z_dims) so pre-split latents skip
    the HBM concat."""
    def w(name):
        return params[name]["kernel"].astype(dtype)

    def b(name):
        return params[name]["bias"].astype(dtype)[None, :]

    out = [w("lin_in"), b("lin_in")]
    if n_lin_z > 0:
        # tz mode (z_dims None): kernels get only the bias — the lin_z
        # KERNELS live in the XLA-side knot projection, but the bias (and
        # its gradient) stays in-kernel to avoid a [N, n*dh] broadcast add
        if z_dims is not None:
            wz_cat = jnp.concatenate([w(f"lin_z_{i}") for i in range(n_lin_z)], axis=1)
            r = 0
            for d in z_dims:
                out.append(wz_cat[r:r + d])
                r += d
        out.append(jnp.concatenate([b(f"lin_z_{i}") for i in range(n_lin_z)], axis=1))
    for i in range(cfg.n_blocks):
        out += [w(f"blocks_{i}_fc_0"), b(f"blocks_{i}_fc_0"),
                w(f"blocks_{i}_fc_1"), b(f"blocks_{i}_fc_1")]
    out += [w("lin_out"), b("lin_out")]
    return out


def _whole(arr_shape):
    return pl.BlockSpec(arr_shape, lambda i: tuple(0 for _ in arr_shape),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4, 5))
def fused_resnet_fc_train(params, cfg: MlpCfg, z, x, d_out: int,
                          interpret: bool = False):
    """ResnetFC trunk, fused fwd+bwd. params: the Flax param dict of
    models/resnet_fc.py. z [..., d_latent] OR a tuple of per-level arrays
    whose last dims sum to d_latent (the pyramid's fine/mid/coarse features
    pre-concat — the kernel contracts them against the matching lin_z row
    blocks, so the [N, 512] concat and its backward split never hit HBM;
    trace r3: 2x1.27 ms concat + 2.1 ms split at the reference shape).
    x [..., d_in] -> [..., d_out] f32. Differentiable wrt params and z
    (x gets a zero cotangent)."""
    out, _ = _k7_fwd(params, cfg, z, x, d_out, interpret)
    return out


def _pad_rows(a, n_pad):
    n = a.shape[0]
    if n_pad != n:
        a = jnp.concatenate([a, jnp.zeros((n_pad - n, a.shape[1]), a.dtype)])
    return a


def _as_levels(z):
    return list(z) if isinstance(z, (tuple, list)) else [z]


def _k7_fwd(params, cfg, z, x, d_out, interpret):
    interpret = interpret or jax.default_backend() != "tpu"
    zs = _as_levels(z)
    lead = zs[0].shape[:-1]
    z_dims = [zl.shape[-1] for zl in zs]
    dx_dim = x.shape[-1]
    z2s = [zl.reshape(-1, d) for zl, d in zip(zs, z_dims)]
    x2 = x.reshape(-1, dx_dim)
    n = z2s[0].shape[0]
    n_pad = _round_up(n, POINT_TILE)
    n_lin_z = min(cfg.combine_layer, cfg.n_blocks)
    dh = cfg.d_hidden

    # lin_out stays at its true d_out lane width (16/24 for the heads):
    # Mosaic pads narrow lanes inside VMEM, and writing [N, d_out] instead
    # of a 128-padded f32 block saves ~200 MB/call of HBM at ref shapes.
    weights = _collect_weights(params, cfg, n_lin_z, jnp.bfloat16, z_dims)

    zps = [_pad_rows(z2.astype(jnp.bfloat16), n_pad) for z2 in z2s]
    xp = _pad_rows(x2.astype(jnp.bfloat16), n_pad)

    point = lambda d: pl.BlockSpec((POINT_TILE, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_fwd_kernel(cfg.n_blocks, n_lin_z, dh, len(zs)),
        grid=(n_pad // POINT_TILE,),
        in_specs=[point(d) for d in z_dims] + [point(dx_dim)]
        + [_whole(w.shape) for w in weights],
        out_specs=point(d_out),
        out_shape=jax.ShapeDtypeStruct((n_pad, d_out), jnp.float32),
        interpret=interpret,
    )(*zps, xp, *weights)
    out = out[:n].reshape(*lead, d_out)
    return out, (params, z, x)


def _k7_bwd(cfg, d_out, interpret, res, g):
    params, z, x = res
    interpret = interpret or jax.default_backend() != "tpu"
    zs = _as_levels(z)
    lead = zs[0].shape[:-1]
    z_dims = [zl.shape[-1] for zl in zs]
    dx_dim = x.shape[-1]
    z2s = [zl.reshape(-1, d) for zl, d in zip(zs, z_dims)]
    x2 = x.reshape(-1, dx_dim)
    g2 = g.reshape(-1, d_out)
    n = z2s[0].shape[0]
    n_pad = _round_up(n, POINT_TILE)
    n_lin_z = min(cfg.combine_layer, cfg.n_blocks)
    dh = cfg.d_hidden

    weights = _collect_weights(params, cfg, n_lin_z, jnp.bfloat16, z_dims)

    zps = [_pad_rows(z2.astype(jnp.bfloat16), n_pad) for z2 in z2s]
    xp = _pad_rows(x2.astype(jnp.bfloat16), n_pad)
    gp = _pad_rows(g2.astype(jnp.bfloat16), n_pad)

    point = lambda d: pl.BlockSpec((POINT_TILE, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
    # grad outputs: per-level dz first — emitted directly in each z's dtype
    # (an f32 dz at the reference shape is a 940 MB HBM write plus a
    # 2x2.1 ms convert pass, trace r2/r3) — then the weight grads (f32).
    grad_shapes = [jax.ShapeDtypeStruct((n_pad, d), zl.dtype)
                   for zl, d in zip(zs, z_dims)]
    grad_specs = [point(d) for d in z_dims]
    for wgt in weights:
        grad_shapes.append(jax.ShapeDtypeStruct(wgt.shape, jnp.float32))
        grad_specs.append(_whole(wgt.shape))

    outs = pl.pallas_call(
        _make_bwd_kernel(cfg.n_blocks, n_lin_z, dh, len(zs)),
        grid=(n_pad // POINT_TILE,),
        in_specs=[point(d) for d in z_dims] + [point(dx_dim), point(d_out)]
        + [_whole(w.shape) for w in weights],
        out_specs=grad_specs,
        out_shape=grad_shapes,
        interpret=interpret,
    )(*zps, xp, gp, *weights)

    dzs = [o[:n].reshape(*lead, d) for o, d in zip(outs, z_dims)]
    it = iter(outs[len(zs):])

    def unb(b2d):
        return b2d[0]

    dparams = {}
    dwin, dbin = next(it), next(it)
    dparams["lin_in"] = {"kernel": dwin, "bias": unb(dbin)}
    if n_lin_z > 0:
        dwz = jnp.concatenate([next(it) for _ in range(len(zs))], axis=0)
        dbz = next(it)
        for i in range(n_lin_z):
            dparams[f"lin_z_{i}"] = {
                "kernel": dwz[:, i * dh:(i + 1) * dh],
                "bias": unb(dbz)[i * dh:(i + 1) * dh],
            }
    for i in range(cfg.n_blocks):
        dw0, db0, dw1, db1 = next(it), next(it), next(it), next(it)
        dparams[f"blocks_{i}_fc_0"] = {"kernel": dw0, "bias": unb(db0)}
        dparams[f"blocks_{i}_fc_1"] = {"kernel": dw1, "bias": unb(db1)}
    dwout, dbout = next(it), next(it)
    dparams["lin_out"] = {"kernel": dwout, "bias": unb(dbout)}

    # params may be f32: cast grads to the param dtypes
    dparams = jax.tree.map(lambda p, gr: gr.astype(p.dtype), dict(params), dparams)
    dz = type(z)(dzs) if isinstance(z, (tuple, list)) else dzs[0]
    return dparams, dz, jnp.zeros_like(x)


fused_resnet_fc_train.defvjp(
    lambda params, cfg, z, x, d_out, interpret: _k7_fwd(params, cfg, z, x, d_out, interpret),
    lambda cfg, d_out, interpret, res, g: _k7_bwd(cfg, d_out, interpret, res, g),
)


# ---------------------------------------------------------------------------
# tz mode: the latent injection arrives PRECOMPUTED (knot-side projection,
# ops/epipolar.KnotFeatures.project_then_interp) and the kernel skips the
# lin_z contraction in forward, recompute AND backward — at the reference
# trunk (512 latent, 3x128 injection) that contraction is ~half the trunk
# FLOPs, paid 4x per fwd+bwd pair. `params` here must contain the lin_z_*
# entries with ONLY their "bias" leaf (added + differentiated in-kernel);
# the lin_z kernel gradients flow through tz's XLA producer chain instead.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4, 5))
def fused_resnet_fc_train_tz(params, cfg: MlpCfg, tz, x, d_out: int,
                             interpret: bool = False):
    """ResnetFC trunk with precomputed latent injections.

    tz [..., n_lin_z*d_hidden] — lin_z(z) WITHOUT bias, summed per block
    slice (the bias adds in-kernel). x [..., d_in] -> [..., d_out] f32.
    Differentiable wrt params (lin_z: bias only) and tz; x gets a zero
    cotangent."""
    out, _ = _k7tz_fwd(params, cfg, tz, x, d_out, interpret)
    return out


def _k7tz_fwd(params, cfg, tz, x, d_out, interpret):
    interpret = interpret or jax.default_backend() != "tpu"
    lead = tz.shape[:-1]
    tz_dim, dx_dim = tz.shape[-1], x.shape[-1]
    tz2 = tz.reshape(-1, tz_dim)
    x2 = x.reshape(-1, dx_dim)
    n = tz2.shape[0]
    n_pad = _round_up(n, POINT_TILE)
    n_lin_z = min(cfg.combine_layer, cfg.n_blocks)
    assert tz_dim == n_lin_z * cfg.d_hidden, (tz_dim, n_lin_z, cfg.d_hidden)
    dh = cfg.d_hidden

    weights = _collect_weights(params, cfg, n_lin_z, jnp.bfloat16, None)

    tzp = _pad_rows(tz2.astype(jnp.bfloat16), n_pad)
    xp = _pad_rows(x2.astype(jnp.bfloat16), n_pad)

    point = lambda d: pl.BlockSpec((POINT_TILE, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_fwd_kernel(cfg.n_blocks, n_lin_z, dh, 0, tz_mode=True),
        grid=(n_pad // POINT_TILE,),
        in_specs=[point(tz_dim), point(dx_dim)] + [_whole(w.shape) for w in weights],
        out_specs=point(d_out),
        out_shape=jax.ShapeDtypeStruct((n_pad, d_out), jnp.float32),
        interpret=interpret,
    )(tzp, xp, *weights)
    out = out[:n].reshape(*lead, d_out)
    return out, (params, tz, x)


def _k7tz_bwd(cfg, d_out, interpret, res, g):
    params, tz, x = res
    interpret = interpret or jax.default_backend() != "tpu"
    lead = tz.shape[:-1]
    tz_dim, dx_dim = tz.shape[-1], x.shape[-1]
    tz2 = tz.reshape(-1, tz_dim)
    x2 = x.reshape(-1, dx_dim)
    g2 = g.reshape(-1, d_out)
    n = tz2.shape[0]
    n_pad = _round_up(n, POINT_TILE)
    n_lin_z = min(cfg.combine_layer, cfg.n_blocks)
    dh = cfg.d_hidden

    weights = _collect_weights(params, cfg, n_lin_z, jnp.bfloat16, None)

    tzp = _pad_rows(tz2.astype(jnp.bfloat16), n_pad)
    xp = _pad_rows(x2.astype(jnp.bfloat16), n_pad)
    gp = _pad_rows(g2.astype(jnp.bfloat16), n_pad)

    point = lambda d: pl.BlockSpec((POINT_TILE, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
    grad_shapes = [jax.ShapeDtypeStruct((n_pad, tz_dim), tz.dtype)]
    grad_specs = [point(tz_dim)]
    for wgt in weights:
        grad_shapes.append(jax.ShapeDtypeStruct(wgt.shape, jnp.float32))
        grad_specs.append(_whole(wgt.shape))

    outs = pl.pallas_call(
        _make_bwd_kernel(cfg.n_blocks, n_lin_z, dh, 0, tz_mode=True),
        grid=(n_pad // POINT_TILE,),
        in_specs=[point(tz_dim), point(dx_dim), point(d_out)]
        + [_whole(w.shape) for w in weights],
        out_specs=grad_specs,
        out_shape=grad_shapes,
        interpret=interpret,
    )(tzp, xp, gp, *weights)

    dtz = outs[0][:n].reshape(*lead, tz_dim)
    it = iter(outs[1:])

    def unb(b2d):
        return b2d[0]

    dparams = {}
    dwin, dbin = next(it), next(it)
    dparams["lin_in"] = {"kernel": dwin, "bias": unb(dbin)}
    if n_lin_z > 0:
        dbz = next(it)
        for i in range(n_lin_z):
            dparams[f"lin_z_{i}"] = {"bias": unb(dbz)[i * dh:(i + 1) * dh]}
    for i in range(cfg.n_blocks):
        dw0, db0, dw1, db1 = next(it), next(it), next(it), next(it)
        dparams[f"blocks_{i}_fc_0"] = {"kernel": dw0, "bias": unb(db0)}
        dparams[f"blocks_{i}_fc_1"] = {"kernel": dw1, "bias": unb(db1)}
    dwout, dbout = next(it), next(it)
    dparams["lin_out"] = {"kernel": dwout, "bias": unb(dbout)}
    dparams = jax.tree.map(lambda p, gr: gr.astype(p.dtype), dict(params), dparams)
    return dparams, dtz, jnp.zeros_like(x)


fused_resnet_fc_train_tz.defvjp(
    lambda params, cfg, tz, x, d_out, interpret: _k7tz_fwd(params, cfg, tz, x, d_out, interpret),
    lambda cfg, d_out, interpret, res, g: _k7tz_bwd(cfg, d_out, interpret, res, g),
)
