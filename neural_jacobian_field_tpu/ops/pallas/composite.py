"""K3: fused alpha-compositing kernel.

One VMEM pass per ray-tile computes
  delta_density -> alpha -> exclusive-scan transmittance -> weights
  -> weighted reductions (rgb, expected depth, accumulation)
without materializing intermediates (alphas, transmittance, delta_density) to
HBM. Replaces the XLA chain in ops/compositing.py (reference:
ray_samplers.py:77-101 + models/model.py:257-286) on the inference path,
where the per-sample weights don't need to be kept for losses.

Tiling: rays on the sublane axis (tile 8), samples on the lane axis — the
cumsum runs along lanes on the VPU. Ray count must be padded to the tile by
the wrapper.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_TILE = 8


def _kernel(density_ref, delta_ref, steps_ref, values_ref,
            weights_ref, comp_ref, depth_ref, acc_ref):
    density = density_ref[:]  # [T, S]
    delta = delta_ref[:]
    dd = jnp.where(delta > 0, delta * density, 0.0)
    alpha = 1.0 - jnp.exp(-dd)
    # exclusive scan as a strict-lower-triangular matmul on the MXU
    # (Pallas TPU has no cumsum primitive): accum[t, j] = sum_{i<j} dd[t, i].
    s = dd.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    strict_lower = (rows < cols).astype(jnp.float32)  # [S, S]: i < j
    accum = jax.lax.dot_general(
        dd, strict_lower,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    weights = alpha * jnp.exp(-accum)  # [T, S]
    weights_ref[:] = weights

    # weighted channel reduction on the VPU (Mosaic's dot has no batch dims)
    comp_ref[:] = jnp.sum(weights[..., None] * values_ref[:], axis=1)
    w_sum = jnp.sum(weights, axis=-1, keepdims=True)
    depth = jnp.sum(weights * steps_ref[:], axis=-1, keepdims=True) / (w_sum + 1e-10)
    depth_ref[:] = depth
    acc_ref[:] = w_sum


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_composite(densities: jax.Array, deltas: jax.Array, steps: jax.Array,
                    values: jax.Array, interpret: bool = False):
    """Fused weights + composite + expected depth.

    Args:
      densities/deltas/steps: [N, S]; values: [N, S, C].
    Returns (weights [N, S], comp [N, C], depth [N, 1], accumulation [N, 1]).
    N is padded to a multiple of 8 internally.
    """
    # Mosaic kernels only compile for TPU; interpret elsewhere (CPU tests)
    interpret = interpret or jax.default_backend() != "tpu"
    n, s = densities.shape
    c = values.shape[-1]
    pad = (-n) % RAY_TILE
    if pad:
        padded = lambda x: jnp.concatenate(
            [x, jnp.zeros((pad, *x.shape[1:]), x.dtype)], axis=0)
        densities, deltas, steps, values = map(
            padded, (densities, deltas, steps, values))
    n_pad = n + pad
    grid = (n_pad // RAY_TILE,)

    row_spec = pl.BlockSpec((RAY_TILE, s), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    val_spec = pl.BlockSpec((RAY_TILE, s, c), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_specs = (
        row_spec,
        pl.BlockSpec((RAY_TILE, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )
    weights, comp, depth, acc = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[row_spec, row_spec, row_spec, val_spec],
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, s), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        ),
        interpret=interpret,
    )(densities.astype(jnp.float32), deltas.astype(jnp.float32),
      steps.astype(jnp.float32), values.astype(jnp.float32))
    return weights[:n], comp[:n], depth[:n], acc[:n]
