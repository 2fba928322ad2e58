"""K2: fused field-MLP (ResnetFC) point evaluation.

Evaluates the whole PixelNeRF trunk — lin_in, n_blocks residual FC blocks
with additive latent injection, lin_out (models/resnet_fc.py; reference
model_components/resnet_fc.py:11-154) — in ONE kernel per point-tile: all
weights live in VMEM (~1.5 MB at d_hidden=128, encoder_dim=512) and
activations never round-trip to HBM between layers. Replaces the XLA chain
on inference paths behind `use_pallas` flags; training keeps the XLA
reference (this kernel is forward-only).

Tiling: points on the sublane axis (tile 256), d_hidden=128 on the lane axis
— every matmul is an MXU-shaped [256, K] @ [K, 128].
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.resnet_fc import MlpCfg

POINT_TILE = 256


def _make_kernel(n_blocks: int, n_lin_z: int):
    def kernel(*refs):
        # refs: z, x, W_in, b_in, [Wz_i, bz_i]*n_lin_z,
        #       [W0_i, b0_i, W1_i, b1_i]*n_blocks, W_out, b_out, out
        it = iter(refs)
        z_ref, x_ref = next(it), next(it)
        w_in, b_in = next(it), next(it)
        zs = [(next(it), next(it)) for _ in range(n_lin_z)]
        blocks = [(next(it), next(it), next(it), next(it)) for _ in range(n_blocks)]
        w_out, b_out = next(it), next(it)
        out_ref = next(it)

        dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
        z = z_ref[:]
        x = dot(x_ref[:], w_in[:]) + b_in[:]
        for i in range(n_blocks):
            if i < n_lin_z:
                wz, bz = zs[i]
                x = x + dot(z, wz[:]) + bz[:]
            w0, b0, w1, b1 = blocks[i]
            net = dot(jnp.maximum(x, 0.0), w0[:]) + b0[:]
            x = x + dot(jnp.maximum(net, 0.0), w1[:]) + b1[:]
        out_ref[:] = dot(jnp.maximum(x, 0.0), w_out[:]) + b_out[:]

    return kernel


def fused_resnet_fc(params: dict, cfg: MlpCfg, z: jax.Array, x: jax.Array,
                    d_out: int, interpret: bool = False) -> jax.Array:
    """Evaluate ResnetFC params (the Flax param dict of models/resnet_fc.py)
    at latent z [N, Dz] + encoded coords x [N, Dx]. Returns [N, d_out]."""
    # Mosaic kernels only compile for TPU; interpret elsewhere (CPU tests)
    interpret = interpret or jax.default_backend() != "tpu"
    n, dz = z.shape
    dx = x.shape[-1]
    n_lin_z = min(cfg.combine_layer, cfg.n_blocks)

    pad = (-n) % POINT_TILE
    if pad:
        z = jnp.concatenate([z, jnp.zeros((pad, dz), z.dtype)])
        x = jnp.concatenate([x, jnp.zeros((pad, dx), x.dtype)])
    n_pad = n + pad

    def w(name):
        return params[name]["kernel"].astype(jnp.float32)

    def b(name):
        return params[name]["bias"].astype(jnp.float32)[None, :]

    weights = [w("lin_in"), b("lin_in")]
    for i in range(n_lin_z):
        weights += [w(f"lin_z_{i}"), b(f"lin_z_{i}")]
    for i in range(cfg.n_blocks):
        weights += [w(f"blocks_{i}_fc_0"), b(f"blocks_{i}_fc_0"),
                    w(f"blocks_{i}_fc_1"), b(f"blocks_{i}_fc_1")]
    weights += [w("lin_out"), b("lin_out")]

    grid = (n_pad // POINT_TILE,)
    point_spec = lambda d: pl.BlockSpec((POINT_TILE, d), lambda i: (i, 0),
                                        memory_space=pltpu.VMEM)
    # weights: whole array in VMEM for every grid step
    weight_specs = [
        pl.BlockSpec(wt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for wt in weights
    ]

    out = pl.pallas_call(
        _make_kernel(cfg.n_blocks, n_lin_z),
        grid=grid,
        in_specs=[point_spec(dz), point_spec(dx), *weight_specs],
        out_specs=point_spec(d_out),
        out_shape=jax.ShapeDtypeStruct((n_pad, d_out), jnp.float32),
        interpret=interpret,
    )(z.astype(jnp.float32), x.astype(jnp.float32), *weights)
    return out[:n]
