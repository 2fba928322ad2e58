"""K5: fused inverse-CDF (PDF) resampling kernel.

One VMEM pass per ray-tile fuses the whole proposal-resampling chain from
ops/pdf.py (reference ray_samplers.py:326-451): histogram padding ->
normalization -> CDF (triangular matmul; Mosaic has no cumsum) ->
searchsorted (compare-reduce) -> bin interpolation. Dynamic gathers are
replaced by one-hot reductions (Mosaic has no gather): the [Q, S+1] one-hot
masks contract against the CDF/bin rows on the VPU.

Jitter `u` is passed in (computed with jax.random outside) so the kernel is
bit-comparable with the XLA reference in interpret mode. On real TPUs the
MXU-matmul cumsum accumulates in a different order than jnp.cumsum, so
bin-boundary ties can resolve to the adjacent bin — outputs differ by at most
one bin width and are distributionally equivalent (hence opt-in via
`use_pallas` at the call site).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_TILE = 8


def _make_kernel(num_bins: int, histogram_padding: float, eps: float):
    def kernel(bins_ref, weights_ref, u_ref, out_ref):
        bins = bins_ref[:]  # [T, S+1]
        w = weights_ref[:] + histogram_padding  # [T, S]
        u = u_ref[:]  # [T, Q]
        t_rays, s = w.shape

        w_sum = jnp.sum(w, axis=-1, keepdims=True)
        padding = jnp.maximum(eps - w_sum, 0.0)
        w = w + padding / s
        w_sum = w_sum + padding
        pdf = w / w_sum

        # inclusive cumsum as lower-triangular (i <= j) matmul on the MXU
        rows = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        incl = (rows <= cols).astype(jnp.float32)
        csum = jax.lax.dot_general(
            pdf, incl, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        cdf = jnp.concatenate(
            [jnp.zeros((t_rays, 1), jnp.float32), jnp.minimum(csum, 1.0)], axis=-1
        )  # [T, S+1]

        # searchsorted(side="right"): counts of cdf <= u  -> [T, Q]
        inds = jnp.sum(
            (cdf[:, :, None] <= u[:, None, :]).astype(jnp.int32), axis=1
        )
        below = jnp.clip(inds - 1, 0, s)
        above = jnp.clip(inds, 0, s)

        # gather-free lookups: one-hot contraction over the S+1 axis
        lane = jax.lax.broadcasted_iota(jnp.int32, (t_rays, u.shape[-1], s + 1), 2)
        oh_below = (lane == below[:, :, None]).astype(jnp.float32)
        oh_above = (lane == above[:, :, None]).astype(jnp.float32)
        cdf_g0 = jnp.sum(oh_below * cdf[:, None, :], axis=-1)
        cdf_g1 = jnp.sum(oh_above * cdf[:, None, :], axis=-1)
        bins_g0 = jnp.sum(oh_below * bins[:, None, :], axis=-1)
        bins_g1 = jnp.sum(oh_above * bins[:, None, :], axis=-1)

        denom = cdf_g1 - cdf_g0
        t = jnp.where(denom > 0, (u - cdf_g0) / jnp.where(denom > 0, denom, 1.0), 0.0)
        t = jnp.clip(t, 0.0, 1.0)
        out_ref[:] = bins_g0 + t * (bins_g1 - bins_g0)

    return kernel


@functools.partial(jax.jit, static_argnames=("num_samples", "stratified", "single_jitter",
                                             "histogram_padding", "eps", "interpret"))
def fused_sample_pdf(
    key: jax.Array,
    existing_bins: jax.Array,
    weights: jax.Array,
    num_samples: int,
    stratified: bool = True,
    single_jitter: bool = False,
    histogram_padding: float = 0.01,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jax.Array:
    """Pallas equivalent of ops.pdf.sample_pdf (flattens leading dims to a
    ray axis; returns the same [..., num_samples+1] gradient-stopped edges)."""
    # Mosaic kernels only compile for TPU; interpret elsewhere (CPU tests)
    interpret = interpret or jax.default_backend() != "tpu"
    num_bins = num_samples + 1
    lead = existing_bins.shape[:-1]
    s1 = existing_bins.shape[-1]
    bins = existing_bins.reshape(-1, s1)
    w = weights.reshape(-1, s1 - 1)
    n = bins.shape[0]

    u = jnp.linspace(0.0, 1.0 - 1.0 / num_bins, num_bins, dtype=jnp.float32)
    u = jnp.broadcast_to(u, (n, num_bins))
    if stratified:
        shape = (n, 1 if single_jitter else num_bins)
        u = u + jax.random.uniform(key, shape, dtype=jnp.float32) / num_bins
    else:
        u = u + 0.5 / num_bins

    pad = (-n) % RAY_TILE
    if pad:
        bins = jnp.concatenate([bins, jnp.broadcast_to(
            jnp.linspace(0, 1, s1, dtype=bins.dtype), (pad, s1))])
        w = jnp.concatenate([w, jnp.ones((pad, s1 - 1), w.dtype)])
        u = jnp.concatenate([u, jnp.full((pad, num_bins), 0.5, u.dtype)])
    n_pad = n + pad

    spec = lambda d: pl.BlockSpec((RAY_TILE, d), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_kernel(num_bins, histogram_padding, eps),
        grid=(n_pad // RAY_TILE,),
        in_specs=[spec(s1), spec(s1 - 1), spec(num_bins)],
        out_specs=spec(num_bins),
        out_shape=jax.ShapeDtypeStruct((n_pad, num_bins), jnp.float32),
        interpret=interpret,
    )(bins.astype(jnp.float32), w.astype(jnp.float32), u)
    return jax.lax.stop_gradient(out[:n].reshape(*lead, num_bins))
