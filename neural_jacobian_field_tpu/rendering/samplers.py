"""Ray samplers: stratified spaced sampling + proposal/PDF resampling.

Pure-functional re-design of the reference's nerfstudio-derived samplers
(rendering/ray_samplers.py). Differences forced by XLA:
  - explicit PRNG keys instead of torch.rand;
  - `spacing_to_euclidean_fn` closures become a static SpacingKind tag plus
    per-ray (s_near, s_far) arrays carried on RaySamples;
  - the ProposalNetworkSampler's mutable anneal/step state
    (ray_samplers.py:484-495) becomes explicit `anneal` / `updated` scalars
    computed from the step index inside the jitted train step;
  - the "no_grad when not updated" gating (ray_samplers.py:536-544) becomes a
    differentiable jnp.where between live and stop-gradient densities, so one
    compiled graph serves both cases.
"""

from typing import Callable, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from ..ops.compositing import render_weights
from ..ops.pdf import sample_pdf

SpacingKind = str  # "uniform" | "lin_disp" | "piecewise"


def spacing_fn(kind: SpacingKind, x: jax.Array) -> jax.Array:
    """Euclidean distance -> normalized spacing domain (ray_samplers.py:272-323)."""
    if kind == "uniform":
        return x
    if kind == "lin_disp":
        return 1.0 / x
    if kind == "piecewise":
        return jnp.where(x < 1, x / 2, 1 - 1 / (2 * x))
    raise ValueError(kind)


def spacing_fn_inv(kind: SpacingKind, x: jax.Array) -> jax.Array:
    if kind == "uniform":
        return x
    if kind == "lin_disp":
        return 1.0 / x
    if kind == "piecewise":
        return jnp.where(x < 0.5, 2 * x, 1 / (2 - 2 * x))
    raise ValueError(kind)


@flax.struct.dataclass
class RayBundle:
    """Origins/directions [B, R, 3]; nears/fars [B, R, 1]."""

    origins: jax.Array
    directions: jax.Array
    nears: jax.Array
    fars: jax.Array


@flax.struct.dataclass
class RaySamples:
    """Per-sample frusta along rays (ray_samplers.py:28-101).

    starts/ends/deltas: [B, R, S, 1] euclidean; spacing_starts/ends: [B, R, S, 1]
    in [0, 1]; s_near/s_far: [B, R, 1] spacing-domain near/far; spacing: static
    tag for the euclidean conversion.
    """

    origins: jax.Array  # [B, R, 1, 3]
    directions: jax.Array  # [B, R, 1, 3]
    starts: jax.Array
    ends: jax.Array
    deltas: jax.Array
    spacing_starts: jax.Array
    spacing_ends: jax.Array
    s_near: jax.Array
    s_far: jax.Array
    spacing: SpacingKind = flax.struct.field(pytree_node=False, default="uniform")

    def get_positions(self) -> jax.Array:
        """Frustum-center world positions [B, R, S, 3] (ray_samplers.py:48-55)."""
        return self.origins + self.directions * (self.starts + self.ends) / 2

    def get_weights(self, densities: jax.Array) -> jax.Array:
        return render_weights(densities, self.deltas)

    def spacing_to_euclidean(self, x: jax.Array) -> jax.Array:
        return spacing_fn_inv(self.spacing, x * self.s_far + (1 - x) * self.s_near)


def sdist_edges(ray_samples: RaySamples) -> jax.Array:
    """Spacing-domain bin edges [B, R, S+1] (nerfstudio ray_samples_to_sdist)."""
    return jnp.concatenate(
        [ray_samples.spacing_starts[..., 0], ray_samples.spacing_ends[..., -1:, 0]],
        axis=-1,
    )


def tdist_edges(ray_samples: RaySamples) -> jax.Array:
    """Euclidean bin edges [B, R, S+1] (starts ++ last end) — used by the DS
    depth loss, which needs per-level steps/lengths (model_wrapper.py:127-137)."""
    return jnp.concatenate(
        [ray_samples.starts[..., 0], ray_samples.ends[..., -1:, 0]], axis=-1
    )


def _from_spacing_bins(ray_bundle: RayBundle, bins: jax.Array, kind: SpacingKind,
                       s_near: jax.Array, s_far: jax.Array) -> RaySamples:
    euclidean = spacing_fn_inv(kind, bins * s_far + (1 - bins) * s_near)
    starts = euclidean[..., :-1, None]
    ends = euclidean[..., 1:, None]
    return RaySamples(
        origins=ray_bundle.origins[..., None, :],
        directions=ray_bundle.directions[..., None, :],
        starts=starts,
        ends=ends,
        deltas=ends - starts,
        spacing_starts=bins[..., :-1, None],
        spacing_ends=bins[..., 1:, None],
        s_near=s_near,
        s_far=s_far,
        spacing=kind,
    )


def spaced_sample(
    key: jax.Array,
    ray_bundle: RayBundle,
    num_samples: int,
    kind: SpacingKind = "uniform",
    stratified: bool = True,
    single_jitter: bool = False,
) -> RaySamples:
    """Stratified spaced sampling (ray_samplers.py:172-253).

    Set stratified=False for eval (deterministic bin edges).
    """
    batch_shape = ray_bundle.origins.shape[:-1]
    bins = jnp.linspace(0.0, 1.0, num_samples + 1, dtype=ray_bundle.origins.dtype)
    bins = jnp.broadcast_to(bins, (*batch_shape, num_samples + 1))

    if stratified:
        shape = (*batch_shape, 1 if single_jitter else num_samples + 1)
        t_rand = jax.random.uniform(key, shape, dtype=bins.dtype)
        bin_centers = (bins[..., 1:] + bins[..., :-1]) / 2.0
        bin_upper = jnp.concatenate([bin_centers, bins[..., -1:]], axis=-1)
        bin_lower = jnp.concatenate([bins[..., :1], bin_centers], axis=-1)
        bins = bin_lower + (bin_upper - bin_lower) * t_rand

    s_near = spacing_fn(kind, ray_bundle.nears)
    s_far = spacing_fn(kind, ray_bundle.fars)
    return _from_spacing_bins(ray_bundle, bins, kind, s_near, s_far)


def pdf_sample(
    key: jax.Array,
    ray_bundle: RayBundle,
    ray_samples: RaySamples,
    weights: jax.Array,
    num_samples: int,
    stratified: bool = True,
    single_jitter: bool = False,
    include_original: bool = False,
    histogram_padding: float = 0.01,
    use_pallas: bool = False,
) -> RaySamples:
    """PDF resampling in spacing coordinates (ray_samplers.py:326-451).

    use_pallas: fused K5 kernel (ops/pallas/pdf_resample.py) — same
    distribution; boundary ties may resolve to the adjacent bin on TPU."""
    existing_bins = sdist_edges(ray_samples)
    if use_pallas and not include_original:
        from ..ops.pallas.pdf_resample import fused_sample_pdf

        # resampled bins are gradient-stopped in all implementations
        # (ray_samplers.py:441 bins.detach()); stopping the kernel INPUTS too
        # keeps the un-differentiable pallas_call out of the autodiff graph
        bins = fused_sample_pdf(
            key, jax.lax.stop_gradient(existing_bins),
            jax.lax.stop_gradient(weights[..., 0]), num_samples=num_samples,
            stratified=stratified, single_jitter=single_jitter,
            histogram_padding=histogram_padding,
        )
    else:
        bins = sample_pdf(
            key,
            existing_bins,
            weights[..., 0],
            num_samples=num_samples,
            stratified=stratified,
            single_jitter=single_jitter,
            include_original=include_original,
            histogram_padding=histogram_padding,
        )
    return _from_spacing_bins(
        ray_bundle, bins, ray_samples.spacing, ray_samples.s_near, ray_samples.s_far
    )


@flax.struct.dataclass
class ProposalSamplerCfg:
    num_proposal_samples: Tuple[int, ...] = flax.struct.field(pytree_node=False, default=(256,))
    num_nerf_samples: int = flax.struct.field(pytree_node=False, default=256)
    single_jitter: bool = flax.struct.field(pytree_node=False, default=False)
    initial_spacing: SpacingKind = flax.struct.field(pytree_node=False, default="uniform")
    # route PDF resampling through the fused K5 Pallas kernel
    use_pallas_pdf: bool = flax.struct.field(pytree_node=False, default=False)


def proposal_anneal(step: jax.Array, max_num_iters: int, slope: float) -> jax.Array:
    """Proposal weight anneal schedule (models/model.py:201-209; mip-NeRF 360
    eq. 18 bias)."""
    train_frac = jnp.clip(step / max_num_iters, 0.0, 1.0)
    return (slope * train_frac) / ((slope - 1.0) * train_frac + 1.0)


def proposal_sample(
    key: jax.Array,
    ray_bundle: RayBundle,
    density_fns: Sequence[Callable[[jax.Array], jax.Array]],
    cfg: ProposalSamplerCfg,
    anneal: jax.Array | float = 1.0,
    updated: jax.Array | bool = True,
    stratified: bool = True,
):
    """Hierarchical proposal sampling (ray_samplers.py:454-552).

    Args:
      density_fns: one callable per proposal level mapping world positions
        [B, R, S, 3] -> densities [B, R, S, 1].
      anneal: exponent on proposal weights before PDF resampling.
      updated: when False, proposal densities are evaluated under
        stop_gradient (the reference's `steps_since_update` gating,
        ray_samplers.py:536-544). A traced bool keeps one compiled graph
        (the grads are masked to zero); a STATIC Python bool lets XLA
        delete the proposal backward entirely on non-update steps.
    Returns (final RaySamples, weights_list, ray_samples_list).
    """
    n = len(density_fns)
    assert n == len(cfg.num_proposal_samples)

    weights_list = []
    ray_samples_list = []
    weights = None
    ray_samples = None

    keys = jax.random.split(key, n + 1)
    for i_level in range(n + 1):
        is_prop = i_level < n
        num_samples = cfg.num_proposal_samples[i_level] if is_prop else cfg.num_nerf_samples
        if i_level == 0:
            ray_samples = spaced_sample(
                keys[i_level], ray_bundle, num_samples,
                kind=cfg.initial_spacing, stratified=stratified,
                single_jitter=cfg.single_jitter,
            )
        else:
            annealed = weights ** anneal
            ray_samples = pdf_sample(
                keys[i_level], ray_bundle, ray_samples, annealed, num_samples,
                stratified=stratified, single_jitter=cfg.single_jitter,
                include_original=False, use_pallas=cfg.use_pallas_pdf,
            )
        if is_prop:
            density_live = density_fns[i_level](ray_samples.get_positions())
            if isinstance(updated, bool):
                # STATIC gating (the host-dispatched two-variant train step,
                # training/train.py): on a non-update step the stop_gradient
                # is structural, so XLA dead-code-eliminates the whole
                # proposal backward (K7 bwd + its tz/knot chains) instead of
                # multiplying it by zero — the reference gets this for free
                # from torch.no_grad (ray_samplers.py:536-544).
                density = (density_live if updated
                           else jax.lax.stop_gradient(density_live))
            else:
                density = jnp.where(updated, density_live,
                                    jax.lax.stop_gradient(density_live))
            weights = ray_samples.get_weights(density)
            weights_list.append(weights)
            ray_samples_list.append(ray_samples)

    return ray_samples, weights_list, ray_samples_list
