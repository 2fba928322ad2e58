"""Tests for ray samplers (stratified, PDF, proposal)."""

import jax
import jax.numpy as jnp
import numpy as np

from neural_jacobian_field_tpu.rendering.samplers import (
    ProposalSamplerCfg,
    RayBundle,
    pdf_sample,
    proposal_anneal,
    proposal_sample,
    sdist_edges,
    spaced_sample,
)


def _bundle(B=2, R=4, near=0.5, far=10.0):
    key = jax.random.key(0)
    dirs = jax.random.normal(key, (B, R, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return RayBundle(
        origins=jnp.zeros((B, R, 3)),
        directions=dirs,
        nears=jnp.full((B, R, 1), near),
        fars=jnp.full((B, R, 1), far),
    )


class TestSpacedSampler:
    def test_deterministic_uniform(self):
        rb = _bundle()
        rs = spaced_sample(jax.random.key(0), rb, 8, stratified=False)
        assert rs.starts.shape == (2, 4, 8, 1)
        np.testing.assert_allclose(float(rs.starts[0, 0, 0, 0]), 0.5, rtol=1e-6)
        np.testing.assert_allclose(float(rs.ends[0, 0, -1, 0]), 10.0, rtol=1e-6)
        # uniform spacing in euclidean space
        d = np.asarray(rs.deltas)[0, 0, :, 0]
        np.testing.assert_allclose(d, (10.0 - 0.5) / 8, rtol=1e-5)

    def test_stratified_within_bins(self):
        rb = _bundle()
        rs = spaced_sample(jax.random.key(1), rb, 16, stratified=True)
        s = np.asarray(rs.spacing_starts)[..., 0]
        assert (np.diff(np.asarray(sdist_edges(rs)), axis=-1) >= 0).all()
        assert s.min() >= 0 and np.asarray(rs.spacing_ends).max() <= 1 + 1e-6

    def test_positions_on_ray(self):
        rb = _bundle()
        rs = spaced_sample(jax.random.key(2), rb, 8, stratified=False)
        pos = rs.get_positions()
        # positions = origin + t * dir  ->  (pos - origin) x dir == 0
        rel = np.asarray(pos - rb.origins[..., None, :])
        d = np.asarray(rb.directions[..., None, :])
        cross = np.cross(rel, np.broadcast_to(d, rel.shape))
        np.testing.assert_allclose(cross, 0.0, atol=1e-4)

    def test_lin_disp_spacing(self):
        rb = _bundle(near=1.0, far=100.0)
        rs = spaced_sample(jax.random.key(0), rb, 4, kind="lin_disp", stratified=False)
        # linear in disparity: 1/t uniformly spaced
        t_edges = np.asarray(
            jnp.concatenate([rs.starts[..., 0], rs.ends[..., -1:, 0]], axis=-1)
        )[0, 0]
        disp = 1.0 / t_edges
        np.testing.assert_allclose(np.diff(disp), np.diff(disp)[0], rtol=1e-4)


class TestPDFSampleIntegration:
    def test_resample_peak(self):
        rb = _bundle(B=1, R=1, near=0.0 + 1e-3, far=1.0)
        rs = spaced_sample(jax.random.key(0), rb, 64, stratified=False)
        dens = jnp.zeros((1, 1, 64, 1)).at[:, :, 32].set(500.0)
        w = rs.get_weights(dens)
        rs2 = pdf_sample(jax.random.key(1), rb, rs, w, 32, stratified=False)
        mids = np.asarray((rs2.starts + rs2.ends) / 2)[0, 0, :, 0]
        frac_near_peak = ((mids > 0.45) & (mids < 0.58)).mean()
        assert frac_near_peak > 0.6


class TestProposalSampler:
    def test_shapes_and_levels(self):
        rb = _bundle()
        cfg = ProposalSamplerCfg(num_proposal_samples=(32, 16), num_nerf_samples=8)
        fns = [
            lambda xyz: jnp.ones((*xyz.shape[:-1], 1)),
            lambda xyz: jnp.ones((*xyz.shape[:-1], 1)),
        ]
        rs, w_list, rs_list = proposal_sample(
            jax.random.key(0), rb, fns, cfg, stratified=True
        )
        assert rs.starts.shape == (2, 4, 8, 1)
        assert len(w_list) == 2 and len(rs_list) == 2
        assert w_list[0].shape == (2, 4, 32, 1)
        assert w_list[1].shape == (2, 4, 16, 1)

    def test_updated_gates_gradients(self):
        rb = _bundle(B=1, R=2)
        cfg = ProposalSamplerCfg(num_proposal_samples=(8,), num_nerf_samples=4)

        def loss_fn(scale, updated):
            fns = [lambda xyz: scale * jnp.ones((*xyz.shape[:-1], 1))]
            _, w_list, _ = proposal_sample(
                jax.random.key(0), rb, fns, cfg,
                updated=updated, stratified=False,
            )
            return jnp.sum(w_list[0])

        g_on = jax.grad(loss_fn)(1.0, True)
        g_off = jax.grad(loss_fn)(1.0, False)
        assert abs(float(g_on)) > 1e-6
        np.testing.assert_allclose(float(g_off), 0.0, atol=1e-9)

    def test_anneal_schedule(self):
        np.testing.assert_allclose(float(proposal_anneal(jnp.array(0), 1000, 10.0)), 0.0)
        np.testing.assert_allclose(float(proposal_anneal(jnp.array(1000), 1000, 10.0)), 1.0)
        mid = float(proposal_anneal(jnp.array(500), 1000, 10.0))
        assert 0.5 < mid < 1.0  # biased toward 1

    def test_jit_compiles_whole_sampler(self):
        rb = _bundle()
        cfg = ProposalSamplerCfg(num_proposal_samples=(16,), num_nerf_samples=8)

        @jax.jit
        def run(key, anneal, updated):
            fns = [lambda xyz: jnp.ones((*xyz.shape[:-1], 1))]
            rs, w, _ = proposal_sample(key, rb, fns, cfg, anneal=anneal, updated=updated)
            return rs.get_positions(), w[0]

        pos, w = run(jax.random.key(0), jnp.array(0.5), jnp.array(True))
        assert pos.shape == (2, 4, 8, 3)
