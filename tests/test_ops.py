"""Unit + golden tests for core ops (vs closed forms and torch CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_jacobian_field_tpu.ops import (
    composite,
    grid_sample_bilinear,
    nerf_positional_encoding,
    render_depth,
    render_weights,
    sample_pdf,
    sh_encoding_deg4,
    trunc_exp,
    density_activation,
)
from neural_jacobian_field_tpu.ops.pdf import searchsorted_right


class TestTruncExp:
    def test_forward_is_exp(self):
        x = jnp.array([-2.0, 0.0, 3.0])
        np.testing.assert_allclose(trunc_exp(x), np.exp(np.array([-2.0, 0.0, 3.0], dtype=np.float32)), rtol=1e-5)

    def test_grad_clamped(self):
        g = jax.grad(lambda x: trunc_exp(x))(20.0)
        assert np.isfinite(g)
        np.testing.assert_allclose(g, np.exp(np.float32(15.0)), rtol=1e-5)

    def test_density_activation_shift(self):
        act = density_activation("trunc_exp")
        np.testing.assert_allclose(act(jnp.array(1.0)), 1.0, rtol=1e-6)


class TestNerfEncoding:
    def test_dim(self):
        x = jnp.zeros((4, 3))
        out = nerf_positional_encoding(x, num_frequencies=10, max_freq_exp=9.0)
        assert out.shape == (4, 63)

    def test_matches_torch_nerfstudio_formula(self):
        # reproduce nerfstudio's NeRFEncoding math in numpy
        rng = np.random.default_rng(0)
        x = rng.uniform(-1, 1, size=(7, 3)).astype(np.float32)
        F = 10
        freqs = 2.0 ** np.linspace(0, F - 1, F)
        scaled = 2 * np.pi * x[..., None] * freqs  # [7,3,F]
        scaled = scaled.reshape(7, -1)
        expected = np.concatenate(
            [np.sin(np.concatenate([scaled, scaled + np.pi / 2], -1)), x], axis=-1
        )
        got = nerf_positional_encoding(jnp.asarray(x), F, 0.0, F - 1.0)
        np.testing.assert_allclose(got, expected, atol=2e-4)


class TestSHEncoding:
    def test_shape_and_l0(self):
        d = jnp.array([[0.3, 0.8, 0.5]])  # in [0,1]
        out = sh_encoding_deg4(d)
        assert out.shape == (1, 16)
        np.testing.assert_allclose(out[0, 0], 0.28209479, rtol=1e-5)

    def test_l1_terms(self):
        # direction (0,0,1): only z-linear terms survive among l1
        d01 = (jnp.array([[0.0, 0.0, 1.0]]) + 1) / 2
        out = np.asarray(sh_encoding_deg4(d01))
        np.testing.assert_allclose(out[0, 1], 0.0, atol=1e-6)  # -c*y
        np.testing.assert_allclose(out[0, 2], 0.4886025, rtol=1e-5)  # c*z
        np.testing.assert_allclose(out[0, 3], 0.0, atol=1e-6)  # -c*x

    def test_rotation_invariant_norm_per_level(self):
        # per-level energy is rotation invariant for unit directions
        rng = np.random.default_rng(1)
        v = rng.normal(size=(64, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        out = np.asarray(sh_encoding_deg4(jnp.asarray((v + 1) / 2, dtype=jnp.float32)))
        for sl in [slice(1, 4), slice(4, 9), slice(9, 16)]:
            e = (out[:, sl] ** 2).sum(-1)
            np.testing.assert_allclose(e, e[0] * np.ones_like(e), rtol=1e-4)


class TestGridSample:
    def test_matches_torch(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        rng = np.random.default_rng(2)
        feats = rng.normal(size=(2, 5, 7, 4)).astype(np.float32)  # NHWC
        coords = rng.uniform(-1.3, 1.3, size=(2, 11, 2)).astype(np.float32)

        got = grid_sample_bilinear(jnp.asarray(feats), jnp.asarray(coords))

        t_feats = torch.from_numpy(feats).permute(0, 3, 1, 2)  # NCHW
        t_grid = torch.from_numpy(coords)[:, :, None, :]  # B,N,1,2
        want = F.grid_sample(
            t_feats, t_grid, align_corners=True, padding_mode="border", mode="bilinear"
        )  # B,C,N,1
        want = want.squeeze(-1).permute(0, 2, 1).numpy()
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_exact_at_pixel_centers(self):
        feats = jnp.arange(12, dtype=jnp.float32).reshape(1, 3, 4, 1)
        # align_corners=True: x=-1 -> col 0, x=+1 -> col 3
        coords = jnp.array([[[-1.0, -1.0], [1.0, 1.0]]])
        out = grid_sample_bilinear(feats, coords)
        np.testing.assert_allclose(out[0, :, 0], [0.0, 11.0], atol=1e-6)


class TestCompositing:
    def _brute_force_weights(self, dens, deltas):
        dd = np.where(deltas > 0, dens * deltas, 0.0)
        S = dens.shape[-2]
        w = np.zeros_like(dd)
        for i in range(S):
            T = np.exp(-dd[..., :i, :].sum(-2))
            w[..., i, :] = (1 - np.exp(-dd[..., i, :])) * T
        return w

    def test_weights_match_brute_force(self):
        rng = np.random.default_rng(3)
        dens = rng.uniform(0, 3, size=(2, 4, 16, 1)).astype(np.float32)
        deltas = rng.uniform(0, 0.1, size=(2, 4, 16, 1)).astype(np.float32)
        deltas[0, 0, 3] = 0.0  # zero-width bin must contribute nothing
        got = render_weights(jnp.asarray(dens), jnp.asarray(deltas))
        want = self._brute_force_weights(dens, deltas)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
        assert np.asarray(got)[0, 0, 3, 0] == 0.0

    def test_weights_sum_to_one_for_opaque(self):
        dens = jnp.full((1, 1, 64, 1), 1e4)
        deltas = jnp.full((1, 1, 64, 1), 0.1)
        w = render_weights(dens, deltas)
        np.testing.assert_allclose(jnp.sum(w), 1.0, rtol=1e-5)

    def test_composite_and_depth(self):
        w = jnp.array([[[[0.5], [0.5]]]])
        vals = jnp.array([[[[1.0, 0.0], [0.0, 1.0]]]])
        np.testing.assert_allclose(composite(w, vals)[0, 0], [0.5, 0.5])
        steps = jnp.array([[[[1.0], [3.0]]]])
        np.testing.assert_allclose(render_depth(w, steps)[0, 0, 0], 2.0, rtol=1e-5)

    def test_composite_background(self):
        w = jnp.zeros((1, 1, 4, 1))
        vals = jnp.ones((1, 1, 4, 3))
        bg = jnp.array([0.25, 0.5, 0.75])
        np.testing.assert_allclose(composite(w, vals, bg)[0, 0], bg, rtol=1e-6)


class TestSearchSorted:
    def test_matches_numpy(self):
        rng = np.random.default_rng(4)
        a = np.sort(rng.uniform(0, 1, size=(3, 9)), axis=-1).astype(np.float32)
        v = rng.uniform(0, 1, size=(3, 5)).astype(np.float32)
        got = searchsorted_right(jnp.asarray(a), jnp.asarray(v))
        want = np.stack([np.searchsorted(a[i], v[i], side="right") for i in range(3)])
        np.testing.assert_array_equal(np.asarray(got), want)


class TestSamplePDF:
    def test_uniform_weights_give_uniform_bins(self):
        key = jax.random.key(0)
        edges = jnp.broadcast_to(jnp.linspace(0, 1, 9), (2, 3, 9))
        weights = jnp.ones((2, 3, 8))
        out = sample_pdf(key, edges, weights, num_samples=16, stratified=False)
        assert out.shape == (2, 3, 17)
        # deterministic midpoints of a uniform cdf -> nearly uniform spacing
        d = np.diff(np.asarray(out), axis=-1)
        np.testing.assert_allclose(d, d.mean(), atol=1e-3)

    def test_concentrates_on_peak(self):
        key = jax.random.key(1)
        edges = jnp.broadcast_to(jnp.linspace(0, 1, 65), (1, 1, 65))
        weights = jnp.zeros((1, 1, 64)).at[..., 32].set(100.0)
        out = np.asarray(sample_pdf(key, edges, weights, num_samples=32, stratified=False))
        in_peak = ((out >= 0.5) & (out <= 0.52)).mean()
        assert in_peak > 0.8

    def test_monotone_and_bounded(self):
        key = jax.random.key(2)
        edges = jnp.broadcast_to(jnp.linspace(0, 1, 33), (4, 8, 33))
        weights = jax.random.uniform(key, (4, 8, 32))
        out = np.asarray(sample_pdf(key, edges, weights, num_samples=32, stratified=True))
        assert (np.diff(out, axis=-1) >= -1e-6).all()
        assert out.min() >= -1e-6 and out.max() <= 1 + 1e-6

    def test_matches_torch_reference_math(self):
        """Golden test vs the reference PDFSampler math (ray_samplers.py:326-451),
        deterministic path, re-derived in numpy."""
        rng = np.random.default_rng(5)
        S, N = 16, 8
        edges = np.sort(rng.uniform(0, 1, size=(2, S + 1)), -1).astype(np.float32)
        edges[..., 0], edges[..., -1] = 0.0, 1.0
        weights = rng.uniform(0, 1, size=(2, S)).astype(np.float32)

        # numpy re-derivation
        num_bins = N + 1
        w = weights + 0.01
        wsum = w.sum(-1, keepdims=True)
        pad = np.maximum(1e-5 - wsum, 0)
        w = w + pad / S
        wsum = wsum + pad
        pdf = w / wsum
        cdf = np.minimum(1, np.cumsum(pdf, -1))
        cdf = np.concatenate([np.zeros_like(cdf[..., :1]), cdf], -1)
        u = np.linspace(0, 1 - 1 / num_bins, num_bins) + 0.5 / num_bins
        u = np.broadcast_to(u, (2, num_bins))
        inds = np.stack([np.searchsorted(cdf[i], u[i], side="right") for i in range(2)])
        below = np.clip(inds - 1, 0, S)
        above = np.clip(inds, 0, S)
        cdf0 = np.take_along_axis(cdf, below, -1)
        cdf1 = np.take_along_axis(cdf, above, -1)
        b0 = np.take_along_axis(edges, below, -1)
        b1 = np.take_along_axis(edges, above, -1)
        t = np.clip(np.nan_to_num((u - cdf0) / (cdf1 - cdf0)), 0, 1)
        want = b0 + t * (b1 - b0)

        got = sample_pdf(
            jax.random.key(0), jnp.asarray(edges), jnp.asarray(weights),
            num_samples=N, stratified=False,
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
