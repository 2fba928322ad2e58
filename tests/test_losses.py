"""Property / golden tests for rendering losses."""

import jax
import jax.numpy as jnp
import numpy as np

from neural_jacobian_field_tpu.ops.losses import (
    distortion_loss,
    ds_nerf_depth_loss,
    interlevel_loss,
    lossfun_distortion,
    masked_mse,
    outer_measure,
)


class TestDistortion:
    def _pairwise(self, t, w):
        m = (t[..., 1:] + t[..., :-1]) / 2
        dut = np.abs(m[..., :, None] - m[..., None, :])
        inter = np.sum(w * np.sum(w[..., None, :] * dut, -1), -1)
        intra = np.sum(w**2 * (t[..., 1:] - t[..., :-1]), -1) / 3
        return inter + intra

    def test_cumsum_form_matches_pairwise(self):
        rng = np.random.default_rng(0)
        t = np.sort(rng.uniform(0, 1, size=(4, 6, 33)), -1).astype(np.float32)
        w = rng.uniform(0, 0.2, size=(4, 6, 32)).astype(np.float32)
        got = lossfun_distortion(jnp.asarray(t), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(got), self._pairwise(t, w), rtol=2e-4, atol=1e-6)

    def test_zero_for_delta_mass(self):
        # all mass in one infinitesimal bin -> ~zero distortion
        t = jnp.broadcast_to(jnp.linspace(0, 1, 101), (1, 101))
        w = jnp.zeros((1, 100)).at[..., 50].set(1.0)
        loss = lossfun_distortion(t, w)
        assert float(loss[0]) < 0.005


class TestInterlevel:
    def test_outer_measure_self_cover(self):
        t = jnp.broadcast_to(jnp.linspace(0, 1, 17), (2, 17))
        w = jax.random.uniform(jax.random.key(0), (2, 16))
        cover = outer_measure(t, t, w)
        assert (np.asarray(cover) >= np.asarray(w) - 1e-6).all()

    def test_zero_when_proposal_matches_final(self):
        t = jnp.broadcast_to(jnp.linspace(0, 1, 17), (2, 3, 17))
        w = jax.random.uniform(jax.random.key(1), (2, 3, 16, 1))
        loss = interlevel_loss([t, t], [w, w])
        np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)

    def test_positive_when_final_outside_envelope(self):
        t_final = jnp.broadcast_to(jnp.linspace(0, 1, 17), (1, 17))
        w_final = jnp.zeros((1, 16, 1)).at[:, 8].set(1.0)
        t_prop = t_final
        w_prop = jnp.zeros((1, 16, 1)).at[:, 0].set(1.0)  # envelope misses the peak
        loss = interlevel_loss([t_prop, t_final], [w_prop, w_final])
        assert float(loss) > 0.01


class TestDepthLoss:
    def test_penalizes_wrong_depth_more(self):
        S = 32
        steps = jnp.linspace(0.1, 2.0, S).reshape(1, 1, S, 1)
        lengths = jnp.full((1, 1, S, 1), (2.0 - 0.1) / S)
        target = jnp.array([[[1.0]]])
        sigma = jnp.array([0.001])

        w_right = jax.nn.softmax(-((steps - 1.0) ** 2) / 0.001, axis=-2)
        w_wrong = jax.nn.softmax(-((steps - 0.3) ** 2) / 0.001, axis=-2)
        l_right = ds_nerf_depth_loss(w_right, target, steps, lengths, sigma)
        l_wrong = ds_nerf_depth_loss(w_wrong, target, steps, lengths, sigma)
        assert float(l_right) < float(l_wrong)

    def test_masked_rays_ignored(self):
        S = 8
        steps = jnp.linspace(0.1, 2.0, S).reshape(1, 1, S, 1)
        lengths = jnp.ones((1, 1, S, 1)) * 0.1
        w = jnp.ones((1, 1, S, 1)) / S
        loss = ds_nerf_depth_loss(w, jnp.array([[[0.0]]]), steps, lengths, jnp.array([0.001]))
        np.testing.assert_allclose(float(loss), 0.0, atol=1e-7)


class TestMaskedMSE:
    def test_unmasked_is_mean(self):
        p = jnp.ones((2, 4, 2))
        t = jnp.zeros((2, 4, 2))
        np.testing.assert_allclose(float(masked_mse(p, t)), 1.0)

    def test_mask_normalization_matches_reference(self):
        # reference: (err * mask[..., None]).sum() / mask.sum()
        rng = np.random.default_rng(2)
        p = rng.normal(size=(2, 4, 2)).astype(np.float32)
        t = rng.normal(size=(2, 4, 2)).astype(np.float32)
        mask = (rng.uniform(size=(2, 4)) > 0.5).astype(np.float32)
        want = ((p - t) ** 2 * mask[..., None]).sum() / mask.sum()
        got = masked_mse(jnp.asarray(p), jnp.asarray(t), jnp.asarray(mask))
        np.testing.assert_allclose(float(got), want, rtol=1e-5)
