"""K1 pixel-gather tests: packed-row + one-hot gathers vs the naive bilinear
path, gradients of the custom VJPs, pyramid-vs-concat layout parity, and
interpret-mode parity for the Pallas kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_jacobian_field_tpu.ops import pixel_gather as pg
from neural_jacobian_field_tpu.ops.grid_sample import grid_sample_bilinear

B, N = 2, 513  # odd N exercises block padding


def _coords(key, h, w, n=N, spill=3.0):
    kx, ky = jax.random.split(key)
    fx = jax.random.uniform(kx, (B, n), minval=-spill, maxval=w - 1 + spill)
    fy = jax.random.uniform(ky, (B, n), minval=-spill, maxval=h - 1 + spill)
    return fx, fy


def _ref_bilerp(level, fx, fy):
    """Direct bilinear reference at pixel coords via grid_sample_bilinear."""
    h, w = level.shape[1:3]
    coords = jnp.stack(
        [jnp.clip(fx, 0, w - 1) / (w - 1) * 2 - 1,
         jnp.clip(fy, 0, h - 1) / (h - 1) * 2 - 1], axis=-1)
    return grid_sample_bilinear(level, coords)


def test_gather_packed_rows_matches_bilinear():
    key = jax.random.PRNGKey(0)
    level = jax.random.normal(key, (B, 17, 23, 8))
    fx, fy = _coords(jax.random.PRNGKey(1), 17, 23)
    packed = pg.pack_2x2(level).reshape(B, 17 * 23, 32)
    x0, y0, wx, wy = pg.bilinear_corners(fx, fy, 23, 17)
    out = pg.gather_packed_rows(packed, y0 * 23 + x0, pg._corner_weights(wx, wy))
    np.testing.assert_allclose(out, _ref_bilerp(level, fx, fy), rtol=1e-5, atol=1e-5)


def test_gather_onehot_matches_bilinear():
    key = jax.random.PRNGKey(0)
    level = jax.random.normal(key, (B, 11, 13, 8))
    fx, fy = _coords(jax.random.PRNGKey(1), 11, 13)
    out = pg.gather_bilinear_onehot(level, fx, fy)
    np.testing.assert_allclose(out, _ref_bilerp(level, fx, fy), rtol=1e-5, atol=1e-5)


def test_packed_rows_grad_matches_autodiff():
    key = jax.random.PRNGKey(0)
    level = jax.random.normal(key, (B, 9, 12, 4))
    fx, fy = _coords(jax.random.PRNGKey(1), 9, 12, n=65)
    g_out = jax.random.normal(jax.random.PRNGKey(2), (B, 65, 4))

    def fast(level):
        packed = pg.pack_2x2(level).reshape(B, 9 * 12, 16)
        x0, y0, wx, wy = pg.bilinear_corners(fx, fy, 12, 9)
        out = pg.gather_packed_rows(packed, y0 * 12 + x0, pg._corner_weights(wx, wy))
        return jnp.sum(out * g_out)

    def ref(level):
        return jnp.sum(_ref_bilerp(level, fx, fy) * g_out)

    np.testing.assert_allclose(jax.grad(fast)(level), jax.grad(ref)(level),
                               rtol=1e-4, atol=1e-5)


def test_onehot_grad_matches_autodiff():
    key = jax.random.PRNGKey(0)
    level = jax.random.normal(key, (B, 9, 12, 4))
    fx, fy = _coords(jax.random.PRNGKey(1), 9, 12, n=65)
    g_out = jax.random.normal(jax.random.PRNGKey(2), (B, 65, 4))

    def fast(level):
        return jnp.sum(pg.gather_bilinear_onehot(level, fx, fy) * g_out)

    def ref(level):
        return jnp.sum(_ref_bilerp(level, fx, fy) * g_out)

    np.testing.assert_allclose(jax.grad(fast)(level), jax.grad(ref)(level),
                               rtol=1e-4, atol=1e-5)


def _bilinear_surface(key, b, h, w, c):
    """Globally-bilinear per-channel maps: a + b*x + c*y + d*x*y. For these,
    bilinear upsampling then bilinear sampling is EXACT, so the pyramid and
    concat layouts must agree to float tolerance."""
    coef = jax.random.normal(key, (4, 1, 1, 1, c))
    ys = jnp.arange(h).reshape(1, h, 1, 1) / h
    xs = jnp.arange(w).reshape(1, 1, w, 1) / w
    return (coef[0] + coef[1] * xs + coef[2] * ys + coef[3] * xs * ys
            ) * jnp.ones((b, 1, 1, 1))


def test_pyramid_exact_on_bilinear_surfaces():
    hf, wf = 32, 48
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    conv1 = _bilinear_surface(keys[0], B, hf, wf, 3)
    layer1 = _bilinear_surface(keys[1], B, hf // 2, wf // 2, 3)
    layer2 = _bilinear_surface(keys[2], B, hf // 4, wf // 4, 5)
    layer3 = _bilinear_surface(keys[3], B, hf // 8, wf // 8, 7)

    def up(lat):
        return jax.image.resize(lat, (B, hf, wf, lat.shape[-1]), method="linear")

    concat = jnp.concatenate([conv1, up(layer1), up(layer2), up(layer3)], axis=-1)
    pyr = pg.pack_pyramid(pg.FeaturePyramid(
        fine=jnp.concatenate([conv1, up(layer1)], axis=-1),
        mid=layer2, coarse=layer3))

    # interior coords only: in the outer s/2-pixel band the align_corners=
    # False upsample clamps source coords (flattens the surface) while native
    # sampling clamps the query — a bounded, documented edge deviation.
    kx, ky = jax.random.split(jax.random.PRNGKey(9))
    fx = jax.random.uniform(kx, (B, N), minval=8.0, maxval=wf - 9.0)
    fy = jax.random.uniform(ky, (B, N), minval=8.0, maxval=hf - 9.0)
    out_pyr = pg.pyramid_pixel_features(pyr, fx, fy)
    out_cat = _ref_bilerp(concat, fx, fy)
    np.testing.assert_allclose(out_pyr, out_cat, rtol=1e-4, atol=1e-5)


def test_pyramid_close_on_smooth_maps():
    """On generic smooth maps the native-resolution sampling is a
    knot-refinement of upsample-then-sample: bounded, small deviation."""
    hf, wf = 32, 48

    def smooth(key, h, w, c):
        x = jax.random.normal(key, (B, h, w, c))
        k = jnp.ones((5, 5, 1, 1)) / 25.0
        return jax.lax.conv_general_dilated(
            x, jnp.tile(k, (1, 1, 1, 1)), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=1,
        ) if c == 1 else jax.vmap(
            lambda xc: jax.lax.conv_general_dilated(
                xc[..., None], k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )[..., 0], in_axes=-1, out_axes=-1)(x)

    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    conv1 = smooth(keys[0], hf, wf, 3)
    layer1 = smooth(keys[1], hf // 2, wf // 2, 3)
    layer2 = smooth(keys[2], hf // 4, wf // 4, 5)
    layer3 = smooth(keys[3], hf // 8, wf // 8, 7)

    def up(lat):
        return jax.image.resize(lat, (B, hf, wf, lat.shape[-1]), method="linear")

    concat = jnp.concatenate([conv1, up(layer1), up(layer2), up(layer3)], axis=-1)
    pyr = pg.pack_pyramid(pg.FeaturePyramid(
        fine=jnp.concatenate([conv1, up(layer1)], axis=-1),
        mid=layer2, coarse=layer3))

    fx, fy = _coords(jax.random.PRNGKey(9), hf, wf, spill=0.0)
    out_pyr = pg.pyramid_pixel_features(pyr, fx, fy)
    out_cat = _ref_bilerp(concat, fx, fy)
    # fine channels are exact; mid/coarse deviate only between fine knots
    np.testing.assert_allclose(out_pyr[..., :6], out_cat[..., :6], atol=1e-5)
    assert jnp.max(jnp.abs(out_pyr - out_cat)) < 0.08
    assert jnp.mean(jnp.abs(out_pyr - out_cat)) < 0.01


def test_pallas_kernels_interpret_parity():
    key = jax.random.PRNGKey(0)
    k_real, c = 30 * 40, 16
    flat = jax.random.normal(key, (B, k_real, c), jnp.float32)
    base = jax.random.randint(jax.random.PRNGKey(1), (B, N), 0, k_real - 41)
    idx = jnp.stack([base, base + 1, base + 40, base + 41], axis=-1)
    w4 = jax.random.uniform(jax.random.PRNGKey(2), (B, N, 4))

    from neural_jacobian_field_tpu.ops.pallas.onehot_gather import (
        onehot_gather_fwd_pallas, onehot_scatter_bwd_pallas)

    out_k = onehot_gather_fwd_pallas(flat, idx, w4, interpret=True)
    out_x = pg._onehot_gather_xla(flat, idx, w4)
    np.testing.assert_allclose(out_k, out_x, rtol=1e-5, atol=1e-5)

    g = jax.random.normal(jax.random.PRNGKey(3), (B, N, c), jnp.float32)
    gk = onehot_scatter_bwd_pallas(g, idx, w4, k_real, interpret=True)
    gx = pg._onehot_scatter_xla(g, idx, w4, k_real)
    np.testing.assert_allclose(gk, gx, rtol=1e-5, atol=1e-4)


def test_encoder_pyramid_layout_matches_concat_channels():
    """The pyramid layout's channel ORDER must equal the concat layout's
    (weight-port compatibility for trunk lin_z kernels)."""
    from neural_jacobian_field_tpu.models.encoder_resnet import (
        EncoderResnet, EncoderResnetCfg)

    rgb = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    enc_c = EncoderResnet(cfg=EncoderResnetCfg(feature_layout="concat"))
    enc_p = EncoderResnet(cfg=EncoderResnetCfg(feature_layout="pyramid"))
    vars_c = enc_c.init(jax.random.PRNGKey(1), rgb)
    concat = enc_c.apply(vars_c, rgb)
    pyr = enc_p.apply(vars_c, rgb)  # identical params by construction

    assert pyr.fine.shape == (1, 32, 32, 128)
    assert pyr.mid.shape == (1, 8, 8, 128)
    assert pyr.coarse.shape == (1, 4, 4, 256)
    np.testing.assert_allclose(pyr.fine, concat[..., :128], atol=1e-5)

    def up(lat):
        return jax.image.resize(lat, (1, 32, 32, lat.shape[-1]), method="linear")

    np.testing.assert_allclose(up(pyr.mid), concat[..., 128:256], atol=1e-5)
    np.testing.assert_allclose(up(pyr.coarse), concat[..., 256:], atol=1e-5)


def test_model_forward_pyramid_vs_concat_close():
    """End-to-end model forward with identical params under both layouts."""
    from neural_jacobian_field_tpu.models.encoder_resnet import EncoderResnetCfg
    from neural_jacobian_field_tpu.models.model import (
        Model, RenderingCfg, StepCtx, make_model_cfg)
    from neural_jacobian_field_tpu.training.prepare import (
        RawBatch, prepare_training_batch)

    key = jax.random.PRNGKey(0)
    b, h, w = 2, 48, 64
    c2w = jnp.broadcast_to(jnp.eye(4), (b, 4, 4))
    intr = jnp.broadcast_to(
        jnp.array([[1.2, 0, 0.5], [0, 1.6, 0.5], [0, 0, 1.0]]), (b, 3, 3))
    raw = RawBatch(
        ctxt_rgb=jax.random.uniform(key, (b, h, w, 3)),
        ctxt_extrinsics=c2w, ctxt_intrinsics=intr,
        robot_action=jnp.zeros((b, 4)),
        trgt_rgb=jax.random.uniform(key, (b, h, w, 3)),
        trgt_depth=jnp.ones((b, h, w, 1)),
        trgt_extrinsics=c2w, trgt_intrinsics=intr,
        near=jnp.full((b,), 0.5), far=jnp.full((b,), 4.0))
    mi, _ = prepare_training_batch(jax.random.PRNGKey(1), raw, rays_per_batch=32)

    def build(layout):
        return Model(cfg=make_model_cfg(
            "jacobian_mlp", action_dim=4,
            rendering=RenderingCfg(num_proposal_samples=(16,), num_nerf_samples=16),
            encoder=EncoderResnetCfg(feature_layout=layout)))

    ctx = StepCtx(key=jax.random.PRNGKey(2), anneal=jnp.asarray(1.0),
                  updated=jnp.asarray(True))
    m_c, m_p = build("concat"), build("pyramid")
    vars_c = m_c.init(jax.random.PRNGKey(3), mi, ctx)
    out_c = m_c.apply(vars_c, mi, ctx)
    out_p = m_p.apply(vars_c, mi, ctx)  # same params
    # at this deliberately tiny image the coarse map is 3x4, so the edge-band
    # deviation covers much of the image and compositing amplifies it; the op-
    # level tests above pin down exactness — here we check the wiring agrees
    # statistically and shapes/finiteness hold.
    assert jnp.all(jnp.isfinite(out_p.rgb)) and jnp.all(jnp.isfinite(out_p.depth))
    assert float(jnp.mean(jnp.abs(out_p.rgb - out_c.rgb))) < 2e-2
    assert float(jnp.max(jnp.abs(out_p.rgb - out_c.rgb))) < 0.25
    assert float(jnp.mean(jnp.abs(out_p.depth - out_c.depth))) < 0.1
