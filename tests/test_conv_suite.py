"""K9 conv-suite parity (interpret mode on CPU): forward AND both grads of
every variant against XLA's `lax.conv_general_dilated` autodiff.

Shapes are scaled-down instances of the encoder's real family
(reference models/encoder/encoder_resnet.py:15-89): stride-1 blocks at all
three stage channel widths, the two stride-2 stage-entry convs, and the 1x1
downsample projections."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_jacobian_field_tpu.ops.pallas.conv_suite import (
    conv1x1, conv3x3, conv3x3_supported,
)


def _xla_conv(x, w, stride):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((1, 1), (1, 1)) if w.shape[0] == 3 else ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _check_fwd_and_grads(x, w, stride, op, tol=1e-4):
    got = op(x, w, stride)
    want = _xla_conv(x, w, stride)
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)

    cot = jax.random.normal(jax.random.PRNGKey(7), want.shape, want.dtype)

    def loss(fn):
        return lambda x_, w_: jnp.sum(fn(x_, w_) * cot)

    dx_got, dw_got = jax.grad(loss(lambda a, b: op(a, b, stride)),
                              argnums=(0, 1))(x, w)
    dx_want, dw_want = jax.grad(loss(lambda a, b: _xla_conv(a, b, stride)),
                                argnums=(0, 1))(x, w)
    np.testing.assert_allclose(dx_got, dx_want, rtol=tol, atol=tol)
    np.testing.assert_allclose(dw_got, dw_want, rtol=tol, atol=tol)


@pytest.mark.parametrize("shape,cout,stride", [
    ((2, 20, 16, 8), 8, 1),     # layer1-family (equal in/out ch)
    ((2, 10, 8, 16), 16, 1),    # layer2/3-family
    ((2, 20, 16, 8), 16, 2),    # stage-entry stride-2 (ch doubling)
    ((2, 12, 10, 8), 8, 2),     # stride-2, non-multiple-of-10 rows
])
def test_conv3x3_matches_xla(shape, cout, stride):
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, shape, jnp.float32)
    w = jax.random.normal(kw, (3, 3, shape[-1], cout), jnp.float32) * 0.1
    assert conv3x3_supported(shape, cout, stride, dtype=jnp.float32)
    _check_fwd_and_grads(x, w, stride, conv3x3)


@pytest.mark.parametrize("stride", [1, 2])
def test_conv1x1_matches_xla(stride):
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (2, 12, 10, 8), jnp.float32)
    w = jax.random.normal(kw, (1, 1, 8, 16), jnp.float32) * 0.1
    _check_fwd_and_grads(x, w, stride, conv1x1)


def test_supported_predicate():
    # the three production stage shapes (b7, 480x640 input)
    assert conv3x3_supported((7, 120, 160, 64), 64, 1)
    assert conv3x3_supported((7, 120, 160, 64), 128, 2)
    assert conv3x3_supported((7, 60, 80, 128), 128, 1)
    assert conv3x3_supported((7, 60, 80, 128), 256, 2)
    assert conv3x3_supported((7, 30, 40, 256), 256, 1)
    # rejects: odd spatial dims at stride 2, prime row counts, VMEM blowups
    assert not conv3x3_supported((7, 31, 40, 256), 256, 2)
    assert not conv3x3_supported((7, 17, 40, 256), 256, 1)
    assert not conv3x3_supported((1, 480, 640, 512), 512, 1)
    assert not conv3x3_supported((7, 30, 40), 256, 1)


def test_encoder_conv_impl_interchangeable():
    """conv_impl="pallas" must be a drop-in: identical param tree, matching
    forward (and grads through the full encoder) vs conv_impl="xla" on the
    SAME params — so checkpoints move freely between impls."""
    from neural_jacobian_field_tpu.models.encoder_resnet import (
        EncoderResnet, EncoderResnetCfg,
    )

    rgb = jax.random.normal(jax.random.PRNGKey(3), (1, 80, 64, 3), jnp.float32)
    kwargs = dict(norm_type="group", feature_layout="concat")
    enc_x = EncoderResnet(EncoderResnetCfg(conv_impl="xla", **kwargs))
    enc_p = EncoderResnet(EncoderResnetCfg(conv_impl="pallas", **kwargs))
    params = enc_x.init(jax.random.PRNGKey(4), rgb)
    params_p = enc_p.init(jax.random.PRNGKey(4), rgb)
    assert jax.tree.structure(params) == jax.tree.structure(params_p)

    out_x, out_p = enc_x.apply(params, rgb), enc_p.apply(params, rgb)
    np.testing.assert_allclose(out_p, out_x, rtol=2e-4, atol=2e-4)

    # Gradient parity is checked in FLOAT64: in f32 the ~1e-7 forward
    # rounding difference between the impls can flip a near-zero ReLU
    # pre-activation, and one flipped mask element perturbs every leaf's
    # gradient by ~1e-3 (measured: at some input seeds plain XLA-f32
    # disagrees with XLA-f64 by the same 2e-3 — it's conditioning of the
    # network, not impl error; per-op f32 accuracy of the suite matches
    # XLA's at ~1e-7, see the probes in the r5 RESULTS entry). In f64 no
    # mask can flip, so a tight bound is a STRONGER structural check: any
    # wrong tap/phase/rotation would be O(1).
    with jax.enable_x64():
        params64 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), params)
        rgb64 = jnp.asarray(rgb, jnp.float64)

        def loss64(fn):
            return lambda p: jnp.mean(fn.apply(p, rgb64) ** 2)

        gx = jax.tree.map(np.asarray, jax.grad(loss64(enc_x))(params64))
        gp = jax.tree.map(np.asarray, jax.grad(loss64(enc_p))(params64))

    def rel_close(a, b):
        rel = float(np.linalg.norm(b - a)) / (float(np.linalg.norm(a)) + 1e-30)
        assert rel < 1e-9, rel

    jax.tree.map(rel_close, gx, gp)


@pytest.mark.parametrize("shape,cout", [
    ((2, 20, 16, 8), 8),
    ((2, 10, 8, 16), 32),
])
def test_conv3x3_stats_matches_xla(shape, cout):
    """K10 fused conv+BN-stats: y parity vs XLA conv, (sum, sumsq) parity
    vs jnp reductions, and the folded VJP (g_eff = gy + gs1 + 2 y gs2)
    vs XLA autodiff through the same (conv, sum, sumsq) triple."""
    from neural_jacobian_field_tpu.ops.pallas.conv_suite import conv3x3_stats

    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, shape, jnp.float32)
    w = jax.random.normal(kw, (3, 3, shape[-1], cout), jnp.float32) * 0.1

    def ref(x_, w_):
        y = _xla_conv(x_, w_, 1)
        return y, jnp.sum(y, (0, 1, 2)), jnp.sum(y * y, (0, 1, 2))

    got, want = conv3x3_stats(x, w), ref(x, w)
    for g, wv in zip(got, want):
        np.testing.assert_allclose(g, wv, rtol=1e-4, atol=1e-4)

    keys = jax.random.split(jax.random.PRNGKey(7), 3)
    cots = tuple(jax.random.normal(k, o.shape, o.dtype)
                 for k, o in zip(keys, want))

    def loss(fn):
        return lambda x_, w_: sum(jnp.sum(o * c)
                                  for o, c in zip(fn(x_, w_), cots))

    dx_got, dw_got = jax.grad(loss(conv3x3_stats), argnums=(0, 1))(x, w)
    dx_want, dw_want = jax.grad(loss(ref), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(dx_got, dx_want, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(dw_got, dw_want, rtol=1e-3, atol=1e-4)


def test_encoder_pallas_fused_bn_interchangeable():
    """conv_impl="pallas_fused" with norm_type="batch" (the K10 fold) must
    be a drop-in vs conv_impl="xla": identical param+batch_stats tree,
    matching train-mode forward AND updated running stats on the same
    params, and matching eval forward from the same running stats."""
    from neural_jacobian_field_tpu.models.encoder_resnet import (
        EncoderResnet, EncoderResnetCfg,
    )

    rgb = jax.random.normal(jax.random.PRNGKey(3), (2, 40, 32, 3), jnp.float32)
    kwargs = dict(norm_type="batch", feature_layout="concat", num_layers=3)
    enc_x = EncoderResnet(EncoderResnetCfg(conv_impl="xla", **kwargs))
    enc_f = EncoderResnet(EncoderResnetCfg(conv_impl="pallas_fused", **kwargs))
    vars_x = enc_x.init(jax.random.PRNGKey(4), rgb, train=True)
    vars_f = enc_f.init(jax.random.PRNGKey(4), rgb, train=True)
    assert jax.tree.structure(vars_x) == jax.tree.structure(vars_f)

    out_x, upd_x = enc_x.apply(vars_x, rgb, train=True,
                               mutable=["batch_stats"])
    out_f, upd_f = enc_f.apply(vars_x, rgb, train=True,
                               mutable=["batch_stats"])
    np.testing.assert_allclose(out_f, out_x, rtol=2e-3, atol=2e-3)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-4),
        upd_x["batch_stats"], upd_f["batch_stats"])

    # eval: running-average path (no fused kernel involved) must also agree
    ev_x = enc_x.apply({**vars_x, **upd_x}, rgb, train=False)
    ev_f = enc_f.apply({**vars_x, **upd_x}, rgb, train=False)
    np.testing.assert_allclose(ev_f, ev_x, rtol=2e-3, atol=2e-3)

    # train-mode gradient parity through conv + fused-stats BN, in f64
    # (see test_encoder_conv_impl_interchangeable for why f64)
    with jax.enable_x64():
        params64 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), vars_x)
        rgb64 = jnp.asarray(rgb, jnp.float64)

        def loss64(fn):
            def f(p):
                out, _ = fn.apply({**params64, "params": p}, rgb64,
                                  train=True, mutable=["batch_stats"])
                return jnp.mean(out ** 2)
            return f

        gx = jax.tree.map(np.asarray,
                          jax.grad(loss64(enc_x))(params64["params"]))
        gf = jax.tree.map(np.asarray,
                          jax.grad(loss64(enc_f))(params64["params"]))

    def rel_close(a, b):
        rel = float(np.linalg.norm(b - a)) / (float(np.linalg.norm(a)) + 1e-30)
        assert rel < 1e-9, rel

    jax.tree.map(rel_close, gx, gf)


def test_conv3x3_bf16_accumulates_f32():
    """bf16 inputs: the fused matmul must accumulate in f32 (tolerance is
    set by the bf16 INPUT rounding, not by accumulation error)."""
    kx, kw = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(kx, (1, 20, 16, 128), jnp.bfloat16)
    w = (jax.random.normal(kw, (3, 3, 128, 32), jnp.float32) * 0.05
         ).astype(jnp.bfloat16)
    got = conv3x3(x, w, 1).astype(jnp.float32)
    want = _xla_conv(x.astype(jnp.float32), w.astype(jnp.float32), 1)
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)
