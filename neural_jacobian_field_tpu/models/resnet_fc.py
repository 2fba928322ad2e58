"""Residual fully-connected field trunk (PixelNeRF-style ResnetFC).

Flax re-design of the reference's model_components/resnet_fc.py:11-154: a
linear-in layer, `n_blocks` residual FC blocks with the pixel-aligned latent
injected additively (via per-block linear) for the first `combine_layer`
blocks, then an activation + linear-out.

TPU notes: all layers are plain [N, d_hidden] matmuls batched over
B*rays*samples points — ideal MXU shapes when N is large and d_hidden is a
multiple of 128 (default 128). `compute_dtype` lets the caller run the trunk
in bfloat16 with f32 params/accumulation.
"""

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import initializers as init


@dataclass(frozen=True)
class MlpCfg:
    n_blocks: int = 5
    d_hidden: int = 128
    combine_layer: int = 3
    combine_type: str = "mean"
    beta: float = 0.0  # >0 -> softplus(beta), else ReLU


class _Linear(nn.Module):
    """Parameter container with nn.Dense's param names (kernel/bias) but no
    compute — lets ResnetFC fuse the per-block lin_z projections into ONE
    matmul (the kernels are concatenated at apply time) while keeping the
    param tree bit-identical to the unfused layout (checkpoint + torch-port
    compatibility)."""

    features: int
    in_features: int
    kernel_init: callable
    bias_init: callable

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init, (self.in_features, self.features))
        b = self.param("bias", self.bias_init, (self.features,))
        return k, b


class ResnetFC(nn.Module):
    """Args mirror the reference ResnetFC(d_in, d_latent, d_out).

    __call__(z, x): z = latent features [..., d_latent], x = encoded coords
    [..., d_in]. Returns (output [..., d_out], features or None).
    """

    cfg: MlpCfg
    d_out: int
    d_latent: int
    compute_dtype: Optional[jnp.dtype] = None
    # When set, every linear uses these initializers instead of the defaults —
    # the reference's `initialize_jacobian_weights` applies N(0, 1e-4) to all
    # linears of the jacobian/flow heads (action_decoder_jacobian.py:77-84).
    kernel_override: Optional[callable] = None
    bias_override: Optional[callable] = None
    # K7: evaluate through the fused Pallas train kernel
    # (ops/pallas/field_mlp_train.py) — whole trunk per point-tile in VMEM,
    # fwd + recompute-bwd. TPU-only (falls through to the XLA chain
    # elsewhere or when compute_features is requested).
    fused_trunk: bool = False

    def _declare_params(self, kinit, binit, d_in):
        """Materialize every layer's params via _Linear containers (names and
        shapes identical to the nn.Dense path) for the fused kernel."""
        dh = self.cfg.d_hidden
        n_lin_z = min(self.cfg.combine_layer, self.cfg.n_blocks)

        def lin(name, din, dout, k_default, b_default=init.zeros):
            k, b = _Linear(features=dout, in_features=din,
                           kernel_init=kinit(k_default), bias_init=binit(b_default),
                           name=name)()
            return name, {"kernel": k, "bias": b}

        params = dict([
            lin("lin_in", d_in, dh, init.kaiming_normal_in),
            *[lin(f"lin_z_{i}", self.d_latent, dh, init.kaiming_normal_in)
              for i in range(n_lin_z)],
        ])
        for i in range(self.cfg.n_blocks):
            params.update([
                lin(f"blocks_{i}_fc_0", dh, dh, init.kaiming_normal_in),
                lin(f"blocks_{i}_fc_1", dh, dh, init.zeros),
            ])
        params.update([lin("lin_out", dh, self.d_out, init.kaiming_normal_in)])
        return params

    @nn.compact
    def __call__(self, z, x: jax.Array, compute_features: bool = False):
        # z: [..., d_latent] or a tuple of per-level arrays summing to
        # d_latent (pyramid features pre-concat — the K7 kernel consumes
        # them level-wise, skipping the HBM concat; the XLA path concats).
        dt = self.compute_dtype
        act = (lambda v: nn.softplus(self.cfg.beta * v) / self.cfg.beta) if self.cfg.beta > 0 else nn.relu

        def kinit(default):
            return self.kernel_override if self.kernel_override is not None else default

        def binit(default):
            return self.bias_override if self.bias_override is not None else default

        use_fused = (
            self.fused_trunk and not compute_features and self.cfg.beta == 0
            and self.d_latent > 0 and jax.default_backend() == "tpu"
            # the fused kernel computes in bf16 internally; honoring an f32
            # compute_dtype silently is a numerics change, so fall through to
            # the XLA chain unless the model already runs bf16
            and dt == jnp.bfloat16
        )
        from ..ops.epipolar import KnotFeatures

        if use_fused:
            from ..ops.pallas.field_mlp_train import (
                fused_resnet_fc_train, fused_resnet_fc_train_tz,
            )

            params = self._declare_params(kinit, binit, x.shape[-1])
            n_lin_z = min(self.cfg.combine_layer, self.cfg.n_blocks)
            if isinstance(z, KnotFeatures) and n_lin_z > 0:
                # knot-side latent projection: tz = sum_l H @ (K_l @ W_l)
                # + b — linearity moves the lin_z contraction from the
                # samples (N x 512 x n*dh, paid 4x across fwd + recompute +
                # backward) to the M knots per ray; the kernel skips lin_z
                # entirely (ops/epipolar.KnotFeatures).
                wz_cat = jnp.concatenate(
                    [params[f"lin_z_{i}"]["kernel"] for i in range(n_lin_z)],
                    axis=1)
                dims = [lvl.shape[-1] for lvl in z.levels]
                w_rows, r0 = [], 0
                for d in dims:
                    w_rows.append(wz_cat[r0:r0 + d])
                    r0 += d
                tz = z.project_then_interp(w_rows)
                # lin_z kernels differentiate through tz; the biases ride
                # into the kernel (added + differentiated in VMEM)
                params_tz = {
                    k: ({"bias": v["bias"]} if k.startswith("lin_z_") else v)
                    for k, v in params.items()
                }
                out = fused_resnet_fc_train_tz(params_tz, self.cfg, tz, x,
                                               self.d_out)
                return out, None
            if isinstance(z, KnotFeatures):
                z = z.interp_levels()
            out = fused_resnet_fc_train(params, self.cfg, z, x, self.d_out)
            return out, None

        if isinstance(z, KnotFeatures):
            z = z.concat()
        elif isinstance(z, (tuple, list)):
            z = jnp.concatenate(z, axis=-1)

        x = nn.Dense(self.cfg.d_hidden, kernel_init=kinit(init.kaiming_normal_in),
                     bias_init=binit(init.zeros), dtype=dt, name="lin_in")(x)

        features = [] if compute_features else None
        n_lin_z = min(self.cfg.combine_layer, self.cfg.n_blocks)

        # All lin_z projections as ONE [d_latent, n*d_hidden] matmul: the
        # fused form halves the per-point matmul dispatches and, crucially,
        # makes the backward grad wrt z a single matmul instead of n
        # separate [N, d_latent] products summed (measured ~8 ms/step at
        # reference shapes). Param tree is identical to per-block nn.Dense.
        tz_parts = None
        if self.d_latent > 0 and n_lin_z > 0:
            kbs = [
                _Linear(features=self.cfg.d_hidden, in_features=self.d_latent,
                        kernel_init=kinit(init.kaiming_normal_in),
                        bias_init=binit(init.zeros), name=f"lin_z_{i}")()
                for i in range(n_lin_z)
            ]
            w_cat = jnp.concatenate([k for k, _ in kbs], axis=1)
            b_cat = jnp.concatenate([b for _, b in kbs], axis=0)
            if dt is not None:
                w_cat, b_cat, z = w_cat.astype(dt), b_cat.astype(dt), z.astype(dt)
            tz_all = z @ w_cat + b_cat
            tz_parts = [
                tz_all[..., i * self.cfg.d_hidden : (i + 1) * self.cfg.d_hidden]
                for i in range(n_lin_z)
            ]

        for block_id in range(self.cfg.n_blocks):
            if tz_parts is not None and block_id < n_lin_z:
                x = x + tz_parts[block_id]
            # blocks run at d_hidden everywhere -> no shortcut projection needed
            net = nn.Dense(self.cfg.d_hidden, kernel_init=kinit(init.kaiming_normal_in),
                           bias_init=binit(init.zeros), dtype=dt, name=f"blocks_{block_id}_fc_0")(act(x))
            dx = nn.Dense(self.cfg.d_hidden, kernel_init=kinit(init.zeros), bias_init=binit(init.zeros),
                          dtype=dt, name=f"blocks_{block_id}_fc_1")(act(net))
            x = x + dx
            if compute_features:
                features.append(x)

        out = nn.Dense(self.d_out, kernel_init=kinit(init.kaiming_normal_in),
                       bias_init=binit(init.zeros), dtype=dt, name="lin_out")(act(x))
        out = out.astype(jnp.float32)

        if compute_features:
            features = jnp.concatenate(features, axis=-1).astype(jnp.float32)
        return out, features
