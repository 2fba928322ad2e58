"""Pre-norm ViT-style transformer with optional cross-attention.

Re-design of the reference's model_components/transformer.py:14-135 (itself
based on lucidrains' vit-pytorch). Used by the jacobian_transformer action
decoder: per-point query tokens cross-attend into `action_dim` learned index
embeddings (action_decoder_jacobian.py:384-396).

TPU notes: attention here is tiny (KV length = action_dim ~ 8-16), so the
right design is plain batched einsum matmuls — XLA maps them onto the MXU and
fuses the softmax; flash-style tiling would only add overhead at this size.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import initializers as init


class FeedForward(nn.Module):
    dim: int
    hidden_dim: int
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        dt = self.compute_dtype
        x = nn.Dense(self.hidden_dim, kernel_init=init.torch_linear, dtype=dt, name="fc1")(x)
        # exact erf GELU: the reference FeedForward uses torch nn.GELU()
        # (model_components/transformer.py:29), which is the erf form
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, kernel_init=init.torch_linear, dtype=dt, name="fc2")(x)
        return x


class Attention(nn.Module):
    """Multi-head attention; cross-attention when `z` is given (selfatt=False)."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    selfatt: bool = True
    kv_dim: Optional[int] = None
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, z: Optional[jax.Array] = None):
        dt = self.compute_dtype
        inner = self.dim_head * self.heads
        project_out = not (self.heads == 1 and self.dim_head == self.dim)

        if self.selfatt:
            qkv = nn.Dense(inner * 3, use_bias=False, kernel_init=init.torch_linear,
                           dtype=dt, name="to_qkv")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = nn.Dense(inner, use_bias=False, kernel_init=init.torch_linear,
                         dtype=dt, name="to_q")(x)
            kv = nn.Dense(inner * 2, use_bias=False, kernel_init=init.torch_linear,
                          dtype=dt, name="to_kv")(z)
            k, v = jnp.split(kv, 2, axis=-1)

        def split_heads(t):
            return t.reshape(*t.shape[:-1], self.heads, self.dim_head).swapaxes(-3, -2)

        q, k, v = map(split_heads, (q, k, v))
        scale = self.dim_head ** -0.5
        dots = jnp.einsum("...hqd,...hkd->...hqk", q, k) * scale
        attn = jax.nn.softmax(dots.astype(jnp.float32), axis=-1).astype(dots.dtype)
        out = jnp.einsum("...hqk,...hkd->...hqd", attn, v)
        out = out.swapaxes(-3, -2).reshape(*x.shape[:-1], inner)

        if project_out:
            out = nn.Dense(self.dim, kernel_init=init.torch_linear, dtype=dt,
                           name="to_out")(out)
        return out


class Transformer(nn.Module):
    """Stack of pre-norm attention + feed-forward blocks (transformer.py:87-135)."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    selfatt: bool = True
    kv_dim: Optional[int] = None
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, z: Optional[jax.Array] = None) -> jax.Array:
        dt = self.compute_dtype
        for i in range(self.depth):
            normed = nn.LayerNorm(dtype=dt, name=f"layers_{i}_attn_norm")(x)
            x = x + Attention(
                dim=self.dim, heads=self.heads, dim_head=self.dim_head,
                selfatt=self.selfatt, kv_dim=self.kv_dim, compute_dtype=dt,
                name=f"layers_{i}_attn",
            )(normed, z=z)
            normed = nn.LayerNorm(dtype=dt, name=f"layers_{i}_ff_norm")(x)
            x = x + FeedForward(dim=self.dim, hidden_dim=self.mlp_dim, compute_dtype=dt,
                                name=f"layers_{i}_ff")(normed)
        return x
