"""Classic UNet (Flax, NHWC).

Re-design of the reference's jacobian/model_components/unet.py:110-247
(jaxony/unet-pytorch lineage): `depth` DownConv stages (2x conv3x3+ReLU, then
maxpool), mirrored UpConv stages (2x2 transpose-conv upsample, concat merge,
2x conv3x3+ReLU), 1x1 output conv. Channels double per depth from
`start_filts`. NHWC keeps convs in the TPU-native layout.
"""

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models import initializers as init


class DownConv(nn.Module):
    out_channels: int
    pooling: bool = True
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, jax.Array]:
        dt = self.compute_dtype
        x = nn.relu(nn.Conv(self.out_channels, (3, 3), padding=1, dtype=dt,
                            kernel_init=init.kaiming_normal_in, name="conv1")(x))
        x = nn.relu(nn.Conv(self.out_channels, (3, 3), padding=1, dtype=dt,
                            kernel_init=init.kaiming_normal_in, name="conv2")(x))
        before_pool = x
        if self.pooling:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x, before_pool


class UpConv(nn.Module):
    out_channels: int
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, from_down: jax.Array, from_up: jax.Array) -> jax.Array:
        dt = self.compute_dtype
        up = nn.ConvTranspose(self.out_channels, (2, 2), strides=(2, 2), dtype=dt,
                              kernel_init=init.kaiming_normal_in, name="upconv")(from_up)
        x = jnp.concatenate([up, from_down], axis=-1)  # merge_mode="concat"
        x = nn.relu(nn.Conv(self.out_channels, (3, 3), padding=1, dtype=dt,
                            kernel_init=init.kaiming_normal_in, name="conv1")(x))
        x = nn.relu(nn.Conv(self.out_channels, (3, 3), padding=1, dtype=dt,
                            kernel_init=init.kaiming_normal_in, name="conv2")(x))
        return x


class UNet(nn.Module):
    """__call__([B, H, W, in_ch]) -> [B, H, W, out_channels]. H, W must be
    divisible by 2**(depth-1)."""

    out_channels: int
    depth: int = 3
    start_filts: int = 32
    compute_dtype: Optional[jnp.dtype] = None

    def encode(self, x) -> Tuple[jax.Array, List[jax.Array]]:
        dt = self.compute_dtype
        x = x.astype(dt) if dt is not None else x
        skips = []
        for i in range(self.depth):
            pooling = i < self.depth - 1
            x, before_pool = DownConv(
                out_channels=self.start_filts * (2 ** i), pooling=pooling,
                compute_dtype=dt, name=f"down_{i}",
            )(x)
            skips.append(before_pool)
        return x, skips

    @nn.compact
    def __call__(self, x: jax.Array, return_features: bool = False):
        x, skips = self.encode(x)
        features = x  # bottleneck features (reference UNet.encoder output)
        for i in range(self.depth - 2, -1, -1):
            x = UpConv(out_channels=self.start_filts * (2 ** i),
                       compute_dtype=self.compute_dtype, name=f"up_{i}")(skips[i], x)
        x = nn.Conv(self.out_channels, (1, 1),
                    kernel_init=init.xavier_normal, name="conv_final")(x)
        x = x.astype(jnp.float32)
        if return_features:
            return x, features.astype(jnp.float32)
        return x
