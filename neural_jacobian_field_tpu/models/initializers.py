"""Weight initializers matching the reference's torch init schemes.

The reference relies on specific inits for training dynamics:
  - kaiming_normal(fan_in) on ResnetFC input/output/latent linears
    (model_components/resnet_fc.py:53-54,101-107,121-123);
  - zeros on each residual block's second linear (resnet_fc.py:56);
  - N(0, 1e-4) on Jacobian/flow heads so the field starts near-zero
    (action_decoder_jacobian.py:77-84);
  - torch's default kaiming_uniform(a=sqrt(5)) on plain nn.Linear layers
    (color head, attention projections).
"""

import jax.numpy as jnp
from flax import linen as nn

# kaiming_normal(a=0, fan_in) == N(0, sqrt(2 / fan_in))
kaiming_in = nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal")
kaiming_normal_in = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
# torch conv default-ish / reference encoder: kaiming_normal(fan_out)
kaiming_normal_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
# torch nn.Linear default: kaiming_uniform(a=sqrt(5)) -> U(+-sqrt(1/fan_in))
torch_linear = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
zeros = nn.initializers.zeros
xavier_normal = nn.initializers.xavier_normal()


def near_zero_normal(std: float = 1e-4):
    """Near-zero init for Jacobian/flow heads (reference std 1e-4)."""
    return nn.initializers.normal(stddev=std)


def torch_linear_bias(in_features: int):
    """torch nn.Linear default bias init: U(+-1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / (in_features ** 0.5)
        import jax

        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
