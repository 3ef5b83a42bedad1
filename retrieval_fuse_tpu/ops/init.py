"""Parameter initializers reproducing torch's defaults, so freshly-initialized
networks match the reference's weight distributions and imported torch
checkpoints drop straight in.

torch Conv3d/Linear default: kaiming_uniform(a=sqrt(5)) on weights, which is
U(-1/sqrt(fan_in), 1/sqrt(fan_in)); bias is U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

# U(-sqrt(1/fan_in), sqrt(1/fan_in)) == variance_scaling(1/3, fan_in, uniform)
torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    """torch bias init needs the layer's fan_in, which flax bias initializers
    don't see — close over it."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def dirac_noise_init(noise_std: float = 0.01):
    """Dirac (identity) 1x1x1 conv kernel plus N(0, noise_std) noise.

    Parity: reference model/attention.py:5-15 (Conv3dAttentionOutput).
    Kernel shape (1, 1, 1, C_in, C_out): identity when C_in == C_out.
    """

    def init(key, shape, dtype=jnp.float32):
        kd, kh, kw, cin, cout = shape
        eye = jnp.zeros(shape, dtype)
        n = min(cin, cout)
        eye = eye.at[kd // 2, kh // 2, kw // 2, jnp.arange(n), jnp.arange(n)].set(1.0)
        return eye + jax.random.normal(key, shape, dtype) * noise_std

    return init


def normal_init(std: float = 0.01):
    """N(0, std) init (ref model/attention.py:18-26, Conv3dAttentionFeature)."""
    return nn.initializers.normal(stddev=std)
