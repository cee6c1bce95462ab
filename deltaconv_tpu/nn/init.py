"""Reference-faithful parameter initializers.

``torch.nn.Linear`` initializes its weight with
``kaiming_uniform(a=sqrt(5))`` — which reduces to
``U(-1/sqrt(fan_in), +1/sqrt(fan_in))`` — and its bias with the same
bounds (torch ``nn/modules/linear.py::reset_parameters``); every
linear layer in the reference uses those defaults. flax's default
``lecun_normal`` has 3x the variance, and the difference is not
cosmetic: on the synthetic convergence protocol the lecun-initialized
model generalizes measurably worse than the torch-initialized one
(eval accuracy ~0.6 vs ~0.9 under the identical training loop —
verified against the executed reference, tests/parity/). These
initializers reproduce the torch distribution so training trajectories
match the reference's.
"""

from __future__ import annotations

import flax.linen as lnn
import jax
import jax.numpy as jnp

__all__ = ["torch_linear_kernel", "torch_linear_bias"]

# variance_scaling draws U(+-sqrt(3 * scale / fan_in)); scale = 1/3
# gives exactly torch's U(+-1/sqrt(fan_in)).
torch_linear_kernel = lnn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


def torch_linear_bias(fan_in: int):
    """torch Linear bias init, ``U(+-1/sqrt(fan_in))``. flax bias
    initializers only see the bias shape, so the layer's input width
    is captured here."""
    bound = 1.0 / float(fan_in) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
