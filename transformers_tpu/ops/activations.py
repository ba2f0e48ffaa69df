"""Activation registry (reference src/transformers/activations.py ACT2FN)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gelu_new(x):
    """GPT-2's tanh-approximated gelu (reference activations.py NewGELUActivation)."""
    return (
        0.5 * x * (1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * jnp.power(x, 3.0))))
    )


def gelu_pytorch_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


ACT2FN = {
    "gelu": gelu_exact,
    "gelu_new": gelu_new,
    "gelu_fast": gelu_new,
    "gelu_pytorch_tanh": gelu_pytorch_tanh,
    "gelu_python": gelu_exact,
    "quick_gelu": quick_gelu,
    "relu": jax.nn.relu,
    "relu2": lambda x: jnp.square(jax.nn.relu(x)),
    "relu6": jax.nn.relu6,
    "sigmoid": jax.nn.sigmoid,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "tanh": jnp.tanh,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "leaky_relu": jax.nn.leaky_relu,
    "linear": lambda x: x,
    "hard_swish": jax.nn.hard_swish,
    "hardswish": jax.nn.hard_swish,
}


def get_activation(name: str):
    if name not in ACT2FN:
        raise KeyError(f"Unknown activation {name!r}; known: {sorted(ACT2FN)}")
    return ACT2FN[name]
