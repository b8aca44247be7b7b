"""Activation-function factory (reference helmnet/architectures.py:5-44).

Activations are (init, apply) pairs over a params dict so learnable ones
(PReLU) live in the same pytree as the conv weights. All are NHWC-agnostic
elementwise ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _stateless(fn):
    return (lambda key: {}, lambda params, x: fn(x))


def _prelu_init(key):
    # torch nn.PReLU default: single shared slope 0.25
    return {"a": jnp.full((1,), 0.25, jnp.float32)}


def _prelu_apply(params, x):
    a = params["a"]
    return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


_ACTIVATIONS = {
    "relu": _stateless(jax.nn.relu),
    "celu": _stateless(jax.nn.celu),
    "tanh": _stateless(jnp.tanh),
    "gelu": _stateless(jax.nn.gelu),
    "tanhshrink": _stateless(lambda x: x - jnp.tanh(x)),
    "softplus": _stateless(jax.nn.softplus),
    "leakyrelu": _stateless(lambda x: jax.nn.leaky_relu(x, 0.01)),
    "prelu": (_prelu_init, _prelu_apply),
}


def get_activation(name: str):
    """Returns (init_fn, apply_fn) for the named activation.

    `relu_batchnorm` of the reference is intentionally mapped to plain relu:
    batch statistics are incompatible with the functional scan-carried rollout
    (and the reference never enables it in any shipped config).
    """
    key = name.lower()
    if key == "relu_batchnorm":
        key = "relu"
    if key not in _ACTIVATIONS:
        raise NotImplementedError(f"Unknown activation function {name}")
    return _ACTIVATIONS[key]
