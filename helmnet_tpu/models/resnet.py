"""Stateful flat ResNet variant (reference architectures.py:255-314).

Alternate iterative-update network: in-conv 7x7 on [input(+state)] ->
depth x ResDoubleConv -> out-conv 7x7 producing 4 channels, the first 2 of
which become the next hidden state and the last 2 the wavefield update.
Unreachable from the reference config (hybridnet.py:78-90 accepts only
"custom_unet") but exported in its package API; here it is a first-class
architecture selectable with ModelConfig.architecture == "resnet".

State is a single full-resolution [B, H, W, state_channels] array carried
explicitly (same (out, new_states) contract as hybridnet.apply, with a
1-tuple of states).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.config import ModelConfig
from .blocks import conv2d, init_conv, init_double_conv, res_double_conv


def init_params(key, cfg: ModelConfig):
    keys = jax.random.split(key, cfg.depth + 2)
    params = {
        "inc": init_conv(keys[0], 7, cfg.in_channels + cfg.state_channels,
                         cfg.features),
        "blocks": [
            init_double_conv(keys[1 + d], cfg.features, cfg.features,
                             cfg.activation_function, cmid=cfg.features * 2)
            for d in range(cfg.depth)
        ],
        "outc": init_conv(keys[-1], 7, cfg.features, 2 + cfg.state_channels),
    }
    return params


def init_states(batch: int, domain_size, cfg: ModelConfig,
                dtype=jnp.float32) -> Tuple[jax.Array, ...]:
    if isinstance(domain_size, int):
        domain_size = (domain_size, domain_size)
    h, w = domain_size
    return (jnp.zeros((batch, h, w, cfg.state_channels), dtype),)


def apply(params, x: jax.Array, states: Sequence[jax.Array], *,
          cfg: ModelConfig) -> tuple[jax.Array, Tuple[jax.Array, ...]]:
    prec = cfg.precision
    h = jnp.concatenate([x, states[0]], axis=-1)
    h = conv2d(params["inc"], h, padding=3, precision=prec)
    for blk in params["blocks"]:
        h = res_double_conv(blk, h, cfg.activation_function, prec)
    y = conv2d(params["outc"], h, padding=3, precision=prec)
    new_state = y[..., : cfg.state_channels]
    out = y[..., cfg.state_channels :]
    return out, (new_state,)


def flatten_states(states: Sequence[jax.Array]) -> jax.Array:
    s = states[0]
    b, h, w, c = s.shape
    return jnp.transpose(s, (0, 3, 1, 2)).reshape(b, c, h * w)


def unflatten_states(flat: jax.Array, domain_size,
                     cfg: ModelConfig) -> Tuple[jax.Array, ...]:
    if isinstance(domain_size, int):
        domain_size = (domain_size, domain_size)
    h, w = domain_size
    b, c = flat.shape[0], flat.shape[1]
    return (jnp.transpose(flat.reshape(b, c, h, w), (0, 2, 3, 1)),)


def total_state_length(domain_size, cfg: ModelConfig) -> int:
    if isinstance(domain_size, int):
        return domain_size * domain_size
    return domain_size[0] * domain_size[1]
