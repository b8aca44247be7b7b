"""ConvGRU cell (reference architectures.py:135-183).

Defined-but-disabled in the reference (the EncoderBlock's ConvGRU call-site
is commented out, architectures.py:218-225); provided here for API
completeness as a functional (init, apply) pair so it can be swapped in as
the state-update rule of the encoder blocks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .blocks import init_conv


def init_convgru(key, in_channels: int, hidden_channels: int, k: int = 3):
    k1, k2, k3 = jax.random.split(key, 3)
    cin = in_channels + hidden_channels
    return {
        "update_gate": init_conv(k1, k, cin, hidden_channels),
        "reset_gate": init_conv(k2, k, cin, hidden_channels),
        "out_gate": init_conv(k3, k, cin, hidden_channels),
    }


def convgru(params, x: jax.Array, h: jax.Array, precision: str = "default"):
    """One ConvGRU step. x: [B,H,W,Cin], h: [B,H,W,Ch] -> new h."""
    from .blocks import conv2d

    k = params["update_gate"]["w"].shape[0]
    pad = k // 2
    xh = jnp.concatenate([x, h], axis=-1)
    update = jax.nn.sigmoid(conv2d(params["update_gate"], xh, padding=pad,
                                   precision=precision))
    reset = jax.nn.sigmoid(conv2d(params["reset_gate"], xh, padding=pad,
                                  precision=precision))
    out = jnp.tanh(
        conv2d(
            params["out_gate"],
            jnp.concatenate([x, h * reset], axis=-1),
            padding=pad,
            precision=precision,
        )
    )
    return h * (1 - update) + out * update
