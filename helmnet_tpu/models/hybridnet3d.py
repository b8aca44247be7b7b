"""HybridNet3D — the learned-iteration UNet extended to 3D volumes.

Capability extension (the reference ucl-bug/helmnet is 2D-only; its
HybridNet operates on [B, C, H, W] — architectures.py:317-465). This is the
same modified-UNet-with-multiresolution-hidden-state design re-expressed
for NDHWC volumes, paired with the 3D spectral PML operator
(ops/spectral3d.py) by solvers/iterative3d.py.

Structural mirror of models/hybridnet.py:

* hidden states are explicit lax.scan carries, one per encoder level
  d < state_depth, shaped [B, D/2^d, H/2^d, W/2^d, state_channels];
* encoder: double_conv3d over [signal, state], state update
  double_conv3d over [out, state], k=4/s=2/p=1 down conv;
* decoder: transposed conv (optionally 8-phase sub-pixel) + double_conv3d
  over [up, skip]; 1x1x1 head to the 2-channel wavefield update.

Input channels: wavefield(2) + 1e3*residual(2) + sigma_x/y/z(3) = 7.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.config import ModelConfig
from .blocks3d import (
    conv3d,
    conv_transpose3d,
    conv_transpose3d_subpixel,
    double_conv3d,
    init_conv3d,
    init_conv_transpose3d,
    init_double_conv3d,
)

RESAMPLE_K = 4  # down/up kernel (3D-native choice, see blocks3d docstring)


def states_dimension3d(domain_size, depth: int):
    """Per-level state grid sizes [(D/2^d, H/2^d, W/2^d)]."""
    if isinstance(domain_size, int):
        d = h = w = domain_size
    else:
        d, h, w = domain_size
    return [(d // (2**l), h // (2**l), w // (2**l)) for l in range(depth)]


def init_params(key, cfg: ModelConfig):
    keys = jax.random.split(key, 5 * cfg.depth + 8)
    it = iter(keys)
    act = cfg.activation_function
    params = {
        "inc": init_double_conv3d(next(it), cfg.in_channels, cfg.features, act),
        "enc": [],
        "decode": [],
        "up": [],
        "outc": init_conv3d(next(it), 1, cfg.features, 2),
    }
    for d in range(cfg.depth):
        use_state = d < cfg.state_depth
        blk = {
            "conv_signal": init_double_conv3d(
                next(it),
                cfg.features + (cfg.state_channels if use_state else 0),
                cfg.features,
                act,
            ),
            "down": init_conv3d(next(it), RESAMPLE_K, cfg.features, cfg.features),
        }
        if use_state:
            blk["conv_state"] = init_double_conv3d(
                next(it), cfg.features + cfg.state_channels, cfg.state_channels, act
            )
        params["enc"].append(blk)
    for i in range(cfg.depth + 1):
        cin = cfg.features + cfg.features * (i < cfg.depth)
        params["decode"].append(init_double_conv3d(next(it), cin, cfg.features, act))
    for _ in range(cfg.depth):
        params["up"].append(
            init_conv_transpose3d(next(it), RESAMPLE_K, cfg.features, cfg.features)
        )
    return params


def init_states(
    batch: int, domain_size, cfg: ModelConfig, dtype=jnp.float32
) -> Tuple[jax.Array, ...]:
    dims = states_dimension3d(domain_size, cfg.depth)
    return tuple(
        jnp.zeros((batch,) + dims[d] + (cfg.state_channels,), dtype)
        for d in range(cfg.state_depth)
    )


def apply(
    params,
    x: jax.Array,
    states: Sequence[jax.Array],
    *,
    cfg: ModelConfig,
) -> tuple[jax.Array, Tuple[jax.Array, ...]]:
    """Forward pass. x: [B, D, H, W, in_channels]. Returns (out[...,2], states')."""
    act = cfg.activation_function
    prec = cfg.precision

    def dconv(p, *parts):
        t = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
        return double_conv3d(p, t, act, prec)

    x = dconv(params["inc"], x)

    inner_signals = []
    new_states = []
    for d in range(cfg.depth):
        blk = params["enc"][d]
        if d < cfg.state_depth:
            out = dconv(blk["conv_signal"], x, states[d])
            new_states.append(dconv(blk["conv_state"], out, states[d]))
        else:
            out = dconv(blk["conv_signal"], x)
        inner_signals.append(out)
        x = conv3d(blk["down"], out, stride=2, padding=1, precision=prec)

    up = (
        conv_transpose3d_subpixel
        if cfg.up_mode == "subpixel"
        else conv_transpose3d
    )
    x = dconv(params["decode"][-1], x)
    for d in range(cfg.depth - 1, -1, -1):
        x = up(params["up"][d], x, stride=2, padding=1, precision=prec)
        x = dconv(params["decode"][d], x, inner_signals[d])
    out = conv3d(params["outc"], x, precision=prec)
    return out, tuple(new_states)


# ---------------------------------------------------------------------------
# State pack/unpack — flat [B, C, sum(n_d^3)] layout (replay-buffer interop,
# same convention as the 2D hybridnet.flatten_states)
# ---------------------------------------------------------------------------


def flatten_states(states: Sequence[jax.Array]) -> jax.Array:
    flat = []
    for s in states:
        b, d, h, w, c = s.shape
        flat.append(jnp.transpose(s, (0, 4, 1, 2, 3)).reshape(b, c, d * h * w))
    return jnp.concatenate(flat, axis=2)


def unflatten_states(
    flat: jax.Array, domain_size, cfg: ModelConfig
) -> Tuple[jax.Array, ...]:
    dims = states_dimension3d(domain_size, cfg.depth)
    states = []
    start = 0
    b, c = flat.shape[0], flat.shape[1]
    for l in range(cfg.state_depth):
        dd, hd, wd = dims[l]
        n = dd * hd * wd
        chunk = flat[:, :, start : start + n]
        states.append(
            jnp.transpose(chunk.reshape(b, c, dd, hd, wd), (0, 2, 3, 4, 1))
        )
        start += n
    return tuple(states)


def count_params(params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))
