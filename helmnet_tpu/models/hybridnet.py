"""HybridNet — the modified UNet with learned multi-resolution hidden state.

Functional re-design of the reference network (architectures.py:317-465).
The reference mutates `EncoderBlock.state` module attributes during forward
(architectures.py:227-252) — a pattern that cannot survive `jax.jit`/`scan`.
Here the hidden states are an explicit tuple carried through the call:

    out, new_states = apply(params, x, states, cfg=...)

States are NHWC `[B, n_d, n_d, state_channels]` with n_d = domain_size/2^d
for encoder level d < state_depth. Pack/unpack to the reference's flat
`[B, C, sum(n_d^2)]` layout is provided for replay-buffer interop
(architectures.py:406-437).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.config import ModelConfig
from .blocks import (
    conv2d,
    conv_transpose2d,
    conv_transpose2d_subpixel,
    double_conv,
    init_conv,
    init_conv_transpose,
    init_double_conv,
)


def states_dimension(domain_size, depth: int) -> list[tuple[int, int]]:
    """Per-level state grid sizes [(H/2^d, W/2^d)] (architectures.py:390-392;
    the reference is square-only — rectangular grids are supported here).
    `domain_size` may be an int (square) or an (H, W) tuple."""
    if isinstance(domain_size, int):
        h = w = domain_size
    else:
        h, w = domain_size
    return [(h // (2**d), w // (2**d)) for d in range(depth)]


def init_params(key, cfg: ModelConfig):
    keys = jax.random.split(key, 5 * cfg.depth + 8)
    it = iter(keys)
    act = cfg.activation_function
    params = {
        "inc": init_double_conv(next(it), cfg.in_channels, cfg.features, act),
        "enc": [],
        "decode": [],
        "up": [],
        "outc": init_conv(next(it), 1, cfg.features, 2),
    }
    for d in range(cfg.depth):
        use_state = d < cfg.state_depth
        blk = {
            "conv_signal": init_double_conv(
                next(it),
                cfg.features + (cfg.state_channels if use_state else 0),
                cfg.features,
                act,
            ),
            "down": init_conv(next(it), 8, cfg.features, cfg.features),
        }
        if use_state:
            blk["conv_state"] = init_double_conv(
                next(it), cfg.features + cfg.state_channels, cfg.state_channels, act
            )
        params["enc"].append(blk)
    for i in range(cfg.depth + 1):
        cin = cfg.features + cfg.features * (i < cfg.depth)
        params["decode"].append(init_double_conv(next(it), cin, cfg.features, act))
    for _ in range(cfg.depth):
        params["up"].append(
            init_conv_transpose(next(it), 8, cfg.features, cfg.features)
        )
    return params


def init_states(
    batch: int, domain_size, cfg: ModelConfig, dtype=jnp.float32
) -> Tuple[jax.Array, ...]:
    """Zero hidden states (reference clear_states, architectures.py:235-238)."""
    dims = states_dimension(domain_size, cfg.depth)
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
    """Forward pass. x: [B, H, W, in_channels] NHWC. Returns (out[B,H,W,2], states').

    double_conv_mode='pallas' routes each DoubleConv through the
    pixel-packed fused kernel (ops/pallas_pixconv.py) where the shape
    supports it — ~3x fewer padded MXU FLOPs than the XLA conv lowering
    at the 8-channel bench shapes — with XLA fallback at unsupported
    resolutions (e.g. width not a multiple of 16). The final 1x1 outc
    head is folded into the last decoder kernel.
    """
    act = cfg.activation_function
    prec = cfg.precision

    use_pix = (
        cfg.double_conv_mode == "pallas"
        and prec == "default"
        and act in ("prelu", "relu")
    )
    if use_pix:
        from ..ops.pallas_pixconv import fused_double_conv_pix, pix_supported

        interp = jax.default_backend() != "tpu"  # interpret off-TPU (tests)

    def dconv(p, *parts, post=None):
        if use_pix:
            _, h_, w_, _ = parts[0].shape
            cins = [int(t.shape[-1]) for t in parts]
            cm, co = p["c1"]["w"].shape[3], p["c2"]["w"].shape[3]
            ce = post["w"].shape[3] if post is not None else None
            if pix_supported(h_, w_, cins, cm, co, c_emit=ce):
                fp = {"c1": p["c1"], "act": p.get("act", {}), "c2": p["c2"]}
                if post is not None:
                    fp["post"] = post
                return fused_double_conv_pix(fp, parts, interpret=interp)
        t = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
        h = double_conv(p, t, act, prec)
        if post is not None:
            h = conv2d(post, h, precision=prec)
        return h

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
        x = conv2d(blk["down"], out, stride=2, padding=3, precision=prec)

    up = conv_transpose2d_subpixel if cfg.up_mode == "subpixel" else conv_transpose2d
    x = dconv(params["decode"][-1], x)
    for d in range(cfg.depth - 1, 0, -1):
        x = up(params["up"][d], x, stride=2, padding=3, precision=prec)
        x = dconv(params["decode"][d], x, inner_signals[d])
    # last decoder level with the 1x1 outc head folded in
    x = up(params["up"][0], x, stride=2, padding=3, precision=prec)
    out = dconv(params["decode"][0], x, inner_signals[0],
                post=params["outc"])
    return out, tuple(new_states)


# ---------------------------------------------------------------------------
# State pack/unpack — reference flat layout [B, C, sum(n_d^2)], channel-first
# (architectures.py:425-437), used by the replay buffer and checkpoints.
# ---------------------------------------------------------------------------


def flatten_states(states: Sequence[jax.Array]) -> jax.Array:
    flat = []
    for s in states:
        b, h, w, c = s.shape
        flat.append(jnp.transpose(s, (0, 3, 1, 2)).reshape(b, c, h * w))
    return jnp.concatenate(flat, axis=2)


def unflatten_states(
    flat: jax.Array, domain_size, cfg: ModelConfig
) -> Tuple[jax.Array, ...]:
    dims = states_dimension(domain_size, cfg.depth)
    states = []
    start = 0
    b, c = flat.shape[0], flat.shape[1]
    for d in range(cfg.state_depth):
        hd, wd = dims[d]
        chunk = flat[:, :, start : start + hd * wd]
        states.append(jnp.transpose(chunk.reshape(b, c, hd, wd), (0, 2, 3, 1)))
        start += hd * wd
    return tuple(states)


def total_state_length(domain_size, cfg: ModelConfig) -> int:
    dims = states_dimension(domain_size, cfg.depth)
    return sum(h * w for h, w in dims[: cfg.state_depth])


def count_params(params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))
