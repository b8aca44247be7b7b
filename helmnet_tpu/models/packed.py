"""Batch->channel block-diagonal packing of the HybridNet — MXU utilization.

The 140k-param UNet's 3x3 convs have 8 input/output channels: on the MXU
(128x128 systolic array) that is K=72 of 128 contraction lanes and N=8 of
128 output lanes — one mostly-empty padded pass per conv (PERF_NOTES.md).
XLA cannot pad its way out of an 8-channel model.

Packing G independent problems into the channel axis fixes the shape, not
the math: inputs [G*B', H, W, C] -> [B', H, W, G*C] (group-major channels),
weights lifted to block-diagonal [kh, kw, G*ci, G*co] (off-diagonal blocks
exactly zero => identical per-problem results). With G=16 a 3x3 conv
becomes K=9*128, N=128 — 9 full MXU passes for 16 problems instead of 16
padded ones: ~1.8x less MXU time, identical outputs.

Only the network runs packed; the spectral operator/residual keep the
standard [B, H, W, 2] layout (they are already full-width matmuls), with
one cheap pack/unpack transpose per iteration at the network boundary.
Hidden states stay packed across iterations.

Reference cost model being beaten: hybridnet.py:558-584 per-iteration conv
stack.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.config import Config, ModelConfig
from ..ops.spectral import SpectralPML
from ..solvers.iterative import get_initials
from .activations import get_activation
from .blocks import conv2d, conv_transpose2d, conv_transpose2d_subpixel
from .hybridnet import states_dimension


def _pack_w(w: jax.Array, g: int) -> jax.Array:
    """[kh, kw, ci, co] -> block-diagonal [kh, kw, g*ci, g*co]."""
    kh, kw, ci, co = w.shape
    eye = jnp.eye(g, dtype=w.dtype)
    blocks = jnp.einsum("hwio,gk->hwgiko", w, eye)
    return blocks.reshape(kh, kw, g * ci, g * co)


def pack_params(params, g: int):
    """Lift every conv weight to block-diagonal, tile biases; activation
    params (shared PReLU slope) pass through unchanged."""

    def walk(p):
        if isinstance(p, dict):
            if "w" in p and "b" in p:
                return {"w": _pack_w(p["w"], g), "b": jnp.tile(p["b"], g)}
            return {k: walk(v) for k, v in p.items()}
        if isinstance(p, list):
            return [walk(v) for v in p]
        return p

    return walk(params)


def _gconcat(a: jax.Array, b: jax.Array, g: int) -> jax.Array:
    """Group-aware channel concat: [..., g*ca] + [..., g*cb] ->
    [..., g*(ca+cb)] with per-group channel blocks kept contiguous (the
    layout the block-diagonal weights contract against)."""
    lead = a.shape[:-1]
    ca, cb = a.shape[-1] // g, b.shape[-1] // g
    a5 = a.reshape(lead + (g, ca))
    b5 = b.reshape(lead + (g, cb))
    return jnp.concatenate([a5, b5], axis=-1).reshape(lead + (g * (ca + cb),))


def pack_batch(x: jax.Array, g: int) -> jax.Array:
    """[B, H, W, C] -> [B/g, H, W, g*C] (group-major channels)."""
    b, h, w, c = x.shape
    return jnp.transpose(
        x.reshape(b // g, g, h, w, c), (0, 2, 3, 1, 4)
    ).reshape(b // g, h, w, g * c)


def unpack_batch(y: jax.Array, g: int) -> jax.Array:
    """Inverse of pack_batch."""
    bg, h, w, gc = y.shape
    return jnp.transpose(
        y.reshape(bg, h, w, g, gc // g), (0, 3, 1, 2, 4)
    ).reshape(bg * g, h, w, gc // g)


def _split_packed_rows(w: jax.Array, splits, g: int):
    """Split a packed block-diagonal weight's input rows per concat part.

    w: [kh, kw, g*sum(splits), co] whose input rows are group-major over
    the concatenated per-group channel blocks (the `_gconcat` layout).
    Returns one [kh, kw, g*ci, co] weight per part, each contracting
    against a separately-packed input — conv(concat(xs)) == sum_i
    conv(x_i, w_i)."""
    kh, kw, _, co = w.shape
    tot = sum(splits)
    w5 = w.reshape(kh, kw, g, tot, co)
    outs, start = [], 0
    for ci in splits:
        outs.append(
            w5[:, :, :, start : start + ci, :].reshape(kh, kw, g * ci, co)
        )
        start += ci
    return tuple(outs)


def apply_packed(
    packed_params,
    x,
    states: Tuple[jax.Array, ...],
    *,
    cfg: ModelConfig,
    g: int,
) -> tuple[jax.Array, Tuple[jax.Array, ...]]:
    """hybridnet.apply on packed tensors ([B', H, W, g*C] throughout).

    `x` may be a tuple of packed tensors whose group-aware concatenation
    forms the network input; in the fused-Pallas mode the concat never
    materializes (per-part weight slices instead)."""
    act = cfg.activation_function
    prec = cfg.precision
    _, act_fn = get_activation(act)

    use_pallas = (
        cfg.double_conv_mode == "pallas"
        and prec == "default"
        and act in ("prelu", "relu")
    )
    if use_pallas:
        from ..ops.pallas_unet import fused_double_conv, fused_supported

        interp = jax.default_backend() != "tpu"  # interpret off-TPU (tests)

    def dconv(p, *parts, post=None):
        if use_pallas:
            _, h_, w_, _ = parts[0].shape
            cins = [int(t.shape[-1]) for t in parts]
            cm, co = p["c1"]["w"].shape[3], p["c2"]["w"].shape[3]
            if fused_supported(h_, w_, cins, cm, co):
                w1s = (
                    _split_packed_rows(
                        p["c1"]["w"], [c // g for c in cins], g
                    )
                    if len(parts) > 1 else (p["c1"]["w"],)
                )
                fp = {
                    "c1": {"w": w1s, "b": p["c1"]["b"]},
                    "act": p.get("act", {}) if "a" in p.get("act", {}) else {},
                    "c2": p["c2"],
                }
                if post is not None:  # fold a trailing 1x1 conv (outc)
                    fp["post"] = post
                return fused_double_conv(fp, parts, interpret=interp)
        t = parts[0]
        for extra in parts[1:]:
            t = _gconcat(t, extra, g)
        h = conv2d(p["c1"], t, padding=1, precision=prec)
        h = act_fn(p["act"], h)
        h = conv2d(p["c2"], h, padding=1, precision=prec)
        if post is not None:
            h = conv2d(post, h, precision=prec)
        return h

    parts = tuple(x) if isinstance(x, (tuple, list)) else (x,)
    x = dconv(packed_params["inc"], *parts)
    inner_signals = []
    new_states = []
    for d in range(cfg.depth):
        blk = packed_params["enc"][d]
        if d < cfg.state_depth:
            out = dconv(blk["conv_signal"], x, states[d])
            new_states.append(dconv(blk["conv_state"], out, states[d]))
        else:
            out = dconv(blk["conv_signal"], x)
        inner_signals.append(out)
        x = conv2d(blk["down"], out, stride=2, padding=3, precision=prec)

    up = conv_transpose2d_subpixel if cfg.up_mode == "subpixel" else conv_transpose2d
    x = dconv(packed_params["decode"][-1], x)
    for d in range(cfg.depth - 1, 0, -1):
        x = up(packed_params["up"][d], x, stride=2, padding=3, precision=prec)
        x = dconv(packed_params["decode"][d], x, inner_signals[d])
    # last decoder level with the 1x1 outc head folded in
    x = up(packed_params["up"][0], x, stride=2, padding=3, precision=prec)
    out = dconv(packed_params["decode"][0], x, inner_signals[0],
                post=packed_params["outc"])
    return out, tuple(new_states)


RESIDUAL_SCALE = 1e3  # must match solvers/iterative.py

HIGHEST = jax.lax.Precision.HIGHEST


def laplacian_packed(op: SpectralPML, u: jax.Array, g: int) -> jax.Array:
    """Spectral PML Laplacian on packed fields [B', H, W, g*2].

    Same two dense per-axis complex matmuls as ops/spectral.laplacian_matmul,
    contracted against a [B', H, W, g, 2] view — the channel axis just got
    wider, the MXU shapes are unchanged (contraction over H/W)."""
    lead = u.shape[:-1]
    v = u.reshape(lead + (g, 2))

    def cmul(m_r, m_i, sub):
        pr = jnp.einsum(sub, m_r, v, precision=HIGHEST)
        pi = jnp.einsum(sub, m_i, v, precision=HIGHEST)
        re = pr[..., 0] - pi[..., 1]
        im = pr[..., 1] + pi[..., 0]
        return jnp.stack([re, im], axis=-1)

    ly = cmul(op.ay_r, op.ay_i, "hj,bjwgc->bhwgc")
    lx = cmul(op.ax_r, op.ax_i, "wj,bhjgc->bhwgc")
    return (lx + ly).reshape(lead + (g * 2,))


def residual_packed(
    op: SpectralPML, u: jax.Array, k_sq_p: jax.Array, source_p: jax.Array,
    g: int,
) -> jax.Array:
    """r = L u + k^2 u - s entirely in packed layout.

    u/source_p: [B', H, W, g*2]; k_sq_p: [B', H, W, g] (packed k^2)."""
    lead = u.shape[:-1]
    ku = (
        k_sq_p[..., None] * u.reshape(lead + (g, 2))
    ).reshape(lead + (g * 2,))
    return laplacian_packed(op, u, g) + ku - source_p


def rmse_packed(residual_p: jax.Array, g: int) -> jax.Array:
    """Per-problem residual RMSE from packed layout -> [B'*g] in the
    original batch order."""
    b, h, w, _ = residual_p.shape
    r = residual_p.reshape(b, h, w, g, 2)
    per = jnp.sqrt(jnp.mean(r**2, axis=(1, 2, 4)))  # [B', g]
    return per.reshape(b * g)


@functools.partial(
    jax.jit, static_argnames=("cfg", "g", "num_iterations", "collect")
)
def rollout_packed(
    params,
    op: SpectralPML,
    source: jax.Array,
    sos_maps: jax.Array,
    *,
    cfg: Config,
    g: int,
    num_iterations: int,
    collect: tuple = ("rmse",),
):
    """Inference rollout with the ENTIRE iteration channel-packed.

    Identical math to solvers.iterative.rollout (block-diagonal zeros are
    exact); requires batch % g == 0. Fields, residuals, k^2 and the spectral
    operator all run in the packed [B/g, H, W, g*C] layout — packing happens
    once at entry, unpacking once at exit; no per-iteration transposes.
    """
    b = sos_maps.shape[0]
    if b % g:
        raise ValueError(f"batch {b} must be divisible by pack group {g}")
    from ..ops.spectral import resolve_mode

    mode = resolve_mode(
        cfg.operator_mode, sos_maps.shape[-2], sos_maps.shape[-1]
    )
    if mode != "matmul":
        raise ValueError("rollout_packed supports the matmul operator only")
    mcfg = cfg.model
    packed = pack_params(params, g)
    k_sq, wavefield = get_initials(sos_maps, cfg.source.omega)
    wf_p = pack_batch(wavefield, g)
    k_sq_p = pack_batch(k_sq[..., None], g)
    src_p = pack_batch(source, g)
    res_p = residual_packed(op, wf_p, k_sq_p, src_p, g)
    dims = states_dimension(sos_maps.shape[1:3], mcfg.depth)
    states = tuple(
        jnp.zeros((b // g,) + dims[d] + (g * mcfg.state_channels,), sos_maps.dtype)
        for d in range(mcfg.state_depth)
    )
    # PML sigma channels, tiled per group: [H, W, g*2]
    sigmas_hwc = jnp.transpose(op.sigmas, (1, 2, 0))
    sig_p = jnp.broadcast_to(
        jnp.tile(sigmas_hwc, (1, 1, g))[None],
        (b // g,) + sigmas_hwc.shape[:2] + (g * 2,),
    )
    track_best = "best" in collect

    def body(carry, _):
        wf_p, res_p, states, best_wf, best_rmse = carry
        d_p, states = apply_packed(
            packed, (wf_p, RESIDUAL_SCALE * res_p, sig_p), states,
            cfg=mcfg, g=g,
        )
        wf_p = d_p / RESIDUAL_SCALE + wf_p
        res_p = residual_packed(op, wf_p, k_sq_p, src_p, g)
        rmse = rmse_packed(res_p, g)
        if track_best:
            better = rmse < best_rmse  # [b]; False for NaN
            lead = wf_p.shape[:-1]
            best_wf = jnp.where(
                better.reshape(b // g, 1, 1, g, 1),
                wf_p.reshape(lead + (g, 2)),
                best_wf.reshape(lead + (g, 2)),
            ).reshape(wf_p.shape)
            # NOT jnp.minimum: NaN from a diverging trajectory must not
            # poison the best-so-far
            best_rmse = jnp.where(better, rmse, best_rmse)
        ys = {"rmse": rmse} if "rmse" in collect else {}
        return (wf_p, res_p, states, best_wf, best_rmse), ys

    best0 = (wf_p, jnp.full((b,), jnp.inf, sos_maps.dtype))
    (wf_p, res_p, states, best_wf, best_rmse), ys = jax.lax.scan(
        body, (wf_p, res_p, states, *best0), None, length=num_iterations
    )
    out = {
        "wavefield": unpack_batch(wf_p, g),
        "residual": unpack_batch(res_p, g),
    }
    if track_best:
        out["best_wavefield"] = unpack_batch(best_wf, g)
        out["best_rmse"] = best_rmse
    out.update(ys)
    return out
