"""Fused DoubleConv Pallas kernel — conv3x3 -> PReLU -> conv3x3 in VMEM.

The packed UNet's hot layers are DoubleConvs on [B', H, W, g*C] tensors
(models/packed.py). XLA runs them as two conv ops with an HBM round trip
for the intermediate and a weight re-read per op. This kernel keeps both
weight tensors and the intermediate activation resident in VMEM and
issues the 18 tap-matmuls back to back.

Layout trick: the plane is flattened to [H*W, C] (C = lanes, H*W =
sublanes). A 3x3 tap shift (dy, dx) becomes ONE sublane roll by
dy*W + dx; out-of-range taps are killed by an iota-derived validity mask
(a wrapped column ⟺ (w + dx) outside [0, W)). Every matmul is then a
plain 2D [rows, Cin] x [Cin, Cout] MXU contraction — no im2col, no
layout change between the two convs.

Tiling: the input plane stays in HBM; each grid step DMAs an overlapping
row window [T + 2P, Cin] (P ≥ 2W+2 rows of halo so the intermediate's
halo is recomputed locally — overlapped tiling), computes the full
DoubleConv for its T output rows, and writes one disjoint output block.
Window rows whose tap rolls wrap are provably never consumed: consumed
intermediate rows lie ≥ P-W-1 ≥ W+1 rows inside the window, and the
global masks exclude plane-boundary wraps.

Compute follows the bf16 'default' precision policy of the XLA path:
bf16 tap inputs, f32 accumulation (`preferred_element_type`), PReLU in
f32, bf16 re-cast for the second conv, f32 output. Windows and the
intermediate are HELD in f32, cast to bf16 per tap at the dot: Mosaic's
dynamic_rotate (the lowering of `pltpu.roll`) only supports 32-bit
element types, so rolling must happen before the bf16 cast.

Replaces the per-iteration conv-stack cost of the reference
hybridnet.py:558-584; see PERF_NOTES.md (round-2 conv levers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TAPS = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))

_VMEM_BUDGET = 10 * 2**20  # leave headroom below the ~16 MB/core VMEM


def _halo_rows(width: int) -> int:
    """Halo P ≥ 2W + 2 rounded to sublane (8) alignment."""
    return ((2 * width + 2 + 7) // 8) * 8


def _pad128(c: int) -> int:
    """Mosaic memref slices need 128-aligned lane extents; channel dims
    are zero-padded up front (free on the MXU: K-tile count unchanged)."""
    return ((c + 127) // 128) * 128


def _conv_taps(x_f32, w_flat, base, width: int, hw: int, cin: int):
    """Sum of 9 masked tap matmuls over the full window.

    x_f32: [win, cin] f32 window (rolled in f32 — Mosaic dynamic_rotate
    needs 32-bit data — then cast to bf16 at the dot); base: [win, 1]
    int32 global row index of each window row; w_flat: [9*cin, cout] bf16
    tap-major. Window rows whose rolls wrap produce garbage — by
    construction (halo ≥ 2W+2) those rows are never inside the emitted
    output slice.
    """
    win = x_f32.shape[0]
    gi = base
    col = gi - (gi // width) * width
    acc = None
    for t, (dy, dx) in enumerate(TAPS):
        delta = dy * width + dx
        rolled = pltpu.roll(x_f32, (-delta) % win, 0) if delta else x_f32
        j2 = gi + delta
        mask = (j2 >= 0) & (j2 < hw) & (col + dx >= 0) & (col + dx < width)
        tap_in = jnp.where(mask, rolled, 0.0).astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            tap_in, w_flat[t * cin : (t + 1) * cin, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part
    return acc


def _kernel(width, hw, tile_t, halo, cin, cmid, has_post, *refs):
    """refs layout: [x_hbm, w1, b1, w2, b2, (w3, b3,) slope,
    out, xw_scratch, mid, acc, sem]."""
    x_hbm, w1_ref, b1_ref, w2_ref, b2_ref = refs[:5]
    k = 5
    if has_post:
        w3_ref, b3_ref = refs[k : k + 2]
        k += 2
    slope_ref, out_ref = refs[k : k + 2]
    xw_ref, mid_ref, acc_ref, sem = refs[k + 2 : k + 6]

    b_idx = pl.program_id(0)
    t_idx = pl.program_id(1)
    win = tile_t + 2 * halo

    if halo == 0:  # single tile == whole plane; masks handle everything
        s0 = 0
        copy = pltpu.make_async_copy(x_hbm.at[b_idx], xw_ref, sem)
    else:
        s0 = pl.multiple_of(
            jnp.clip(t_idx * tile_t - halo, 0, hw - win), 8
        )
        copy = pltpu.make_async_copy(
            x_hbm.at[b_idx].at[pl.ds(s0, win)], xw_ref, sem
        )
    copy.start()
    copy.wait()

    base = s0 + jax.lax.broadcasted_iota(jnp.int32, (win, 1), 0)
    h1 = _conv_taps(xw_ref[:], w1_ref[:], base, width, hw, cin)
    h1 = h1 + b1_ref[:]
    slope = slope_ref[0]
    h1 = jnp.maximum(h1, 0.0) + slope * jnp.minimum(h1, 0.0)
    mid_ref[:] = h1  # f32: the second conv's rolls need 32-bit data too

    h2 = _conv_taps(mid_ref[:], w2_ref[:], base, width, hw, cmid)

    def post(v):  # optional fused 1x1 conv (the UNet's outc head)
        if not has_post:
            return v
        return jax.lax.dot_general(
            v.astype(jnp.bfloat16), w3_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b3_ref[:]

    if halo == 0:
        out_ref[0] = post(h2 + b2_ref[:])
    else:
        # emit only this tile's rows (8-aligned dynamic ref slice)
        acc_ref[:] = h2 + b2_ref[:]
        off = pl.multiple_of(t_idx * tile_t - s0, 8)
        out_ref[0] = post(acc_ref[pl.ds(off, tile_t)])


def _pick_tile(hw: int, width: int, cin, cmid: int, cout: int):
    """Largest tile T (divisor of HW, multiple of 8) within VMEM budget.
    `cin` may be an int or a sequence of per-input channel counts (the
    parts are concatenated host-side into one 128-padded input);
    channel dims are costed at their 128-padded (lane-tiled) widths."""
    cin = cin if isinstance(cin, int) else sum(cin)
    cin, cout = _pad128(cin), _pad128(cout)
    halo = _halo_rows(width)
    for n_tiles in (1, 2, 4, 8, 16, 32, 64):
        if hw % (n_tiles * 8):
            continue
        t = hw // n_tiles
        h = 0 if n_tiles == 1 else halo
        if _vmem_estimate(t, h, cin, cmid, cout) < _VMEM_BUDGET:
            return t, h
    return None, None


def _vmem_estimate(tile_t, halo, cin, cmid, cout):
    win = tile_t + 2 * halo
    return (
        win * cin * 4            # x window (f32 — rolls need 32-bit)
        + win * cmid * (4 + 4)   # mid scratch (f32) + f32 accumulator
        + win * max(cin, cmid) * 6  # rolled f32 + bf16 tap transient
        + win * cout * 4         # full-window conv2 accumulator scratch
        + tile_t * cout * 4 * 2  # double-buffered out block
        + 9 * (cin * cmid + cmid * cout) * 2
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_double_conv(params, x, *, interpret: bool = False):
    """DoubleConv (conv3x3 -> PReLU -> conv3x3, padding 1) as one kernel.

    params: {"c1": {"w": [3,3,Cin,Cmid] or tuple of [3,3,ci,Cmid],
                    "b": [Cmid]},
             "act": {"a": [1]} (PReLU slope; empty/missing -> ReLU),
             "c2": {"w": [3,3,Cmid,Cout], "b": [Cout]}}
    x: [B, H, W, Cin] float32, or a tuple of [B, H, W, ci] whose channel
    CONCATENATION feeds the first conv; the concat is materialized once
    in HBM (fused into the producers by XLA) and the per-part weight row
    slices are concatenated to match. Returns [B, H, W, Cout] float32.
    """
    xs = x if isinstance(x, (tuple, list)) else (x,)
    w1 = params["c1"]["w"]
    w1s = tuple(w1) if isinstance(w1, (tuple, list)) else (w1,)
    if len(w1s) != len(xs):
        raise ValueError("one c1 weight slice per input required")
    b1 = params["c1"]["b"]
    w2, b2 = params["c2"]["w"], params["c2"]["b"]
    post = params.get("post")  # optional fused trailing 1x1 conv
    b, height, width = xs[0].shape[:3]
    cins_raw = tuple(int(t.shape[3]) for t in xs)
    csum = sum(cins_raw)
    cin = _pad128(csum)  # lane-aligned input width (single concat buffer)
    cmid, cout_raw = w1s[0].shape[3], w2.shape[3]
    c_emit_raw = post["w"].shape[3] if post else cout_raw
    c_emit = _pad128(c_emit_raw)  # out blocks are lane-sliced too
    cout = cout_raw if post else c_emit
    hw = height * width

    tile_t, halo = _pick_tile(hw, width, csum, cmid, cout_raw)
    if tile_t is None:
        raise ValueError(f"no VMEM-feasible tiling for {[t.shape for t in xs]}")
    n_tiles = hw // tile_t
    win = tile_t + 2 * halo

    # Concatenate the parts once in HBM (XLA fuses this into the
    # producers) and pad to the lane tile: one window DMA per grid step
    # instead of one per part, and the padded copies the multi-buffer
    # variant made are gone.
    xcat = (
        xs[0].reshape(b, hw, csum)
        if len(xs) == 1
        else jnp.concatenate(
            [t.reshape(b, hw, c) for t, c in zip(xs, cins_raw)], axis=-1
        )
    )
    x_flat = jnp.pad(
        xcat.astype(jnp.float32), ((0, 0), (0, 0), (0, cin - csum))
    )
    # per-part weight rows concatenated along the input-channel dim match
    # the plain (non-group-aware) input concat above
    w1cat = (
        w1s[0] if len(w1s) == 1 else jnp.concatenate(w1s, axis=2)
    )
    w1_flat = (
        jnp.pad(w1cat, ((0, 0), (0, 0), (0, cin - csum), (0, 0)))
        .reshape(9 * cin, cmid).astype(jnp.bfloat16)
    )
    w2_flat = jnp.pad(
        w2, ((0, 0), (0, 0), (0, 0), (0, cout - cout_raw))
    ).reshape(9 * cmid, cout).astype(jnp.bfloat16)
    b2 = jnp.pad(b2, (0, cout - cout_raw))
    act = params.get("act", {})
    a = act.get("a") if isinstance(act, dict) else None
    slope = (jnp.zeros((1,), jnp.float32) if a is None
             else jnp.asarray(a, jnp.float32).reshape(1))

    post_args, post_specs = (), []
    if post:
        post_args = (
            jnp.pad(post["w"].reshape(cout, c_emit_raw),
                    ((0, 0), (0, c_emit - c_emit_raw))).astype(jnp.bfloat16),
            jnp.pad(post["b"].reshape(1, c_emit_raw),
                    ((0, 0), (0, c_emit - c_emit_raw))),
        )
        post_specs = [
            pl.BlockSpec((cout, c_emit), lambda bi, ti: (0, 0)),
            pl.BlockSpec((1, c_emit), lambda bi, ti: (0, 0)),
        ]
    kernel = functools.partial(_kernel, width, hw, tile_t, halo, cin, cmid,
                               bool(post))
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=(
            [
                pl.BlockSpec(memory_space=pl.ANY),  # input stays in HBM
                pl.BlockSpec((9 * cin, cmid), lambda bi, ti: (0, 0)),
                pl.BlockSpec((1, cmid), lambda bi, ti: (0, 0)),
                pl.BlockSpec((9 * cmid, cout), lambda bi, ti: (0, 0)),
                pl.BlockSpec((1, cout), lambda bi, ti: (0, 0)),
            ]
            + post_specs
            + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        ),
        out_specs=pl.BlockSpec((1, tile_t, c_emit),
                               lambda bi, ti: (bi, ti, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hw, c_emit), jnp.float32),
        scratch_shapes=(
            [
                pltpu.VMEM((win, cin), jnp.float32),
                pltpu.VMEM((win, cmid), jnp.float32),
                pltpu.VMEM((win, cout), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ]
        ),
        interpret=interpret,
    )(x_flat, w1_flat, b1.reshape(1, cmid), w2_flat,
      b2.reshape(1, cout), *post_args, slope)
    return out[..., :c_emit_raw].reshape(b, height, width, c_emit_raw)


def fused_supported(height: int, width: int, cin, cmid: int,
                    cout: int) -> bool:
    """True when a VMEM-feasible tiling exists for the fused kernel.
    `cin` may be an int or a sequence of per-input channel counts."""
    t, _ = _pick_tile(height * width, width, cin, cmid, cout)
    return t is not None
