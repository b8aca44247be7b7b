"""Pixel-packed fused DoubleConv — filling MXU lanes with PIXELS.

The UNet's 3x3 convs have ~8 channels (ModelConfig.features): as XLA
lowers them, the MXU contraction is K = 3*3*Cin (~72 of 128 lanes) and
N = Cout (8 of 128 lanes) — ~27x padding waste that no batching fixes,
because batch can only fill M (weights are shared across the batch, so
block-diagonal channel packing just converts the N-padding into K-zeros;
see models/packed.py and PERF_NOTES.md).

This kernel fills the lanes with *pixels* instead. Layout: the plane is
flattened pixel-major and P=16 consecutive pixels share a packed row —
tensors are [H*W/16, 16*S] with lane = p*S + c (S = channel slot, padded
to 8). A 3x3 conv over a packed row needs the 3x18-pixel input union,
which lives in exactly FOUR 128-lane-aligned K-blocks:

    [ A(dy=-1) | A(dy=0) | A(dy=+1) | E ]

where A(dy) is the window sublane-rolled by dy*(W/16) packed rows (the
16 aligned pixels of each neighbor image row) and E packs the 6 edge
pixels (j = -1 and j = 16 for each dy, built with one more sublane roll
+ a static lane roll each). The weight matrix [K, 16*Smid] is banded
block-Toeplitz over the pixel index (built host-side with eye(P, k=-dx)
kroneckers), so ONE [rows, K] x [K, 128] MXU matmul computes all nine
taps for 16 pixels x Cmid channels — K = 512 (Cin<=8) or 896 (Cin<=16)
with 72*Cin/8 real lanes per output: ~2.3-4x fewer padded FLOPs than the
XLA lowering, with both matmul operands resident in VMEM (no im2col in
HBM, no intermediate round trip).

Boundary handling is mask-based: a 2D iota over (global packed row,
lane) kills contributions whose source pixel falls outside the plane
(top/bottom image rows for the dy rolls, left/right image columns for
the E block — an edge pixel is only invalid in the first/last 16-pixel
block of its row). Overlapped tiling over packed rows (halo = 2*W/16+2
rounded to sublanes) keeps every consumed window row valid, exactly as
in ops/pallas_unet.py.

Precision matches the bf16 'default' policy of the XLA path: assembly
and PReLU in f32 (Mosaic rolls need 32-bit data), bf16 casts at each
dot, f32 accumulation.

Replaces the per-iteration conv-stack cost of the reference
hybridnet.py:558-584 at the unpacked bench shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 16  # pixels per packed row: P * 8-channel slot = one 128-lane tile

_VMEM_BUDGET = 8 * 2**20


def _pad8(c: int) -> int:
    return ((c + 7) // 8) * 8


def _halo_rows(wpr: int) -> int:
    """Dependence radius of two chained 3x3 convs in packed rows
    (each conv reaches dy*wpr ± 1 rows), rounded to sublane (8)."""
    return ((2 * wpr + 2 + 7) // 8) * 8


def _assemble(x, gr, wpr: int, S: int, n_rows: int):
    """[rows, 16*S] window -> [rows, 3*16*S + 128] conv patch.

    gr: [rows, 1] int32 global packed-row index; wpr = W/16 packed rows
    per image row; n_rows = H. Lane blocks: A(dy=-1)|A(0)|A(+1)|E with
    E lanes (2*dy_i + side)*S .. +S holding the left/right edge pixels.
    """
    rows, lanes = x.shape
    img = gr // wpr
    blk = gr - img * wpr
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    blocks = []
    e_wide = jnp.zeros_like(x)
    for i, dy in enumerate((-1, 0, 1)):
        A = pltpu.roll(x, (-dy * wpr) % rows, 0) if dy else x
        rowok = (img + dy >= 0) & (img + dy < n_rows)  # [rows, 1]
        blocks.append(jnp.where(rowok, A, 0.0))
        # left edge (j=-1): pixel 15 of the previous packed row of A;
        # invalid in the first block of an image row (column -1)
        lsrc = pltpu.roll(A, 1, 0)
        ldest = 2 * i * S
        lsh = (ldest - 15 * S) % lanes
        lrolled = pltpu.roll(lsrc, lsh, 1) if lsh else lsrc
        lok = rowok & (blk > 0) & (lane >= ldest) & (lane < ldest + S)
        e_wide = e_wide + jnp.where(lok, lrolled, 0.0)
        # right edge (j=16): pixel 0 of the next packed row of A
        rsrc = pltpu.roll(A, rows - 1, 0)
        rdest = (2 * i + 1) * S
        rsh = rdest % lanes
        rrolled = pltpu.roll(rsrc, rsh, 1) if rsh else rsrc
        rok = rowok & (blk < wpr - 1) & (lane >= rdest) & (lane < rdest + S)
        e_wide = e_wide + jnp.where(rok, rrolled, 0.0)
    return jnp.concatenate(blocks + [e_wide[:, :128]], axis=1)


def _pack_w_conv(w, S_in: int, S_out: int):
    """[3, 3, cin, cout] -> [3*16*S_in + 128, 16*S_out] banded
    block-Toeplitz weight matching `_assemble`'s K layout."""
    cin, cout = w.shape[2], w.shape[3]
    wp = jnp.pad(
        w.astype(jnp.float32),
        ((0, 0), (0, 0), (0, S_in - cin), (0, S_out - cout)),
    )
    blocks = []
    for dy_i in range(3):
        blk = jnp.zeros((P * S_in, P * S_out), jnp.float32)
        for dx_i, dx in enumerate((-1, 0, 1)):
            eye = jnp.eye(P, k=-dx, dtype=jnp.float32)
            blk = blk + jnp.einsum(
                "io,pq->piqo", wp[dy_i, dx_i], eye
            ).reshape(P * S_in, P * S_out)
        blocks.append(blk)
    edge = jnp.zeros((128, P * S_out), jnp.float32)
    for dy_i in range(3):
        lq = 2 * dy_i * S_in
        edge = edge.at[lq : lq + S_in, 0:S_out].set(wp[dy_i, 0])
        rq = (2 * dy_i + 1) * S_in
        edge = edge.at[rq : rq + S_in, 15 * S_out : 16 * S_out].set(
            wp[dy_i, 2]
        )
    return jnp.concatenate(blocks + [edge], axis=0)


def _pack_w_1x1(w, S_in: int, S_out: int):
    """[cin, cout] -> [16*S_in, 16*S_out] pixel-block-diagonal weight."""
    cin, cout = w.shape
    wp = jnp.pad(
        w.astype(jnp.float32), ((0, S_in - cin), (0, S_out - cout))
    )
    return jnp.einsum(
        "io,pq->piqo", wp, jnp.eye(P, dtype=jnp.float32)
    ).reshape(P * S_in, P * S_out)


def _tile_b(bias, S: int):
    """[c] -> [1, 16*S] per-pixel-slot bias row."""
    c = bias.shape[0]
    return jnp.tile(jnp.pad(bias, (0, S - c)), P).reshape(1, P * S)


def _kernel(H, wpr, hw16, tile, halo, S_in, S_mid, S_2, has_post, *refs):
    """refs: [x_hbm, w1, b1, w2, b2, (w3, b3,) slope, out, xw, acc, sem]."""
    x_hbm, w1_ref, b1_ref, w2_ref, b2_ref = refs[:5]
    k = 5
    if has_post:
        w3_ref, b3_ref = refs[k : k + 2]
        k += 2
    slope_ref, out_ref, xw_ref, acc_ref, sem = refs[k : k + 5]

    b_idx = pl.program_id(0)
    t_idx = pl.program_id(1)
    win = tile + 2 * halo

    if halo == 0:  # whole plane in one window; masks handle boundaries
        s0 = 0
        copy = pltpu.make_async_copy(x_hbm.at[b_idx], xw_ref, sem)
    else:
        s0 = pl.multiple_of(
            jnp.clip(t_idx * tile - halo, 0, hw16 - win), 8
        )
        copy = pltpu.make_async_copy(
            x_hbm.at[b_idx].at[pl.ds(s0, win)], xw_ref, sem
        )
    copy.start()
    copy.wait()

    gr = s0 + jax.lax.broadcasted_iota(jnp.int32, (win, 1), 0)
    p1 = _assemble(xw_ref[:], gr, wpr, S_in, H)
    h1 = jax.lax.dot_general(
        p1.astype(jnp.bfloat16), w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:]
    slope = slope_ref[0]
    h1 = jnp.maximum(h1, 0.0) + slope * jnp.minimum(h1, 0.0)

    p2 = _assemble(h1, gr, wpr, S_mid, H)
    h2 = jax.lax.dot_general(
        p2.astype(jnp.bfloat16), w2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[:]

    if has_post:  # fused trailing 1x1 conv (the UNet's outc head)
        h2 = jax.lax.dot_general(
            h2.astype(jnp.bfloat16), w3_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b3_ref[:]

    if halo == 0:
        out_ref[0] = h2
    else:
        acc_ref[:] = h2
        off = pl.multiple_of(t_idx * tile - s0, 8)
        out_ref[0] = acc_ref[pl.ds(off, tile)]


def _vmem_estimate(tile, halo, S_in, S_mid, S_2):
    win = tile + 2 * halo
    k1 = 3 * P * S_in + 128
    k2 = 3 * P * S_mid + 128
    return (
        win * P * S_in * 4          # x window (f32)
        + win * k1 * 6              # patch1 f32 + bf16
        + win * P * S_mid * 4       # h1
        + win * k2 * 6              # patch2 f32 + bf16
        + win * P * S_2 * 4 * 2     # h2 + emit scratch
        + tile * P * S_2 * 4 * 2    # double-buffered out block
        + (k1 * P * S_mid + k2 * P * S_2) * 2
    )


def _pick_tile(hw16: int, wpr: int, S_in: int, S_mid: int, S_2: int):
    halo = _halo_rows(wpr)
    for n_tiles in (1, 2, 4, 8, 16, 32, 64):
        if hw16 % (n_tiles * 8):
            continue
        t = hw16 // n_tiles
        h = 0 if n_tiles == 1 else halo
        if t > 2 * h and _vmem_estimate(t, h, S_in, S_mid, S_2) < _VMEM_BUDGET:
            return t, h
    return None, None


def pix_supported(height: int, width: int, cin, cmid: int,
                  cout: int, c_emit: int | None = None) -> bool:
    """True when the pixel-packed fused kernel handles these shapes.
    `cin` may be a sequence of per-input channel counts (concatenated)."""
    csum = cin if isinstance(cin, int) else sum(cin)
    c_emit = cout if c_emit is None else c_emit
    if width % P or (height * width // P) % 8:
        return False
    if not (0 < csum <= 16 and 0 < cmid <= 16 and 0 < cout <= 16
            and 0 < c_emit <= 16):
        return False  # edge block (6 slots) must fit one 128-lane tile
    t, _ = _pick_tile(height * width // P, width // P, _pad8(csum),
                      _pad8(cmid), _pad8(max(cout, c_emit)))
    return t is not None


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_double_conv_pix(params, x, *, interpret: bool = False):
    """DoubleConv (conv3x3 -> PReLU -> conv3x3, optional 1x1 head) as one
    pixel-packed Pallas kernel. Same params schema as
    ops/pallas_unet.fused_double_conv; x may be a tuple of parts whose
    channel concatenation feeds the first conv."""
    xs = x if isinstance(x, (tuple, list)) else (x,)
    w1 = params["c1"]["w"]
    w1s = tuple(w1) if isinstance(w1, (tuple, list)) else (w1,)
    b1 = params["c1"]["b"]
    w2, b2 = params["c2"]["w"], params["c2"]["b"]
    post = params.get("post")
    b, height, width = xs[0].shape[:3]
    cins = tuple(int(t.shape[3]) for t in xs)
    csum = sum(cins)
    cmid, cout = w1s[0].shape[3], w2.shape[3]
    c_emit = post["w"].shape[3] if post else cout
    S_in, S_mid = _pad8(csum), _pad8(cmid)
    S_2 = _pad8(c_emit if post else cout)
    S_cout = _pad8(cout)
    hw16, wpr = height * width // P, width // P

    tile, halo = _pick_tile(hw16, wpr, S_in, S_mid, max(S_2, S_cout))
    if tile is None:
        raise ValueError(f"no pixel-packed tiling for {[t.shape for t in xs]}")
    n_tiles = hw16 // tile
    win = tile + 2 * halo

    xcat = (
        xs[0] if len(xs) == 1
        else jnp.concatenate(xs, axis=-1)
    ).astype(jnp.float32)
    x_flat = jnp.pad(
        xcat, ((0, 0), (0, 0), (0, 0), (0, S_in - csum))
    ).reshape(b, hw16, P * S_in)

    w1cat = w1s[0] if len(w1s) == 1 else jnp.concatenate(w1s, axis=2)
    w1p = _pack_w_conv(w1cat, S_in, S_mid).astype(jnp.bfloat16)
    w2p = _pack_w_conv(w2, S_mid, S_cout).astype(jnp.bfloat16)
    b1t = _tile_b(b1, S_mid)
    b2t = _tile_b(b2, S_cout)
    act = params.get("act", {})
    a = act.get("a") if isinstance(act, dict) else None
    slope = (jnp.zeros((1,), jnp.float32) if a is None
             else jnp.asarray(a, jnp.float32).reshape(1))

    post_args, post_specs = (), []
    if post:
        w3p = _pack_w_1x1(post["w"].reshape(cout, c_emit), S_cout,
                          S_2).astype(jnp.bfloat16)
        post_args = (w3p, _tile_b(post["b"], S_2))
        post_specs = [
            pl.BlockSpec((P * S_cout, P * S_2), lambda bi, ti: (0, 0)),
            pl.BlockSpec((1, P * S_2), lambda bi, ti: (0, 0)),
        ]
    k1 = 3 * P * S_in + 128
    k2 = 3 * P * S_mid + 128
    kernel = functools.partial(
        _kernel, height, wpr, hw16, tile, halo, S_in, S_mid, S_2, bool(post)
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=(
            [
                pl.BlockSpec(memory_space=pl.ANY),  # input stays in HBM
                pl.BlockSpec((k1, P * S_mid), lambda bi, ti: (0, 0)),
                pl.BlockSpec((1, P * S_mid), lambda bi, ti: (0, 0)),
                pl.BlockSpec((k2, P * S_cout), lambda bi, ti: (0, 0)),
                pl.BlockSpec((1, P * S_cout), lambda bi, ti: (0, 0)),
            ]
            + post_specs
            + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        ),
        out_specs=pl.BlockSpec((1, tile, P * S_2), lambda bi, ti: (bi, ti, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hw16, P * S_2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((win, P * S_in), jnp.float32),
            pltpu.VMEM((win, P * S_2), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x_flat, w1p, b1t, w2p, b2t, *post_args, slope)
    out = out.reshape(b, hw16, P, S_2)[..., :c_emit]
    return out.reshape(b, height, width, c_emit)
