"""Pallas TPU kernel: fused PML-Helmholtz stencil residual (DIA SpMV).

The 9-point stencil operator (ops/stencil.py) is a sparse matrix in DIA
(diagonal) storage: 2*(2r+1) complex diagonals whose values vary only along
their own axis. This kernel computes the fused

    r = L u + k^2 u - s

in ONE pass over HBM: reads u (re/im), k_sq, s (re/im); writes r (re/im) —
the arithmetic (~70 flops/point on the VPU) rides under the memory traffic,
so the kernel runs at HBM speed-of-light, unlike the matmul spectral form
whose cost grows O(N) per point. Periodic wrap uses `pltpu.roll` (circular
lane/sublane shifts), matching the spectral operator's topology.

Layout: fields are SPLIT planes [B, H, W] f32 (re and im as separate
arrays) so the kernel's last dimension is W (lanes), not the channel pair.
Wrappers convert from the framework's channel-pair convention.

Used for: domain-decomposed residuals (per-shard local kernel), the GMRES
stencil path, and as the `gridpoints/s/chip` bench kernel (BASELINE.json).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import StencilPML


def _residual_kernel(radius: int,
                     cxr_ref, cxi_ref, cyr_ref, cyi_ref,
                     ur_ref, ui_ref, ksq_ref, sr_ref, si_ref,
                     rr_ref, ri_ref):
    """One batch element: fused stencil + k^2 u - s on an [H, W] block."""
    ur = ur_ref[:]
    ui = ui_ref[:]
    acc_r = ksq_ref[:] * ur - sr_ref[:]
    acc_i = ksq_ref[:] * ui - si_ref[:]
    h, w = ur.shape
    ntaps = 2 * radius + 1
    for t in range(ntaps):
        off = t - radius
        # pltpu.roll requires non-negative shifts; -off mod n is equivalent
        sx = (-off) % w
        sy = (-off) % h
        # x axis: shift along lanes (axis 1); coefficient varies along W
        uxr = pltpu.roll(ur, sx, 1)
        uxi = pltpu.roll(ui, sx, 1)
        cxr = cxr_ref[t, :]
        cxi = cxi_ref[t, :]
        acc_r += cxr * uxr - cxi * uxi
        acc_i += cxr * uxi + cxi * uxr
        # y axis: shift along sublanes (axis 0); coefficient varies along H
        uyr = pltpu.roll(ur, sy, 0)
        uyi = pltpu.roll(ui, sy, 0)
        cyr = cyr_ref[t, :]
        cyi = cyi_ref[t, :]
        acc_r += cyr[:, None] * uyr - cyi[:, None] * uyi
        acc_i += cyr[:, None] * uyi + cyi[:, None] * uyr
    rr_ref[:] = acc_r
    ri_ref[:] = acc_i


_HALO = 8  # sublane-aligned halo band (>= stencil radius)


def _residual_kernel_tiled(radius: int, tile_h: int,
                           cxr_ref, cxi_ref, cyr_ref, cyi_ref,
                           ur_hbm, ui_hbm, ksq_ref, sr_ref, si_ref,
                           rr_ref, ri_ref,
                           ur_pad, ui_pad, sems):
    """Row-tiled variant for large grids: u stays in HBM; each grid step
    DMAs a [tile_h + 2r, W] window (with periodic row wrap) into VMEM."""
    b_idx = pl.program_id(0)
    i = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    h = n_tiles * tile_h
    r = radius
    # halo band of HALO rows per side keeps every DMA/slice sublane-aligned
    halo = _HALO
    pad_h = tile_h + 2 * halo

    def load(dst, src_plane, sem):
        start = pl.multiple_of(i * tile_h - halo, 8)

        @pl.when(i == 0)
        def _():
            top = pltpu.make_async_copy(
                src_plane.at[pl.ds(h - halo, halo)], dst.at[pl.ds(0, halo)], sem
            )
            top.start()
            main = pltpu.make_async_copy(
                src_plane.at[pl.ds(0, tile_h + halo)],
                dst.at[pl.ds(halo, tile_h + halo)], sem,
            )
            main.start()
            top.wait()
            main.wait()

        @pl.when((i > 0) & (i < n_tiles - 1))
        def _():
            main = pltpu.make_async_copy(
                src_plane.at[pl.ds(start, pad_h)], dst, sem
            )
            main.start()
            main.wait()

        @pl.when(i == n_tiles - 1)
        def _():
            main = pltpu.make_async_copy(
                src_plane.at[pl.ds(start, tile_h + halo)],
                dst.at[pl.ds(0, tile_h + halo)], sem,
            )
            main.start()
            bot = pltpu.make_async_copy(
                src_plane.at[pl.ds(0, halo)], dst.at[pl.ds(tile_h + halo, halo)],
                sem,
            )
            bot.start()
            main.wait()
            bot.wait()

    load(ur_pad, ur_hbm.at[b_idx], sems.at[0])
    load(ui_pad, ui_hbm.at[b_idx], sems.at[1])

    upr = ur_pad[:]
    upi = ui_pad[:]
    ur = upr[halo : halo + tile_h, :]
    ui = upi[halo : halo + tile_h, :]
    acc_r = ksq_ref[0] * ur - sr_ref[0]
    acc_i = ksq_ref[0] * ui - si_ref[0]
    w = ur.shape[1]
    ntaps = 2 * r + 1
    row0 = i * tile_h
    for t in range(ntaps):
        off = t - r
        sx = (-off) % w
        uxr = pltpu.roll(ur, sx, 1)
        uxi = pltpu.roll(ui, sx, 1)
        cxr = cxr_ref[t, :]
        cxi = cxi_ref[t, :]
        acc_r += cxr * uxr - cxi * uxi
        acc_i += cxr * uxi + cxi * uxr
        # y taps read shifted rows from the padded block (static offsets)
        uyr = upr[halo + off : halo + off + tile_h, :]
        uyi = upi[halo + off : halo + off + tile_h, :]
        cyr = cyr_ref[t, pl.ds(row0, tile_h)]
        cyi = cyi_ref[t, pl.ds(row0, tile_h)]
        acc_r += cyr[:, None] * uyr - cyi[:, None] * uyi
        acc_i += cyr[:, None] * uyi + cyi[:, None] * uyr
    rr_ref[0] = acc_r
    ri_ref[0] = acc_i


@functools.partial(jax.jit, static_argnames=("interpret", "tile_h"))
def residual_planes_tiled(
    op: StencilPML,
    u_re: jax.Array,
    u_im: jax.Array,
    k_sq: jax.Array,
    s_re: jax.Array,
    s_im: jax.Array,
    *,
    tile_h: int = 128,
    interpret: bool = False,
):
    """Row-tiled fused stencil residual for large grids [B, H, W]."""
    b, h, w = u_re.shape
    if h % tile_h != 0:
        raise ValueError(f"H={h} must be divisible by tile_h={tile_h}")
    if h == tile_h:
        # single tile: the halo DMAs would read out of bounds; the
        # whole-plane kernel covers this case with identical VMEM needs
        return residual_planes(op, u_re, u_im, k_sq, s_re, s_im,
                               interpret=interpret)
    r = op.radius
    ntaps = 2 * r + 1
    n_tiles = h // tile_h
    coeff_x = pl.BlockSpec((ntaps, w), lambda b_, i: (0, 0),
                           memory_space=pltpu.VMEM)
    coeff_y = pl.BlockSpec((ntaps, h), lambda b_, i: (0, 0),
                           memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((1, tile_h, w), lambda b_, i: (b_, i, 0),
                        memory_space=pltpu.VMEM)
    whole = pl.BlockSpec(memory_space=pl.ANY)

    kernel = functools.partial(_residual_kernel_tiled, r, tile_h)
    out_shape = jax.ShapeDtypeStruct((b, h, w), u_re.dtype)
    rr, ri = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[coeff_x, coeff_x, coeff_y, coeff_y,
                  whole, whole, tile, tile, tile],
        out_specs=(tile, tile),
        out_shape=(out_shape, out_shape),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * _HALO, w), u_re.dtype),
            pltpu.VMEM((tile_h + 2 * _HALO, w), u_re.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(op.cx_r, op.cx_i, op.cy_r, op.cy_i, u_re, u_im, k_sq, s_re, s_im)
    return rr, ri


@functools.partial(jax.jit, static_argnames=("interpret",))
def residual_planes(
    op: StencilPML,
    u_re: jax.Array,
    u_im: jax.Array,
    k_sq: jax.Array,
    s_re: jax.Array,
    s_im: jax.Array,
    *,
    interpret: bool = False,
):
    """Fused stencil residual on split planes [B, H, W] -> (r_re, r_im)."""
    b, h, w = u_re.shape
    r = op.radius
    ntaps = 2 * r + 1
    coeff_x = pl.BlockSpec((ntaps, w), lambda i: (0, 0), memory_space=pltpu.VMEM)
    coeff_y = pl.BlockSpec((ntaps, h), lambda i: (0, 0), memory_space=pltpu.VMEM)
    plane = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def kernel(cxr, cxi, cyr, cyi, ur, ui, ksq, sr, si, rr, ri):
        _residual_kernel(
            r, cxr, cxi, cyr, cyi,
            ur.at[0], ui.at[0], ksq.at[0], sr.at[0], si.at[0],
            rr.at[0], ri.at[0],
        )

    out_shape = jax.ShapeDtypeStruct((b, h, w), u_re.dtype)
    rr, ri = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[coeff_x, coeff_x, coeff_y, coeff_y,
                  plane, plane, plane, plane, plane],
        out_specs=(plane, plane),
        out_shape=(out_shape, out_shape),
        interpret=interpret,
    )(op.cx_r, op.cx_i, op.cy_r, op.cy_i, u_re, u_im, k_sq, s_re, s_im)
    return rr, ri


_WHOLE_PLANE_VMEM_BUDGET = 10_000_000  # bytes; 7 f32 planes double-buffered


def helmholtz_residual_pallas(
    op: StencilPML,
    u: jax.Array,
    k_sq: jax.Array,
    source: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Channel-pair wrapper: u, source [B, H, W, 2]; k_sq [B, H, W].

    Dispatches to whole-plane blocks for small grids or the row-tiled
    manual-DMA kernel for large ones (VMEM budget)."""
    h, w = u.shape[-3], u.shape[-2]
    args = (op, u[..., 0], u[..., 1], k_sq, source[..., 0], source[..., 1])
    if h * w * 4 * 7 * 2 <= _WHOLE_PLANE_VMEM_BUDGET or h % 128 != 0:
        rr, ri = residual_planes(*args, interpret=interpret)
    else:
        rr, ri = residual_planes_tiled(*args, tile_h=128, interpret=interpret)
    return jnp.stack([rr, ri], axis=-1)


# ---------------------------------------------------------------------------
# Sparse-matrix views of the same operator (for CSR cross-validation and
# the matrix-explicit GMRES path on CPU)
# ---------------------------------------------------------------------------


def stencil_to_csr(op: StencilPML, k_sq=None):
    """Assemble the full (H*W, H*W) complex CSR matrix of the stencil
    operator (+ diag(k_sq)) with scipy — the explicit form of what the
    pallas kernel applies matrix-free. Host-side, for verification and
    direct solves (the MATLAB spectral_gmres_solver.m analog)."""
    import numpy as np
    import scipy.sparse as sp

    cxr = np.asarray(op.cx_r)
    cxi = np.asarray(op.cx_i)
    cyr = np.asarray(op.cy_r)
    cyi = np.asarray(op.cy_i)
    ntaps, w = cxr.shape
    h = cyr.shape[1]
    r = (ntaps - 1) // 2

    cx = cxr + 1j * cxi  # [ntaps, W]
    cy = cyr + 1j * cyi  # [ntaps, H]

    # 1D periodic tap matrices
    def axis_matrix(c, n):
        A = np.zeros((n, n), np.complex128)
        for t in range(ntaps):
            off = t - r
            for i in range(n):
                A[i, (i + off) % n] += c[t, i]
        return sp.csr_matrix(A)

    Ax = axis_matrix(cx, w)
    Ay = axis_matrix(cy, h)
    M = sp.kron(sp.identity(h), Ax) + sp.kron(Ay, sp.identity(w))
    if k_sq is not None:
        M = M + sp.diags(np.asarray(k_sq, np.complex128).ravel())
    return M.tocsr()


def pallas_supported(height: int, width: int, platform: str = None) -> bool:
    """The compiled TPU kernel needs lane-aligned W (multiple of 128) and
    sublane-aligned H (multiple of 8). Production large grids (128, 256,
    512, 1024, ...) qualify; unaligned sizes fall back to the XLA stencil."""
    import jax

    platform = platform or jax.devices()[0].platform
    if platform != "tpu":
        return False
    return width % 128 == 0 and height % 8 == 0


def helmholtz_residual_stencil_auto(op: StencilPML, u, k_sq, source):
    """Pallas kernel on aligned TPU grids, XLA stencil elsewhere."""
    from .stencil import helmholtz_residual_stencil

    h, w = u.shape[-3], u.shape[-2]
    if pallas_supported(h, w):
        return helmholtz_residual_pallas(op, u, k_sq, source)
    return helmholtz_residual_stencil(op, u, k_sq, source)


# ---------------------------------------------------------------------------
# MXU-hybrid kernel: lane-axis (x) taps as a banded matmul, sublane-axis (y)
# taps as cheap shifts. Lane rotations on the VPU dominate the pure-roll
# kernel's cost; the MXU applies the banded [W, W] matrix in microseconds.
# ---------------------------------------------------------------------------


def banded_matrices(op: StencilPML):
    """Dense banded (periodic) [W, W] matrices of the x-axis taps, split
    re/im and pre-transposed for `u @ Bt`: Bt[j, i] = coeff for out col i
    from in col j. Traceable (constant-folds under jit)."""
    cxr, cxi = op.cx_r, op.cx_i  # [ntaps, W]
    ntaps, w = cxr.shape
    r = (ntaps - 1) // 2
    btr = jnp.zeros((w, w), jnp.float32)
    bti = jnp.zeros((w, w), jnp.float32)
    cols = jnp.arange(w)
    for t in range(ntaps):
        rows = (cols + (t - r)) % w
        btr = btr.at[rows, cols].add(cxr[t])
        bti = bti.at[rows, cols].add(cxi[t])
    return btr, bti


def _residual_kernel_mxu(radius: int, tile_h: int,
                         btr_ref, bti_ref, cyr_ref, cyi_ref,
                         ur_hbm, ui_hbm, ksq_ref, sr_ref, si_ref,
                         rr_ref, ri_ref,
                         ur_pad, ui_pad, sems):
    """Row-tiled kernel: x taps via MXU banded matmul, y taps via sublane
    shifts on a halo-padded block (same DMA scheme as the tiled kernel)."""
    b_idx = pl.program_id(0)
    i = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    h = n_tiles * tile_h
    r = radius
    halo = _HALO
    pad_h = tile_h + 2 * halo

    def load(dst, src_plane, sem):
        start = pl.multiple_of(i * tile_h - halo, 8)

        @pl.when(i == 0)
        def _():
            top = pltpu.make_async_copy(
                src_plane.at[pl.ds(h - halo, halo)], dst.at[pl.ds(0, halo)], sem
            )
            top.start()
            main = pltpu.make_async_copy(
                src_plane.at[pl.ds(0, tile_h + halo)],
                dst.at[pl.ds(halo, tile_h + halo)], sem,
            )
            main.start()
            top.wait()
            main.wait()

        @pl.when((i > 0) & (i < n_tiles - 1))
        def _():
            main = pltpu.make_async_copy(
                src_plane.at[pl.ds(start, pad_h)], dst, sem
            )
            main.start()
            main.wait()

        @pl.when(i == n_tiles - 1)
        def _():
            main = pltpu.make_async_copy(
                src_plane.at[pl.ds(start, tile_h + halo)],
                dst.at[pl.ds(0, tile_h + halo)], sem,
            )
            main.start()
            bot = pltpu.make_async_copy(
                src_plane.at[pl.ds(0, halo)], dst.at[pl.ds(tile_h + halo, halo)],
                sem,
            )
            bot.start()
            main.wait()
            bot.wait()

    load(ur_pad, ur_hbm.at[b_idx], sems.at[0])
    load(ui_pad, ui_hbm.at[b_idx], sems.at[1])

    upr = ur_pad[:]
    upi = ui_pad[:]
    ur = upr[halo : halo + tile_h, :]
    ui = upi[halo : halo + tile_h, :]

    # x taps on the MXU: (ur + i ui) @ (Btr + i Bti)
    btr = btr_ref[:]
    bti = bti_ref[:]
    f32 = jnp.float32
    xr = jnp.dot(ur, btr, preferred_element_type=f32) - jnp.dot(
        ui, bti, preferred_element_type=f32)
    xi = jnp.dot(ur, bti, preferred_element_type=f32) + jnp.dot(
        ui, btr, preferred_element_type=f32)

    acc_r = xr + ksq_ref[0] * ur - sr_ref[0]
    acc_i = xi + ksq_ref[0] * ui - si_ref[0]

    row0 = i * tile_h
    ntaps = 2 * r + 1
    for t in range(ntaps):
        off = t - r
        uyr = upr[halo + off : halo + off + tile_h, :]
        uyi = upi[halo + off : halo + off + tile_h, :]
        cyr = cyr_ref[t, pl.ds(row0, tile_h)]
        cyi = cyi_ref[t, pl.ds(row0, tile_h)]
        acc_r += cyr[:, None] * uyr - cyi[:, None] * uyi
        acc_i += cyr[:, None] * uyi + cyi[:, None] * uyr
    rr_ref[0] = acc_r
    ri_ref[0] = acc_i


@functools.partial(jax.jit, static_argnames=("interpret", "tile_h"))
def residual_planes_mxu(
    op: StencilPML,
    u_re: jax.Array,
    u_im: jax.Array,
    k_sq: jax.Array,
    s_re: jax.Array,
    s_im: jax.Array,
    *,
    tile_h: int = 128,
    interpret: bool = False,
):
    """MXU-hybrid row-tiled fused stencil residual for [B, H, W] planes."""
    b, h, w = u_re.shape
    if h % tile_h != 0:
        raise ValueError(f"H={h} must be divisible by tile_h={tile_h}")
    if h == tile_h:
        return residual_planes(op, u_re, u_im, k_sq, s_re, s_im,
                               interpret=interpret)
    r = op.radius
    ntaps = 2 * r + 1
    n_tiles = h // tile_h
    btr, bti = banded_matrices(op)
    band = pl.BlockSpec((w, w), lambda b_, i: (0, 0), memory_space=pltpu.VMEM)
    coeff_y = pl.BlockSpec((ntaps, h), lambda b_, i: (0, 0),
                           memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((1, tile_h, w), lambda b_, i: (b_, i, 0),
                        memory_space=pltpu.VMEM)
    whole = pl.BlockSpec(memory_space=pl.ANY)

    kernel = functools.partial(_residual_kernel_mxu, r, tile_h)
    out_shape = jax.ShapeDtypeStruct((b, h, w), u_re.dtype)
    rr, ri = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[band, band, coeff_y, coeff_y,
                  whole, whole, tile, tile, tile],
        out_specs=(tile, tile),
        out_shape=(out_shape, out_shape),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * _HALO, w), u_re.dtype),
            pltpu.VMEM((tile_h + 2 * _HALO, w), u_re.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(btr, bti, op.cy_r, op.cy_i, u_re, u_im, k_sq, s_re, s_im)
    return rr, ri
