"""Spectral Helmholtz operator with PML — TPU-native formulation.

The reference computes the PML-modified Laplacian with a 2D FFT round trip
(helmnet/spectral.py:31-79): fft2(u) -> 4 spectral multiplies -> ifft2 -> PML
coefficient combine. On TPU, FFTs map poorly onto the hardware while dense
matmuls ride the 128x128 MXU at speed of light. The operator is separable and
its PML coefficients depend only on the coordinate of their own axis:

    L u = a_x(x) du/dx + b_x(x) d2u/dx2 + a_y(y) du/dy + b_y(y) d2u/dy2

so each axis collapses to ONE dense [N, N] complex matrix

    A = diag(a) . D1 + diag(b) . D2,   D1 = F^-1 diag(ik) F,  D2 = F^-1 diag(-k^2) F

and the full operator is two matmuls:  L u = A_y @ u + u @ A_x^T.
(The MATLAB GMRES baseline builds the very same matrices as sparse krons —
matlab/spectral_gmres_solver.m:50-90 — we apply them matrix-free per axis.)

Complex arithmetic is done split re/im with real matmuls so everything lands
on the MXU in f32 (HIGHEST precision). An FFT-based mode (1D transforms only,
40% fewer passes than the reference's 2D formulation) is kept for very large
grids and as an independent cross-check.

Wavefields at module boundaries are channel-pairs `[..., H, W, 2]` (re/im,
NHWC) — the same layout the reference uses for its TorchScript kernels.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .pml import pml_coefficients_1d, sigma_maps

HIGHEST = jax.lax.Precision.HIGHEST


def wavenumbers(n: int) -> np.ndarray:
    """1D angular wavenumbers in FFT order: 2*pi*fftfreq(n) (float64).

    Identical to the reference construction (helmnet/spectral.py:125-127):
    2*pi*linspace(-.5,.5,n,endpoint=False) rolled to FFT order.
    """
    return 2.0 * np.pi * np.fft.fftfreq(n)


def dft_derivative_matrices(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Dense spectral derivative matrices (complex128 [n, n]).

    D1 = F^-1 diag(ik) F   (first derivative)
    D2 = F^-1 diag(-k^2) F (second derivative)
    """
    k = wavenumbers(n)
    eye = np.eye(n)
    F = np.fft.fft(eye, axis=0)
    D1 = np.fft.ifft((1j * k)[:, None] * F, axis=0)
    D2 = np.fft.ifft((-(k**2))[:, None] * F, axis=0)
    return D1, D2


def axis_operator(n: int, pml_size: int, sigma_max: float, k0: float) -> np.ndarray:
    """Dense 1D PML-modified Laplacian A = diag(a) D1 + diag(b) D2 (complex128)."""
    a, b = pml_coefficients_1d(n, pml_size, sigma_max, k0)
    D1, D2 = dft_derivative_matrices(n)
    return a[:, None] * D1 + b[:, None] * D2


class SpectralPML(NamedTuple):
    """Precomputed operator arrays (a jax pytree, safe to pass through jit).

    Matmul mode uses the split re/im dense matrices; fft mode uses the 1D
    spectral multipliers + PML coefficient vectors. ALL fields are real f32
    split re/im pairs — complex64 host<->device transfers are not supported
    on every TPU runtime (notably the axon tunnel); complex values are
    constructed on-device with lax.complex where needed.
    """

    # dense per-axis operators, split re/im, float32. Optional: built with
    # make_operator(dense=False) these are [0, 0] placeholders — at very
    # large grids (8192^2: 256 MB per matrix) the dense tables exceed what
    # the remote-compile path will accept as closure constants and waste
    # HBM the fft mode never reads.
    ay_r: jax.Array  # [H, H]
    ay_i: jax.Array
    ax_r: jax.Array  # [W, W]
    ax_i: jax.Array
    # fft-mode data: wavenumbers and split PML coefficient vectors, float32
    kx: jax.Array  # [W]
    ky: jax.Array  # [H]
    ax1d: jax.Array  # [W, 2] (re, im)
    bx1d: jax.Array
    ay1d: jax.Array  # [H, 2]
    by1d: jax.Array
    # network input channels [2, H, W] (sigma_x, sigma_y), float32
    sigmas: jax.Array

    @property
    def height(self) -> int:
        return self.ky.shape[0]

    @property
    def width(self) -> int:
        return self.kx.shape[0]

    @property
    def has_dense(self) -> bool:
        return self.ay_r.size > 0


def make_operator(
    height: int,
    width: int,
    pml_size: int,
    sigma_max: float,
    k0: float,
    dtype=jnp.float32,
    dense: bool = True,
) -> SpectralPML:
    """Build the operator arrays for an HxW grid (numpy f64 precompute).

    dense=False skips the [N, N] per-axis matmul tables (fft mode only):
    at 8192^2 the four dense tables are ~1 GB, which both wastes HBM and
    overflows remote-compile request limits when an operator ends up as a
    jit closure constant.
    """
    if dense:
        Ax = axis_operator(width, pml_size, sigma_max, k0)
        Ay = axis_operator(height, pml_size, sigma_max, k0)
        dense_tables = dict(
            ay_r=jnp.asarray(Ay.real, dtype),
            ay_i=jnp.asarray(Ay.imag, dtype),
            ax_r=jnp.asarray(Ax.real, dtype),
            ax_i=jnp.asarray(Ax.imag, dtype),
        )
    else:
        empty = jnp.zeros((0, 0), dtype)
        dense_tables = dict(ay_r=empty, ay_i=empty, ax_r=empty, ax_i=empty)
    ax1d, bx1d = pml_coefficients_1d(width, pml_size, sigma_max, k0)
    ay1d, by1d = pml_coefficients_1d(height, pml_size, sigma_max, k0)
    sx, sy = sigma_maps(height, width, pml_size, sigma_max)
    pair = lambda c: jnp.asarray(np.stack([c.real, c.imag], -1), dtype)
    return SpectralPML(
        **dense_tables,
        kx=jnp.asarray(wavenumbers(width), dtype),
        ky=jnp.asarray(wavenumbers(height), dtype),
        ax1d=pair(ax1d),
        bx1d=pair(bx1d),
        ay1d=pair(ay1d),
        by1d=pair(by1d),
        sigmas=jnp.asarray(np.stack([sx, sy]), dtype),
    )


# ---------------------------------------------------------------------------
# Laplacian application
# ---------------------------------------------------------------------------


def _complex_matmul_left(m_r, m_i, u):
    """(M_r + i M_i) applied along axis -3 of channel-pair u [..., H, W, 2]."""
    pr = jnp.einsum("hj,...jwc->...hwc", m_r, u, precision=HIGHEST)
    pi = jnp.einsum("hj,...jwc->...hwc", m_i, u, precision=HIGHEST)
    re = pr[..., 0] - pi[..., 1]
    im = pr[..., 1] + pi[..., 0]
    return jnp.stack([re, im], axis=-1)


def _complex_matmul_right(m_r, m_i, u):
    """(M_r + i M_i) applied along axis -2 of channel-pair u [..., H, W, 2]."""
    pr = jnp.einsum("wj,...hjc->...hwc", m_r, u, precision=HIGHEST)
    pi = jnp.einsum("wj,...hjc->...hwc", m_i, u, precision=HIGHEST)
    re = pr[..., 0] - pi[..., 1]
    im = pr[..., 1] + pi[..., 0]
    return jnp.stack([re, im], axis=-1)


def laplacian_matmul(op: SpectralPML, u: jax.Array) -> jax.Array:
    """PML Laplacian via two dense complex matmuls. u: [..., H, W, 2]."""
    lx = _complex_matmul_right(op.ax_r, op.ax_i, u)
    ly = _complex_matmul_left(op.ay_r, op.ay_i, u)
    return lx + ly


def laplacian_fft(op: SpectralPML, u: jax.Array) -> jax.Array:
    """PML Laplacian via 1D FFTs (cross-check / large-grid path).

    Uses only 1D transforms: fft_x, two ifft_x, fft_y, two ifft_y — six 1D
    passes vs ten for the reference's 2D formulation (spectral.py:31-79).
    Complex values are built on-device (lax.complex) from the f32 tables.
    """
    uc = jax.lax.complex(u[..., 0], u[..., 1])
    cplx = lambda p: jax.lax.complex(p[..., 0], p[..., 1])
    # x axis (last)
    ikx = jax.lax.complex(jnp.zeros_like(op.kx), op.kx)
    fx = jnp.fft.fft(uc, axis=-1)
    pair_x = jnp.stack([ikx * fx, (ikx**2) * fx])
    dx, ddx = jnp.fft.ifft(pair_x, axis=-1)
    lx = cplx(op.ax1d) * dx + cplx(op.bx1d) * ddx
    # y axis (second-to-last)
    iky = jax.lax.complex(jnp.zeros_like(op.ky), op.ky)
    fy = jnp.fft.fft(uc, axis=-2)
    pair_y = jnp.stack([iky[:, None] * fy, (iky**2)[:, None] * fy])
    dy, ddy = jnp.fft.ifft(pair_y, axis=-2)
    ly = cplx(op.ay1d)[:, None] * dy + cplx(op.by1d)[:, None] * ddy
    out = lx + ly
    return jnp.stack([out.real, out.imag], axis=-1)


# Measured on-chip crossover (tools/r3_op_crossover.py -> R2_TPU_EXTRAS.json
# opx_*): the O(N^3) matmul operator wins through 512^2 (294 vs 242 Mgp/s),
# the O(N^2 log N) fft mode wins from 1024^2 (176 vs 158) widening to 1.9x
# at 4096^2 (572 vs 379). "auto" picks per grid size at trace time (shapes
# are static under jit, so this is free).
AUTO_FFT_MIN_SIZE = 1024


def resolve_mode(mode: str, height: int, width: int) -> str:
    """Resolve operator_mode='auto' to a concrete mode for an HxW grid."""
    if mode != "auto":
        return mode
    return "fft" if max(height, width) >= AUTO_FFT_MIN_SIZE else "matmul"


def laplacian(op: SpectralPML, u: jax.Array, mode: str = "matmul") -> jax.Array:
    if mode == "auto" and not op.has_dense:
        mode = "fft"  # a dense-free operator only carries the fft tables
    mode = resolve_mode(mode, u.shape[-3], u.shape[-2])
    if mode == "matmul":
        if not op.has_dense:
            raise ValueError(
                "operator was built with make_operator(dense=False); "
                "matmul mode needs the dense per-axis tables — rebuild with "
                "dense=True or use mode='fft'"
            )
        return laplacian_matmul(op, u)
    elif mode == "fft":
        return laplacian_fft(op, u)
    raise ValueError(f"unknown operator mode {mode!r}")


@functools.partial(jax.jit, static_argnames=("mode",))
def helmholtz_residual(
    op: SpectralPML,
    u: jax.Array,
    k_sq: jax.Array,
    source: jax.Array,
    mode: str = "matmul",
) -> jax.Array:
    """r = L u + k^2 u - s  (reference hybridnet.py:544-556).

    u, source: [..., H, W, 2]; k_sq: [..., H, W] (real, broadcast over re/im).
    """
    return laplacian(op, u, mode) + k_sq[..., None] * u - source


# ---------------------------------------------------------------------------
# Dense assembly (for GMRES cross-checks and small-system direct solves)
# ---------------------------------------------------------------------------


def assemble_dense(
    height: int, width: int, pml_size: int, sigma_max: float, k0: float,
    k_sq: np.ndarray | None = None,
) -> np.ndarray:
    """Full dense complex128 system matrix M = kron(I, Ay) + kron(Ax^T?, ...).

    Row-major vectorization u.reshape(H*W): M = kron(Ay, I_W) + kron(I_H, Ax)
    [+ diag(k_sq.ravel()) if k_sq given]. Matches the MATLAB construction
    (matlab/spectral_gmres_solver.m:50-90, column-major kron mirrored).
    Only for small grids (O((HW)^2) memory).
    """
    Ax = axis_operator(width, pml_size, sigma_max, k0)
    Ay = axis_operator(height, pml_size, sigma_max, k0)
    M = np.kron(Ay, np.eye(width)) + np.kron(np.eye(height), Ax)
    if k_sq is not None:
        M = M + np.diag(np.asarray(k_sq, np.complex128).ravel())
    return M
