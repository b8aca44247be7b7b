"""3D spectral Helmholtz operator with PML — capability extension.

The reference (ucl-bug/helmnet) is strictly 2D: its operator builds 2D FFT
grids (helmnet/spectral.py:31-79) and its MATLAB baseline assembles 2D
krons (matlab/spectral_gmres_solver.m:50-90). Transcranial-ultrasound
deployment is 3D, so the framework carries the 3D operator as a
forward-looking extension built on the same TPU-first formulation as
ops/spectral.py: the PML-modified Laplacian is separable,

    L u = sum_axis  a(x_i) du/dx_i + b(x_i) d2u/dx_i2,

so each axis collapses to ONE dense [N, N] complex matrix
A = diag(a) D1 + diag(b) D2, and the full 3D operator is three batched
complex matmuls over a [..., D, H, W, 2] channel-pair field — every FLOP
on the MXU at f32 HIGHEST. An FFT mode (six 1D transform passes) is kept
for very large grids and as an independent cross-check, exactly mirroring
the 2D module.

Complex values never cross the host boundary (axon constraint): all
precomputed tables are split re/im f32 pairs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .pml import pml_coefficients_1d, sigma_profile
from .spectral import HIGHEST, axis_operator, wavenumbers


class SpectralPML3D(NamedTuple):
    """Precomputed 3D operator arrays (a jax pytree, safe through jit)."""

    # dense per-axis operators, split re/im, float32
    az_r: jax.Array  # [D, D]
    az_i: jax.Array
    ay_r: jax.Array  # [H, H]
    ay_i: jax.Array
    ax_r: jax.Array  # [W, W]
    ax_i: jax.Array
    # fft-mode data: wavenumbers and split PML coefficient vectors
    kz: jax.Array  # [D]
    ky: jax.Array  # [H]
    kx: jax.Array  # [W]
    az1d: jax.Array  # [D, 2] (re, im)
    bz1d: jax.Array
    ay1d: jax.Array  # [H, 2]
    by1d: jax.Array
    ax1d: jax.Array  # [W, 2]
    bx1d: jax.Array
    # network/diagnostic input channels [3, D, H, W] (sigma_x, sigma_y, sigma_z)
    sigmas: jax.Array

    @property
    def depth(self) -> int:
        return self.az_r.shape[0]

    @property
    def height(self) -> int:
        return self.ay_r.shape[0]

    @property
    def width(self) -> int:
        return self.ax_r.shape[0]


def sigma_maps_3d(
    depth: int, height: int, width: int, pml_size: int, sigma_max: float
) -> np.ndarray:
    """[3, D, H, W] float32 (sigma_x, sigma_y, sigma_z) absorption maps."""
    sx = sigma_profile(width, pml_size, sigma_max)
    sy = sigma_profile(height, pml_size, sigma_max)
    sz = sigma_profile(depth, pml_size, sigma_max)
    shape = (depth, height, width)
    return np.stack([
        np.broadcast_to(sx[None, None, :], shape),
        np.broadcast_to(sy[None, :, None], shape),
        np.broadcast_to(sz[:, None, None], shape),
    ]).astype(np.float32)


def make_operator3d(
    depth: int,
    height: int,
    width: int,
    pml_size: int,
    sigma_max: float,
    k0: float,
    dtype=jnp.float32,
) -> SpectralPML3D:
    """Build the operator arrays for a DxHxW grid (numpy f64 precompute)."""
    Az = axis_operator(depth, pml_size, sigma_max, k0)
    Ay = axis_operator(height, pml_size, sigma_max, k0)
    Ax = axis_operator(width, pml_size, sigma_max, k0)
    az1d, bz1d = pml_coefficients_1d(depth, pml_size, sigma_max, k0)
    ay1d, by1d = pml_coefficients_1d(height, pml_size, sigma_max, k0)
    ax1d, bx1d = pml_coefficients_1d(width, pml_size, sigma_max, k0)
    pair = lambda c: jnp.asarray(np.stack([c.real, c.imag], -1), dtype)
    return SpectralPML3D(
        az_r=jnp.asarray(Az.real, dtype),
        az_i=jnp.asarray(Az.imag, dtype),
        ay_r=jnp.asarray(Ay.real, dtype),
        ay_i=jnp.asarray(Ay.imag, dtype),
        ax_r=jnp.asarray(Ax.real, dtype),
        ax_i=jnp.asarray(Ax.imag, dtype),
        kz=jnp.asarray(wavenumbers(depth), dtype),
        ky=jnp.asarray(wavenumbers(height), dtype),
        kx=jnp.asarray(wavenumbers(width), dtype),
        az1d=pair(az1d),
        bz1d=pair(bz1d),
        ay1d=pair(ay1d),
        by1d=pair(by1d),
        ax1d=pair(ax1d),
        bx1d=pair(bx1d),
        sigmas=jnp.asarray(
            sigma_maps_3d(depth, height, width, pml_size, sigma_max), dtype
        ),
    )


# ---------------------------------------------------------------------------
# Laplacian application
# ---------------------------------------------------------------------------


def _complex_axis_matmul(m_r, m_i, u, spec: str):
    """(M_r + i M_i) applied along one grid axis of channel-pair u."""
    pr = jnp.einsum(spec, m_r, u, precision=HIGHEST)
    pi = jnp.einsum(spec, m_i, u, precision=HIGHEST)
    re = pr[..., 0] - pi[..., 1]
    im = pr[..., 1] + pi[..., 0]
    return jnp.stack([re, im], axis=-1)


def laplacian3d_matmul(op: SpectralPML3D, u: jax.Array) -> jax.Array:
    """PML Laplacian via three dense complex matmuls. u: [..., D, H, W, 2]."""
    lz = _complex_axis_matmul(op.az_r, op.az_i, u, "dj,...jhwc->...dhwc")
    ly = _complex_axis_matmul(op.ay_r, op.ay_i, u, "hj,...djwc->...dhwc")
    lx = _complex_axis_matmul(op.ax_r, op.ax_i, u, "wj,...dhjc->...dhwc")
    return lz + ly + lx


def laplacian3d_fft(op: SpectralPML3D, u: jax.Array) -> jax.Array:
    """PML Laplacian via 1D FFTs (large-grid path / independent cross-check).

    Nine 1D transform passes total: per axis one fft and one batched ifft of
    the stacked (d, d2) pair.
    """
    uc = jax.lax.complex(u[..., 0], u[..., 1])
    cplx = lambda p: jax.lax.complex(p[..., 0], p[..., 1])

    def axis_term(k, a1d, b1d, axis):
        ik = jax.lax.complex(jnp.zeros_like(k), k)
        shape = [1] * uc.ndim
        shape[axis] = k.shape[0]
        ik = ik.reshape(shape)
        f = jnp.fft.fft(uc, axis=axis)
        d, dd = jnp.fft.ifft(jnp.stack([ik * f, (ik**2) * f]), axis=axis)
        ca = cplx(a1d).reshape(shape)
        cb = cplx(b1d).reshape(shape)
        return ca * d + cb * dd

    out = (
        axis_term(op.kx, op.ax1d, op.bx1d, -1)
        + axis_term(op.ky, op.ay1d, op.by1d, -2)
        + axis_term(op.kz, op.az1d, op.bz1d, -3)
    )
    return jnp.stack([out.real, out.imag], axis=-1)


def laplacian3d(op: SpectralPML3D, u: jax.Array, mode: str = "matmul") -> jax.Array:
    # 'auto' resolves to matmul: measured on-chip at 256^3 the dense
    # per-axis matmuls run 2.7x faster than the 1D-FFT path (1946 vs 727
    # Mgp/s, R2_TPU_EXTRAS.json helm3d_residual_*); the 3D crossover was
    # not reached at any size that fits one chip.
    if mode == "auto":
        mode = "matmul"
    if mode == "matmul":
        return laplacian3d_matmul(op, u)
    elif mode == "fft":
        return laplacian3d_fft(op, u)
    raise ValueError(f"unknown operator mode {mode!r}")


@functools.partial(jax.jit, static_argnames=("mode",))
def helmholtz_residual3d(
    op: SpectralPML3D,
    u: jax.Array,
    k_sq: jax.Array,
    source: jax.Array,
    mode: str = "matmul",
) -> jax.Array:
    """r = L u + k^2 u - s on [..., D, H, W, 2] channel pairs."""
    return laplacian3d(op, u, mode) + k_sq[..., None] * u - source


# ---------------------------------------------------------------------------
# Dense assembly (tiny-grid cross-checks only)
# ---------------------------------------------------------------------------


def assemble_dense3d(
    depth: int,
    height: int,
    width: int,
    pml_size: int,
    sigma_max: float,
    k0: float,
    k_sq: np.ndarray | None = None,
) -> np.ndarray:
    """Dense complex128 system matrix for u.reshape(D*H*W) (row-major):

        M = kron(Az, I_H x I_W) + kron(I_D, kron(Ay, I_W)) + kron(I_DH, Ax)

    the 3D analog of the 2D construction (and of the MATLAB kron build,
    matlab/spectral_gmres_solver.m:50-90). O((DHW)^2) memory — tests only.
    """
    Az = axis_operator(depth, pml_size, sigma_max, k0)
    Ay = axis_operator(height, pml_size, sigma_max, k0)
    Ax = axis_operator(width, pml_size, sigma_max, k0)
    Ihw = np.eye(height * width)
    Id = np.eye(depth)
    Iw = np.eye(width)
    Idh = np.eye(depth * height)
    M = (
        np.kron(Az, Ihw)
        + np.kron(Id, np.kron(Ay, Iw))
        + np.kron(Idh, Ax)
    )
    if k_sq is not None:
        M = M + np.diag(np.asarray(k_sq, np.complex128).ravel())
    return M


def point_source_map3d(
    depth: int,
    height: int,
    width: int,
    location: tuple[int, int, int],
    amplitude: float = 1.0,
    phase: float = 0.0,
    omega: float = 1.0,
    t: float = 0.0,
) -> np.ndarray:
    """Complex 3D point source as channel-pair float32 [D, H, W, 2].

    3D analog of ops/source.point_source_map (no reference counterpart —
    the reference SourceModule is 2D-only, helmnet/source_module.py:41-79).
    """
    z, r, c = (int(v) for v in location)
    if not (0 <= z < depth and 0 <= r < height and 0 <= c < width):
        raise ValueError(
            f"source location {location} outside the {depth}x{height}x{width} grid"
        )
    amp = np.zeros((depth, height, width), dtype=np.float64)
    amp[z, r, c] = amplitude
    val = amp * np.exp(1j * (omega * t + phase))
    return np.stack([val.real, val.imag], axis=-1).astype(np.float32)
