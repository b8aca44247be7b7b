"""Finite-difference stencil form of the PML Helmholtz operator.

The spectral operator (ops/spectral.py) is global — every output point
depends on the whole grid — which forces all-gathers when the grid is
sharded. This module provides the LOCAL alternative for domain-decomposed
grids: central finite differences of order 2 (5-point) or 4 (9-point cross),
with periodic wrap to approximate the spectral operator's topology.

    L u = a_x(x) D1_x u + b_x(x) D2_x u + a_y(y) D1_y u + b_y(y) D2_y u

Per axis this is a (2r+1)-tap stencil whose complex coefficients
c_t(x) = a(x) d1[t] + b(x) d2[t] vary only along that axis — precomputed
as [2r+1, N] tables. The sharded version (distributed/halo.py) exchanges r
halo cells per neighbor via ppermute. Truncation error vs the spectral form
is quantified in tests (test_stencil.py); the learned solver remains exact
w.r.t. whichever operator generated its residuals.

This is also the operator the CSR/SpMV Pallas path assembles
(ops/pallas_stencil.py) — the BASELINE.json "sparse linear-algebra" form,
replacing the MATLAB explicit kron matrix (spectral_gmres_solver.m:50-90).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .pml import pml_coefficients_1d, sigma_maps

# central-difference weights (unit spacing): offsets [-r..r]
_D1 = {
    2: np.array([-0.5, 0.0, 0.5]),
    4: np.array([1 / 12, -8 / 12, 0.0, 8 / 12, -1 / 12]),
}
_D2 = {
    2: np.array([1.0, -2.0, 1.0]),
    4: np.array([-1 / 12, 16 / 12, -30 / 12, 16 / 12, -1 / 12]),
}


class StencilPML(NamedTuple):
    """Per-axis complex tap tables, split re/im: [2r+1, N] each."""

    cx_r: jax.Array
    cx_i: jax.Array
    cy_r: jax.Array
    cy_i: jax.Array
    sigmas: jax.Array  # [2, H, W] network input channels

    @property
    def radius(self) -> int:
        return (self.cx_r.shape[0] - 1) // 2


def _axis_taps(n: int, pml: int, sigma_max: float, k0: float, order: int):
    a, b = pml_coefficients_1d(n, pml, sigma_max, k0)
    d1, d2 = _D1[order], _D2[order]
    taps = a[None, :] * d1[:, None] + b[None, :] * d2[:, None]  # [2r+1, n]
    return taps


def make_stencil_operator(
    height: int,
    width: int,
    pml_size: int,
    sigma_max: float,
    k0: float,
    order: int = 4,
    dtype=jnp.float32,
) -> StencilPML:
    if order not in _D1:
        raise ValueError(f"unsupported stencil order {order} (use 2 or 4)")
    tx = _axis_taps(width, pml_size, sigma_max, k0, order)
    ty = _axis_taps(height, pml_size, sigma_max, k0, order)
    sx, sy = sigma_maps(height, width, pml_size, sigma_max)
    return StencilPML(
        cx_r=jnp.asarray(tx.real, dtype),
        cx_i=jnp.asarray(tx.imag, dtype),
        cy_r=jnp.asarray(ty.real, dtype),
        cy_i=jnp.asarray(ty.imag, dtype),
        sigmas=jnp.asarray(np.stack([sx, sy]), dtype),
    )


def _cmul_taps(c_r, c_i, u):
    """(c_r + i c_i) * u for channel-pair u; c broadcastable to u[..., 0]."""
    re = c_r * u[..., 0] - c_i * u[..., 1]
    im = c_r * u[..., 1] + c_i * u[..., 0]
    return jnp.stack([re, im], axis=-1)


def laplacian_stencil(op: StencilPML, u: jax.Array) -> jax.Array:
    """Periodic stencil Laplacian. u: [..., H, W, 2]."""
    r = op.radius
    out = jnp.zeros_like(u)
    for t in range(2 * r + 1):
        off = t - r
        # x axis (last spatial): coefficient varies along W
        ux = jnp.roll(u, -off, axis=-2)
        out = out + _cmul_taps(op.cx_r[t], op.cx_i[t], ux)
        # y axis: coefficient varies along H -> broadcast over W
        uy = jnp.roll(u, -off, axis=-3)
        out = out + _cmul_taps(op.cy_r[t][:, None], op.cy_i[t][:, None], uy)
    return out


def helmholtz_residual_stencil(
    op: StencilPML, u: jax.Array, k_sq: jax.Array, source: jax.Array
) -> jax.Array:
    """r = L u + k^2 u - s with the stencil operator."""
    return laplacian_stencil(op, u) + k_sq[..., None] * u - source


# ---------------------------------------------------------------------------
# Local (halo-padded) application — the building block for shard_map domain
# decomposition: caller supplies u already padded with r cells per side and
# the coefficient tables sliced for this shard (see distributed/halo.py).
# ---------------------------------------------------------------------------


def laplacian_stencil_local(
    cx_r, cx_i, cy_r, cy_i, u_padded: jax.Array, radius: int
) -> jax.Array:
    """Stencil on a halo-padded block. u_padded: [..., H+2r, W+2r, 2];
    coefficient tables [2r+1, W] / [2r+1, H] for the OUTPUT block."""
    r = radius
    h = u_padded.shape[-3] - 2 * r
    w = u_padded.shape[-2] - 2 * r
    out = None
    for t in range(2 * r + 1):
        sx = u_padded[..., r : r + h, t : t + w, :]
        sy = u_padded[..., t : t + h, r : r + w, :]
        term = _cmul_taps(cx_r[t], cx_i[t], sx) + _cmul_taps(
            cy_r[t][:, None], cy_i[t][:, None], sy
        )
        out = term if out is None else out + term
    return out
