"""Distributed spectral PML Laplacian via transpose-based FFTs.

The sharded-grid alternative to GSPMD's automatic partitioning of the
matmul operator (SURVEY.md section 5: "transpose-based distributed FFT —
all-to-all along the mesh"). Slab decomposition over the mesh 'y' axis:

  rows sharded -> fft along x is LOCAL
  -> all_to_all transposes the grid so full columns become local
  -> fft along y LOCAL, apply (ik, -k^2) multipliers + PML combine
  -> all_to_all back.

All collectives ride ICI; per application the traffic is two all-to-alls
of the field (the textbook slab-FFT pattern). Fields are channel pairs at
the boundary; complex values exist only on-device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.spectral import SpectralPML


def make_sharded_laplacian_fft(mesh: Mesh, op: SpectralPML):
    """Returns jitted lap(u) for u: [B, H, W, 2] sharded P('data','y',None).

    Requires H and W divisible by the 'y' axis size (slab decomposition:
    the W axis stays local for the x-pass; a W-slab of width W/ny becomes
    local for the y-pass).
    """
    ny = mesh.shape["y"]
    spec = P("data", "y", None, None)

    def local_fn(kx, ky, ax1d, bx1d, ay1d, by1d, u):
        # u local: [B_loc, H_loc, W, 2]
        uc = jax.lax.complex(u[..., 0], u[..., 1])
        cplx = lambda p: jax.lax.complex(p[..., 0], p[..., 1])

        # ---- x direction: fully local (rows are complete) ----
        ikx = jax.lax.complex(jnp.zeros_like(kx), kx)
        fx = jnp.fft.fft(uc, axis=-1)
        pair = jnp.stack([ikx * fx, (ikx**2) * fx])
        dx, ddx = jnp.fft.ifft(pair, axis=-1)
        lx = cplx(ax1d) * dx + cplx(bx1d) * ddx

        # ---- y direction: transpose so full columns become local ----
        # [B, H_loc, W] -> [B, H, W/ny]: send column-slab j to device j;
        # received row-chunks concatenate in source-device order = global H
        t = jax.lax.all_to_all(uc, "y", split_axis=2, concat_axis=1, tiled=True)
        iky = jax.lax.complex(jnp.zeros_like(ky), ky)[:, None]
        fy = jnp.fft.fft(t, axis=-2)
        pairy = jnp.stack([iky * fy, (iky**2) * fy])
        dy, ddy = jnp.fft.ifft(pairy, axis=-2)
        ly_full = cplx(ay1d)[:, None] * dy + cplx(by1d)[:, None] * ddy
        # back: [B, H, W/ny] -> [B, H_loc, W]
        ly = jax.lax.all_to_all(ly_full, "y", split_axis=1, concat_axis=2, tiled=True)

        out = lx + ly
        return jnp.stack([out.real, out.imag], axis=-1)

    shard_fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None), P(None), P(None, None), P(None, None),
                  P(None, None), P(None, None), spec),
        out_specs=spec,
    )

    @jax.jit
    def lap(u):
        return shard_fn(op.kx, op.ky, op.ax1d, op.bx1d, op.ay1d, op.by1d, u)

    return lap


def make_sharded_residual_fft(mesh: Mesh, op: SpectralPML):
    """r = L u + k^2 u - s with the distributed-FFT Laplacian; all inputs
    sharded P('data','y',...)."""
    lap = make_sharded_laplacian_fft(mesh, op)

    @jax.jit
    def residual(u, k_sq, source):
        return lap(u) + k_sq[..., None] * u - source

    return residual
