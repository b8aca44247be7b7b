"""Spatial domain decomposition: halo exchange + sharded residual.

The SP/CP analog for this workload (SURVEY.md section 2.3/5): the H x W grid
is sharded over mesh axes ('y', 'x'); stencil/conv neighborhoods need r halo
cells from each neighbor, exchanged with `ppermute` over ICI; residual norms
reduce with `psum`. Periodic wraparound matches the spectral operator's
topology.

Two sharded paths are provided:
  * `sharded_stencil_residual` — explicit shard_map + ppermute halos around
    the local stencil kernel (ops/stencil.py);
  * plain GSPMD — annotate [B, H, W, C] arrays with P('data','y','x',None)
    and let XLA partition the convolutions/matmuls (used for the UNet).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.stencil import StencilPML, laplacian_stencil_local


def _halo_exchange_axis(block: jax.Array, radius: int, axis_name: str, axis: int):
    """Append neighbor halos along `axis` (periodic ring via ppermute).

    block: local shard [..., H_loc, W_loc, 2]; returns block padded with
    `radius` cells on both sides of `axis`.
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    lo = jax.lax.slice_in_dim(block, 0, radius, axis=axis)
    hi_start = block.shape[axis] - radius
    hi = jax.lax.slice_in_dim(block, hi_start, block.shape[axis], axis=axis)
    if n == 1:
        # single shard: periodic wrap is local
        return jnp.concatenate([hi, block, lo], axis=axis)
    # send our low rows to the left neighbor (they become its right halo)
    right = [(i, (i + 1) % n) for i in range(n)]
    left = [(i, (i - 1) % n) for i in range(n)]
    from_left = jax.lax.ppermute(hi, axis_name, right)  # left nbr's hi -> us
    from_right = jax.lax.ppermute(lo, axis_name, left)  # right nbr's lo -> us
    return jnp.concatenate([from_left, block, from_right], axis=axis)


def _local_taps(table: jax.Array, axis_name: str, n_local: int):
    """Slice a [2r+1, N] coefficient table to this shard's span."""
    idx = jax.lax.axis_index(axis_name)
    return jax.lax.dynamic_slice_in_dim(table, idx * n_local, n_local, axis=1)


def make_sharded_stencil_residual(mesh: Mesh, op: StencilPML):
    """Returns jitted residual(u, k_sq, source) on P('data','y','x') shards.

    r = L u + k^2 u - s computed entirely from local data + 2r halo cells
    per axis; no all-gathers.
    """
    r = op.radius
    spec4 = P("data", "y", "x", None)
    spec3 = P("data", "y", "x")

    def local_residual(cx_r, cx_i, cy_r, cy_i, u, k_sq, src):
        # u: local [B_loc, H_loc, W_loc, 2]
        h_loc, w_loc = u.shape[-3], u.shape[-2]
        cxr = _local_taps(cx_r, "x", w_loc)
        cxi = _local_taps(cx_i, "x", w_loc)
        cyr = _local_taps(cy_r, "y", h_loc)
        cyi = _local_taps(cy_i, "y", h_loc)
        padded = _halo_exchange_axis(u, r, "y", u.ndim - 3)
        padded = _halo_exchange_axis(padded, r, "x", u.ndim - 2)
        lap = laplacian_stencil_local(cxr, cxi, cyr, cyi, padded, r)
        return lap + k_sq[..., None] * u - src

    shard_fn = jax.shard_map(
        local_residual,
        mesh=mesh,
        in_specs=(P(None, None), P(None, None), P(None, None), P(None, None),
                  spec4, spec3, spec4),
        out_specs=spec4,
    )

    @jax.jit
    def residual(u, k_sq, source):
        return shard_fn(op.cx_r, op.cx_i, op.cy_r, op.cy_i, u, k_sq, source)

    return residual


def make_sharded_residual_norm(mesh: Mesh):
    """Per-sample residual RMSE with psum over spatial shards."""
    spec4 = P("data", "y", "x", None)

    def local_norm(res):
        s = jnp.sum(res**2, axis=(1, 2, 3))
        s = jax.lax.psum(s, ("y", "x"))
        count = res.shape[1] * res.shape[2] * res.shape[3]
        total = count * jax.lax.psum(1, "y") * jax.lax.psum(1, "x")
        return jnp.sqrt(s / total)

    return jax.jit(
        jax.shard_map(local_norm, mesh=mesh, in_specs=spec4, out_specs=P("data"))
    )


def spatial_put(mesh: Mesh, tree, with_channels: bool = True):
    """Place [B, H, W, (C)] arrays sharded over (data, y, x)."""
    def put(a):
        if a.ndim == 4:
            s = NamedSharding(mesh, P("data", "y", "x", None))
        elif a.ndim == 3:
            s = NamedSharding(mesh, P("data", "y", "x"))
        else:
            s = NamedSharding(mesh, P("data"))
        return jax.device_put(a, s)

    return jax.tree.map(put, tree)
