"""Distributed 3D spectral PML residual via z-slab decomposition.

3D volumes outgrow one chip quickly (a 512^3 learned-solver state tree is
tens of GB), so the 3D operator needs a multi-chip form. The 3D Laplacian
is three per-axis dense complex matmuls (ops/spectral3d.laplacian3d_matmul,
the measured-fastest mode on chip); under a z-slab sharding
P('data', 'z', None, None, None) of [B, D, H, W, 2] fields:

  * the y- and x-axis matmuls contract over UNSHARDED axes — fully local;
  * the z-axis matmul contracts over the sharded axis. Two methods:

    - 'transpose' (default): `all_to_all` re-shards the field from
      z-slabs to y-slabs (full z becomes local), the z GEMM runs locally,
      and a second `all_to_all` transposes back — the dfft.py slab trick
      applied to a dense contraction. Traffic: 2 * (d-1)/d of the LOCAL
      shard per apply (~2/d of the field).
    - 'scatter': each device multiplies its slab by the matching COLUMN
      block of A_z, producing a full-depth partial sum, and one tiled
      `psum_scatter` both reduces and deals out output slabs. Traffic:
      (d-1)/d of the FULL field per apply — d/2 x more bytes than
      'transpose' on d devices, but a single collective with no
      re-layout; kept for 2-device meshes (equal traffic, one hop) and
      as the canonical distributed-GEMM cross-check.

The reference is 2D- and single-process-only
(/root/reference/helmnet/spectral.py:31-79).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.spectral3d import SpectralPML3D, _complex_axis_matmul


def make_sharded_residual3d(
    mesh: Mesh, op: SpectralPML3D, axis: str = "z",
    method: str = "transpose", overlap_chunks: int = 4,
):
    """Returns jitted residual(u, k_sq, source) for z-slab shards.

    u, source: [B, D, H, W, 2] sharded P('data', axis, None, None, None);
    k_sq: [B, D, H, W] sharded P('data', axis, None, None).
    D and H must be divisible by the axis size. `method` selects the
    z-contraction collective: 'transpose' (2 all_to_alls of the local
    shard), 'scatter' (one psum_scatter of the full field), or 'overlap'
    (transpose split into `overlap_chunks` independent W-chunks so XLA
    can pipeline each chunk's all_to_all against the previous chunk's
    GEMM and against the local y/x matmuls — the comm/compute overlap
    the zero-overlap SCALING_MODEL lower bound leaves on the table; at
    512^3 on 4 devices it models 0.79 efficiency unoverlapped, >=0.95
    with the exposed-comm term reduced to the first chunk's transfer).
    W chunks should keep 128-lane alignment on real TPUs: W /
    overlap_chunks is asserted to stay a multiple of 128 when W >= 512.
    """
    if method not in ("transpose", "scatter", "overlap"):
        raise ValueError(f"unknown slab3d method {method!r}")
    spec5 = P("data", axis, None, None, None)
    spec4 = P("data", axis, None, None)
    rep = P(None, None)

    def lz_scatter(az_r, az_i, u):
        dz_loc = u.shape[1]
        idx = jax.lax.axis_index(axis)
        col = lambda m: jax.lax.dynamic_slice_in_dim(
            m, idx * dz_loc, dz_loc, axis=1
        )
        # full-depth partial rows from the local slab's A_z columns ...
        lz_full = _complex_axis_matmul(
            col(az_r), col(az_i), u, "dj,bjhwc->bdhwc"
        )
        # ... one reduce-scatter sums partials AND deals out row slabs
        return jax.lax.psum_scatter(
            lz_full, axis, scatter_dimension=1, tiled=True
        )

    def lz_transpose(az_r, az_i, u):
        # z-slabs -> y-slabs: [B, Dz_loc, H, W, 2] -> [B, D, H_loc, W, 2]
        t = jax.lax.all_to_all(u, axis, split_axis=2, concat_axis=1,
                               tiled=True)
        lz_t = _complex_axis_matmul(az_r, az_i, t, "dj,bjhwc->bdhwc")
        # back to z-slabs
        return jax.lax.all_to_all(lz_t, axis, split_axis=1, concat_axis=2,
                                  tiled=True)

    def lz_overlap(az_r, az_i, u):
        """Chunked transpose: W split into `overlap_chunks` independent
        all_to_all -> GEMM -> all_to_all chains. Each chain only depends
        on its own W slice, so the XLA scheduler issues chunk i+1's
        (async) all_to_all while chunk i's GEMM runs on the MXU,
        hiding all but the first chunk's transfer; the chains are also
        independent of the y/x matmuls in local_residual, giving a
        second overlap window. Static Python loop: fixed chunk count,
        fully unrolled at trace time (no dynamic shapes)."""
        W = u.shape[3]
        nc = min(overlap_chunks, W)
        if W % nc:
            raise ValueError(f"W={W} not divisible by {nc} chunks")
        if W >= 512 and (W // nc) % 128:
            raise ValueError(
                f"W/chunks = {W // nc} breaks 128-lane alignment"
            )
        outs = []
        for i in range(nc):
            ui = jax.lax.slice_in_dim(u, i * (W // nc), (i + 1) * (W // nc),
                                      axis=3)
            t = jax.lax.all_to_all(ui, axis, split_axis=2, concat_axis=1,
                                   tiled=True)
            lz_t = _complex_axis_matmul(az_r, az_i, t, "dj,bjhwc->bdhwc")
            outs.append(
                jax.lax.all_to_all(lz_t, axis, split_axis=1, concat_axis=2,
                                   tiled=True)
            )
        return jnp.concatenate(outs, axis=3)

    lz_fn = {"transpose": lz_transpose, "scatter": lz_scatter,
             "overlap": lz_overlap}[method]

    def local_residual(az_r, az_i, ay_r, ay_i, ax_r, ax_i, u, k_sq, src):
        # u local: [B_loc, Dz_loc, H, W, 2]
        lz = lz_fn(az_r, az_i, u)
        ly = _complex_axis_matmul(ay_r, ay_i, u, "hj,bdjwc->bdhwc")
        lx = _complex_axis_matmul(ax_r, ax_i, u, "wj,bdhjc->bdhwc")
        return lz + ly + lx + k_sq[..., None] * u - src

    shard_fn = jax.shard_map(
        local_residual,
        mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, rep, spec5, spec4, spec5),
        out_specs=spec5,
    )

    @jax.jit
    def residual(u, k_sq, source):
        return shard_fn(
            op.az_r, op.az_i, op.ay_r, op.ay_i, op.ax_r, op.ax_i,
            u, k_sq, source,
        )

    return residual


def make_sharded_residual_norm3d(mesh: Mesh, axis: str = "z"):
    """Per-sample residual RMSE with psum over the slab axis."""
    spec5 = P("data", axis, None, None, None)

    def local_norm(res):
        s = jnp.sum(res**2, axis=(1, 2, 3, 4))
        s = jax.lax.psum(s, axis)
        count = (
            res.shape[1] * res.shape[2] * res.shape[3] * res.shape[4]
        ) * jax.lax.psum(1, axis)
        return jnp.sqrt(s / count)

    return jax.jit(
        jax.shard_map(local_norm, mesh=mesh, in_specs=spec5, out_specs=P("data"))
    )


def slab_put(mesh: Mesh, tree, axis: str = "z"):
    """Place [B, D, H, W, (2)] arrays sharded over ('data', axis)."""

    def put(a):
        if a.ndim == 5:
            s = NamedSharding(mesh, P("data", axis, None, None, None))
        elif a.ndim == 4:
            s = NamedSharding(mesh, P("data", axis, None, None))
        else:
            s = NamedSharding(mesh, P("data"))
        return jax.device_put(a, s)

    return jax.tree.map(put, tree)
