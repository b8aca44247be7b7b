"""3D Helmholtz GMRES front end (capability extension; reference is 2D-only).

Reuses the shape-agnostic restarted-GMRES core (solvers/gmres.py — masked
fixed-shape Arnoldi, MATLAB checkpoint semantics) with the 3D spectral PML
operator (ops/spectral3d.py) and a 3D complex shifted-Laplace (CSLP)
preconditioner. The CSLP symbol is diagonal in Fourier space in any
dimension, so M^{-1} is one fftn / pointwise divide / ifftn — the same
O(N^3 log N) recipe as the 2D solvers/precond.py.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..ops.spectral3d import SpectralPML3D, laplacian3d
from .gmres import GMRESResult, gmres_restarted


def make_helmholtz_matvec3d(
    op: SpectralPML3D, k_sq: jax.Array, mode: str = "matmul"
) -> Callable[[jax.Array], jax.Array]:
    """Complex matvec u -> L u + k^2 u on [D, H, W] complex grids."""

    def mv(u: jax.Array) -> jax.Array:
        pair = jnp.stack([u.real, u.imag], axis=-1)
        lap = laplacian3d(op, pair, mode)
        lap_c = jax.lax.complex(lap[..., 0], lap[..., 1])
        return lap_c + k_sq.astype(u.real.dtype) * u

    return mv


def make_shifted_laplace_inverse3d(
    op: SpectralPML3D,
    k_sq: jax.Array,
    shift: Tuple[float, float] = (1.0, 0.5),
    kref: str = "mean",
) -> Callable[[jax.Array], jax.Array]:
    """Exact inverse of M = nabla^2 + (b1 + i b2) kref^2 via fftn/ifftn."""
    b1, b2 = shift
    kref2 = jnp.mean(k_sq) if kref == "mean" else jnp.max(k_sq)
    sym = -(
        op.kz[:, None, None] ** 2
        + op.ky[None, :, None] ** 2
        + op.kx[None, None, :] ** 2
    )

    def minv(v: jax.Array) -> jax.Array:
        denom = sym.astype(v.real.dtype) + jax.lax.complex(
            (b1 * kref2).astype(v.real.dtype), (b2 * kref2).astype(v.real.dtype)
        )
        axes = (-3, -2, -1)
        return jnp.fft.ifftn(jnp.fft.fftn(v, axes=axes) / denom, axes=axes)

    return minv


@functools.partial(
    jax.jit,
    static_argnames=("mode", "restart", "max_restarts", "tol", "precond",
                     "shift"),
)
def solve_helmholtz3d(
    op: SpectralPML3D,
    k_sq: jax.Array,
    source: jax.Array,
    *,
    mode: str = "matmul",
    restart: int = 20,
    max_restarts: int = 50,
    tol: float = 1e-10,
    precond: str = "none",
    shift: tuple = (1.0, 0.5),
) -> GMRESResult:
    """Solve (L + k^2) u = s for one 3D problem.

    k_sq: [D, H, W] real; source: [D, H, W, 2] channel pair (or complex
    [D, H, W]). Returns channel-pair fields of shape [..., D, H, W, 2].
    precond='shifted_laplace' right-preconditions with the 3D CSLP; residual
    norms remain TRUE residuals of the original system.
    """
    if source.ndim == 4 and source.shape[-1] == 2:
        b = jax.lax.complex(source[..., 0], source[..., 1])
    else:
        b = jnp.asarray(source)
        if not jnp.iscomplexobj(b):
            b = b.astype(jnp.complex64)
    mv = make_helmholtz_matvec3d(op, k_sq, mode)
    if precond == "shifted_laplace":
        minv = make_shifted_laplace_inverse3d(op, k_sq, shift)
        res = gmres_restarted(
            lambda v: mv(minv(v)), b,
            restart=restart, max_restarts=max_restarts, tol=tol,
        )
        res = res._replace(
            x=minv(res.x), checkpoints=jax.vmap(minv)(res.checkpoints)
        )
    else:
        res = gmres_restarted(
            mv, b, restart=restart, max_restarts=max_restarts, tol=tol
        )
    as_pair = lambda c: jnp.stack([c.real, c.imag], axis=-1)
    return GMRESResult(
        x=as_pair(res.x),
        residual_norms=res.residual_norms,
        checkpoints=as_pair(res.checkpoints),
        iterations=res.iterations,
    )


def solve_helmholtz3d_batch(
    op: SpectralPML3D,
    k_sq_batch: jax.Array,
    source_batch: jax.Array,
    **kw,
) -> GMRESResult:
    """vmapped sweep over a batch of 3D problems."""
    fn = lambda k, s: solve_helmholtz3d(op, k, s, **kw)
    return jax.vmap(fn)(k_sq_batch, source_batch)
