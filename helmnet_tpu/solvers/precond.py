"""Preconditioning for the Helmholtz GMRES solver.

Two TPU-native tools the MATLAB reference lacks (its
matlab/spectral_gmres_solver.m:95-115 runs unpreconditioned f64 GMRES to
tol 1e-10 — fine on CPU at 96^2, hopeless at high wavenumber):

1. **Complex shifted-Laplace preconditioner (CSLP)** — the standard Krylov
   accelerator for Helmholtz (Erlangga/Vuik/Oosterlee). We precondition with
   the *constant-coefficient* shifted operator

       M = nabla^2 + (b1 + i b2) kref^2,     (b1, b2) = (1, 0.5) default,

   which is exactly diagonal in Fourier space, so M^{-1} v is one fft2,
   one pointwise divide, one ifft2 — O(N^2 log N), no setup, trivially
   batchable. The imaginary shift b2 keeps the symbol away from zero at
   every wavenumber, which is what restores GMRES convergence where the
   unshifted operator's near-null modes (|k_spatial| ~ kref) stall it.
   Applied as a RIGHT preconditioner (solve A M^{-1} y = b, x = M^{-1} y) so
   recorded residual norms remain TRUE residuals of the original system.

2. **Mixed-precision iterative refinement** — the documented path to the
   MATLAB tol 1e-10 on hardware whose fast path is f32: outer loop computes
   the defect r = b - A x in float64 (host numpy, dense per-axis operators —
   cheap: two [N,N]@[N,N] matmuls), inner GMRES solves A d = r on the
   accelerator in f32 (optionally preconditioned), x += d in f64. Each
   correction shrinks the true residual by the inner solver's relative
   accuracy (~1e-5..1e-6), so a handful of outer iterations reach 1e-10+
   even though no single f32 solve can.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.spectral import SpectralPML, axis_operator


def make_shifted_laplace_inverse(
    op: SpectralPML,
    k_sq: jax.Array,
    shift: Tuple[float, float] = (1.0, 0.5),
    kref: str = "mean",
) -> Callable[[jax.Array], jax.Array]:
    """Exact inverse of M = nabla^2 + (b1 + i b2) kref^2 via fft2/ifft2.

    `k_sq` [H, W] real sets the reference wavenumber: kref^2 = mean(k_sq)
    ('mean', robust default for sos in [1, 2]) or max(k_sq) ('max').
    Returns a closure mapping complex [H, W] -> complex [H, W].
    """
    b1, b2 = shift
    kref2 = jnp.mean(k_sq) if kref == "mean" else jnp.max(k_sq)
    # -(kx^2 + ky^2) is the Fourier symbol of nabla^2
    sym = -(op.ky[:, None] ** 2 + op.kx[None, :] ** 2)

    def minv(v: jax.Array) -> jax.Array:
        denom = sym.astype(v.real.dtype) + jax.lax.complex(
            (b1 * kref2).astype(v.real.dtype), (b2 * kref2).astype(v.real.dtype)
        )
        return jnp.fft.ifft2(jnp.fft.fft2(v) / denom)

    return minv


# NOTE: no forward-apply (y0 = M x0) helper on purpose — mapping a warm
# start through M amplifies its high-frequency error by the Laplacian
# symbol and poisons the Krylov space; warm starts enter preconditioned
# solves as defect correction instead (solvers/hybrid.py).


# ---------------------------------------------------------------------------
# Mixed-precision iterative refinement (f64 defect, f32 device correction)
# ---------------------------------------------------------------------------


class _HostOperator:
    """float64 host-side application of the PML Helmholtz operator.

    Uses the same dense per-axis complex matrices as the device matmul path
    (ops/spectral.axis_operator, the construction MATLAB assembles as sparse
    krons — spectral_gmres_solver.m:50-90), kept in complex128.
    """

    def __init__(self, height, width, pml_size, sigma_max, k0, k_sq):
        self.Ax = axis_operator(width, pml_size, sigma_max, k0)  # [W, W] c128
        self.Ay = axis_operator(height, pml_size, sigma_max, k0)  # [H, H]
        self.k_sq = np.asarray(k_sq, np.float64)

    def __call__(self, u: np.ndarray) -> np.ndarray:
        u = np.asarray(u, np.complex128)
        return self.Ay @ u + u @ self.Ax.T + self.k_sq * u


def solve_helmholtz_refined(
    op: SpectralPML,
    geometry,
    k0: float,
    k_sq,
    source,
    *,
    tol: float = 1e-10,
    max_outer: int = 8,
    inner_restart: int = 50,
    inner_max_restarts: int = 20,
    inner_tol: float = 1e-7,
    precond: str = "shifted_laplace",
    mode: str = "auto",
):
    """Solve (L + k^2) u = s to `tol` RELATIVE residual in float64.

    Returns (x complex128 [H, W], outer_residual_norms list). The inner f32
    correction solves run on the default device (TPU); only [H, W] complex
    defects cross the host boundary per outer iteration — transferred as f32
    re/im pairs (complex transfers are unsupported on some TPU runtimes).
    """
    from .gmres import solve_helmholtz

    h, w = op.height, op.width
    host_op = _HostOperator(
        h, w, geometry.pml_size, geometry.sigma_max, k0, k_sq
    )
    b = np.asarray(source)
    if b.ndim == 3 and b.shape[-1] == 2:
        b = b[..., 0].astype(np.complex128) + 1j * b[..., 1]
    else:
        b = np.asarray(b, np.complex128)
    bnorm = np.linalg.norm(b)
    k_sq_dev = jnp.asarray(np.asarray(k_sq, np.float32))

    x = np.zeros((h, w), np.complex128)
    r = b.copy()
    norms = [float(np.linalg.norm(r))]
    for _ in range(max_outer):
        if norms[-1] <= tol * bnorm:
            break
        # scale the defect to O(1) so the f32 inner solve keeps relative
        # accuracy regardless of how small the residual has become
        scale = np.linalg.norm(r)
        r_pair = np.stack(
            [(r / scale).real, (r / scale).imag], axis=-1
        ).astype(np.float32)
        res = solve_helmholtz(
            op, k_sq_dev, jnp.asarray(r_pair),
            mode=mode, restart=inner_restart,
            max_restarts=inner_max_restarts, tol=inner_tol,
            precond=precond,
        )
        d_pair = np.asarray(jax.device_get(res.x), np.float64)
        d = (d_pair[..., 0] + 1j * d_pair[..., 1]) * scale
        x = x + d
        r = b - host_op(x)
        norms.append(float(np.linalg.norm(r)))
    return x, norms
