"""Two-level (multilevel-Krylov) preconditioning for high-wavenumber
heterogeneous Helmholtz.

Closes the strong-heterogeneity gap documented in PERF_NOTES.md: at high
wavenumber with strong sos contrast, both the constant-coefficient CSLP
(solvers/precond.py) and the learned preconditioner (solvers/fgmres.py)
plateau — CSLP because it ignores the medium, the learned rollout
because a short inner solve is LOCAL (a K-iteration rollout propagates
information a bounded distance, far less than a 1024^2 domain crossing).
What both miss is the globally-coupled smooth/characteristic error, and
the classical cure is a coarse-grid correction (Erlangga & Nabben's
multilevel Krylov method; the reference has no counterpart — its MATLAB
GMRES is unpreconditioned, matlab/spectral_gmres_solver.m:95-115).

TPU-first design choices:
- The coarse level is a factor-2 REDISCRETIZED spectral PML operator.
  Spectral accuracy holds down to 2 points per wavelength, so a factor-2
  spectral coarse grid is still dispersion-free where FD multigrid would
  need 8-10 ppw — exactly the property that makes two-level work at high
  wavenumber. Coarse-grid index-space scaling: with coarse spacing
  2*dx, A_c = (L_idx + (2 dx k)^2)/(2 dx)^2, so the correction solves
  (L_idx + 4 k_sq_c) e = 4 r_c in index space (dx == 1 on the fine grid).
- Inter-grid transfer is jax.image linear resize on split re/im planes
  (complex literals never cross the host boundary — axon constraint).
- The coarse problem (still indefinite) is solved APPROXIMATELY by a few
  on-device CSLP-GMRES cycles; the outer iteration must therefore be
  FLEXIBLE GMRES (solvers/fgmres.py), which admits an inexact,
  iteration-varying preconditioner.
- Smoother options: 'cslp' (two FFTs, medium-blind) or 'learned' (the
  trained network as a medium-aware smoother, fresh state per apply).

The composition is one multiplicative two-grid cycle per apply:
    z1 = S(v);  r = v - A z1;  z = z1 + P A_c^{-approx} R r.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.spectral import SpectralPML, make_operator
from .gmres import gmres_restarted, make_helmholtz_matvec
from .precond import make_shifted_laplace_inverse


def resize_complex(v: jax.Array, shape: Tuple[int, int]) -> jax.Array:
    """Bilinear resize of a complex [H, W] field via split re/im planes."""
    re = jax.image.resize(v.real, shape, method="linear")
    im = jax.image.resize(v.imag, shape, method="linear")
    return jax.lax.complex(re, im)


def spectral_resize_complex(v: jax.Array, shape: Tuple[int, int]) -> jax.Array:
    """Fourier resize of a complex [H, W] field: FFT truncation (down) or
    zero-padding (up). EXACT for every mode the target grid resolves —
    the right transfer for a spectral coarse grid near 2-3 points per
    wavelength, where bilinear interpolation error is O(1) and destroys
    the coarse correction. O(N^2 log N); periodic wraparound is damped by
    the PML layers at the domain edge."""
    hf, wf = v.shape
    hc, wc = shape
    F = jnp.fft.fft2(v)

    def corner_take(F, h, w):
        top = jnp.concatenate(
            [F[: h - h // 2, : w - w // 2], F[: h - h // 2, wf - w // 2:]],
            axis=1,
        )
        bot = jnp.concatenate(
            [F[hf - h // 2:, : w - w // 2], F[hf - h // 2:, wf - w // 2:]],
            axis=1,
        )
        return jnp.concatenate([top, bot], axis=0)

    if hc <= hf and wc <= wf:
        Fc = corner_take(F, hc, wc)
    else:
        zf = jnp.zeros((hc, wc), jnp.float32)
        Fc = jax.lax.complex(zf, zf)
        Fc = Fc.at[: hf - hf // 2, : wf - wf // 2].set(
            F[: hf - hf // 2, : wf - wf // 2])
        Fc = Fc.at[: hf - hf // 2, wc - wf // 2:].set(
            F[: hf - hf // 2, wf - wf // 2:])
        Fc = Fc.at[hc - hf // 2:, : wf - wf // 2].set(
            F[hf - hf // 2:, : wf - wf // 2])
        Fc = Fc.at[hc - hf // 2:, wc - wf // 2:].set(
            F[hf - hf // 2:, wf - wf // 2:])
    scale = (hc * wc) / (hf * wf)
    return jnp.fft.ifft2(Fc * scale)


def make_coarse_level(
    k_sq: jax.Array,
    *,
    k0: float,
    pml_size: int,
    sigma_max: float,
    factor: int = 2,
) -> tuple[SpectralPML, jax.Array]:
    """Coarse rediscretized operator + index-space k^2 for a factor-`factor`
    coarsening of an [H, W] fine grid. Returns (op_c, k_sq_c_idx) where the
    coarse index-space system is (L_idx + k_sq_c_idx) e = factor^2 * R r."""
    hf, wf = k_sq.shape
    hc, wc = hf // factor, wf // factor
    # PML thickness in gridpoints shrinks with the grid; sigma_max is the
    # dimensionless profile peak (same role at either resolution)
    op_c = make_operator(
        hc, wc, max(pml_size // factor, 4), sigma_max, k0 * factor
    )
    k_sq_c = jax.image.resize(k_sq, (hc, wc), method="linear")
    return op_c, (factor * factor) * k_sq_c


def make_two_level_preconditioner(
    op: SpectralPML,
    k_sq: jax.Array,
    *,
    k0: float,
    pml_size: int,
    sigma_max: float,
    mode: str = "matmul",
    factor: int = 2,
    shift: Tuple[float, float] = (1.0, 0.5),
    smoother: str = "cslp",
    params=None,
    cfg=None,
    smoother_iterations: int = 20,
    coarse_restart: int = 32,
    coarse_max_restarts: int = 2,
    transfer: str = "spectral",
) -> Callable[[jax.Array], jax.Array]:
    """Two-grid preconditioner apply: complex [H, W] -> complex [H, W].

    smoother='cslp' uses the FFT shifted-Laplace inverse; 'learned' uses
    `smoother_iterations` fresh-state network steps (requires params+cfg,
    see solvers/fgmres.make_learned_preconditioner). The coarse residual
    equation is solved by CSLP-GMRES(coarse_restart) x coarse_max_restarts
    on the factor-`factor` rediscretized spectral operator, all on device.
    transfer='spectral' (default: exact for resolvable modes) or 'linear'.
    """
    hf, wf = k_sq.shape
    hc, wc = hf // factor, wf // factor
    mv_f = make_helmholtz_matvec(op, k_sq, mode)

    if smoother == "learned":
        if params is None or cfg is None:
            raise ValueError("smoother='learned' requires params and cfg")
        from .fgmres import make_learned_preconditioner

        smooth = make_learned_preconditioner(
            params, op, jnp.sqrt((cfg.source.omega ** 2) / k_sq), cfg=cfg,
            iterations=smoother_iterations,
        )
    elif smoother == "cslp":
        smooth = make_shifted_laplace_inverse(op, k_sq, shift)
    elif smoother == "none":
        smooth = None
    else:
        raise ValueError(f"unknown smoother '{smoother}'")

    op_c, k_sq_c_idx = make_coarse_level(
        k_sq, k0=k0, pml_size=pml_size, sigma_max=sigma_max, factor=factor
    )
    mv_c = make_helmholtz_matvec(op_c, k_sq_c_idx, mode)
    minv_c = make_shifted_laplace_inverse(op_c, k_sq_c_idx, shift)

    def coarse_solve(rc: jax.Array) -> jax.Array:
        """Approximate (L_idx + k_sq_idx)^-1 rc by right-CSLP GMRES."""
        res = gmres_restarted(
            lambda v: mv_c(minv_c(v)), rc,
            restart=coarse_restart, max_restarts=coarse_max_restarts,
            tol=1e-8,
        )
        return minv_c(res.x)

    resize = (spectral_resize_complex if transfer == "spectral"
              else resize_complex)

    def apply(v: jax.Array) -> jax.Array:
        v2 = v.reshape(hf, wf)
        if smooth is None:
            z1 = jnp.zeros_like(v2.real)
            z1 = jax.lax.complex(z1, z1)
            r = v2
        else:
            z1 = smooth(v2)
            r = v2 - mv_f(z1)
        rc = resize(r, (hc, wc))
        ec = coarse_solve(float(factor * factor) * rc)
        z = z1 + resize(ec, (hf, wf))
        return z.reshape(v.shape)

    return apply


def solve_fgmres_two_level(
    op: SpectralPML,
    source: jax.Array,
    sos_map: jax.Array,
    *,
    cfg,
    geometry=None,
    smoother: str = "cslp",
    params=None,
    factor: int = 2,
    smoother_iterations: int = 20,
    coarse_restart: int = 32,
    coarse_max_restarts: int = 2,
    transfer: str = "spectral",
    restart: int = 10,
    max_restarts: int = 20,
    tol: float = 1e-5,
    x0: Optional[jax.Array] = None,
    host_arnoldi: bool = False,
    verbose: bool = False,
):
    """Flexible GMRES with the two-level preconditioner.

    source: [H, W, 2] channel pair; sos_map: [H, W]. Host-chunked like
    solve_fgmres_learned (one restart cycle per dispatch)."""
    from .fgmres import solve_fgmres

    geometry = geometry or cfg.geometry
    k_sq = (cfg.source.omega / jnp.asarray(sos_map, jnp.float32)) ** 2
    precond_field = make_two_level_preconditioner(
        op, k_sq, k0=cfg.k0, pml_size=geometry.pml_size,
        sigma_max=geometry.sigma_max, mode=cfg.operator_mode, factor=factor,
        smoother=smoother, params=params, cfg=cfg,
        smoother_iterations=smoother_iterations,
        coarse_restart=coarse_restart,
        coarse_max_restarts=coarse_max_restarts,
        transfer=transfer,
    )
    return solve_fgmres(
        op, source, sos_map, cfg=cfg, precond_field=precond_field,
        restart=restart, max_restarts=max_restarts, tol=tol, x0=x0,
        host_arnoldi=host_arnoldi, verbose=verbose,
    )
