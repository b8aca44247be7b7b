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
    mode: str = "matmul",
) -> tuple[SpectralPML, jax.Array]:
    """Coarse rediscretized operator + index-space k^2 for a factor-`factor`
    coarsening of an [H, W] fine grid. Returns (op_c, k_sq_c_idx) where the
    coarse index-space system is (L_idx + k_sq_c_idx) e = factor^2 * R r.
    `mode` decides whether the dense per-axis matmul tables are built —
    skipped when the configured mode resolves to fft at the coarse size
    (at a 4096^2 coarse level they are 268 MB of HBM fft never reads)."""
    from ..ops.spectral import resolve_mode

    hf, wf = k_sq.shape
    hc, wc = hf // factor, wf // factor
    # PML thickness in gridpoints shrinks with the grid; sigma_max is the
    # dimensionless profile peak (same role at either resolution)
    op_c = make_operator(
        hc, wc, max(pml_size // factor, 4), sigma_max, k0 * factor,
        dense=resolve_mode(mode, hc, wc) != "fft",
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
        k_sq, k0=k0, pml_size=pml_size, sigma_max=sigma_max, factor=factor,
        mode=mode,
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


def make_multilevel_preconditioner(
    op: SpectralPML,
    k_sq: jax.Array,
    *,
    k0: float,
    pml_size: int,
    sigma_max: float,
    mode: str = "auto",
    levels: int = 3,
    factor: int = 2,
    shift: Tuple[float, float] = (1.0, 0.5),
    smoother: str = "cslp",
    params=None,
    cfg=None,
    smoother_iterations: int = 20,
    coarse_restart: int = 32,
    coarse_max_restarts: int = 2,
    inner_restart: int = 6,
    inner_cycles: int = 1,
    transfer: str = "spectral",
) -> Callable[[jax.Array], jax.Array]:
    """Recursive multilevel-Krylov preconditioner (Erlangga & Nabben's
    MKMG made TPU-native), generalizing the two-level cycle to `levels`
    grids: each level applies one multiplicative two-grid cycle
    (smoother + next-level correction); INTERMEDIATE-level corrections
    are solved by `inner_cycles` on-device FGMRES(inner_restart) cycles
    preconditioned by the NEXT level's cycle (the recursion — flexible,
    because the sub-preconditioner is inexact), and the DEEPEST level is
    solved by CSLP-GMRES exactly like the two-level method.

    Why it exists: at very large grids the two-level coarse problem is
    itself too big to solve accurately at fixed cost. Recursing keeps
    every level's direct work at the small deepest grid while each
    intermediate level only needs a few flexible Krylov steps.

    RESOLVABILITY CONSTRAINT (enforced): the deepest grid must still
    resolve the wave — >= 2 points per wavelength at factor^(levels-1)
    coarsening, i.e. fine-grid ppw >= 2 * factor^(levels-1). A spectral
    coarse grid below 2 ppw aliases the wavenumber and the "correction"
    actively diverges (measured: 3 levels at the JCP discretization's
    ~6.3 fine ppw stalls at 8e-3 where the ppw-valid problem reaches
    3e-6). At ~6.3 ppw two levels IS the depth limit; levels>=3 is for
    oversampled discretizations (e.g. >= 10 ppw medical grids).

    The whole recursion unrolls at trace time into one jittable apply —
    pair it with solve_fgmres(host_arnoldi=True) so a dispatch stays one
    outer Krylov step. smoother='learned' applies at level 0 only
    (coarser levels use CSLP: the network smoother is worth its cost on
    the finest residual; below that the FFT inverse is cheaper).
    """
    if levels < 2:
        raise ValueError("levels must be >= 2")
    k_max = float(jnp.sqrt(jnp.max(k_sq)))
    deepest_ppw = (2.0 * jnp.pi / k_max) / (factor ** (levels - 1))
    if deepest_ppw < 2.0:
        max_levels = int(
            jnp.floor(jnp.log((2.0 * jnp.pi / k_max) / 2.0)
                      / jnp.log(float(factor))) + 1
        )
        raise ValueError(
            f"deepest level underresolves the wave: {deepest_ppw:.2f} "
            f"points/wavelength < 2 at factor^{levels - 1} coarsening "
            f"(fine grid has {2 * jnp.pi / k_max:.1f} ppw). Max valid "
            f"levels here: {max(max_levels, 2)}."
        )
    from .fgmres import _fgmres_cycle

    resize = (spectral_resize_complex if transfer == "spectral"
              else resize_complex)

    def build(op_l, k_sq_l, k0_l, pml_l, level):
        hl, wl = k_sq_l.shape
        mv_l = make_helmholtz_matvec(op_l, k_sq_l, mode)

        if level == 0 and smoother == "learned":
            if params is None or cfg is None:
                raise ValueError("smoother='learned' requires params and cfg")
            from .fgmres import make_learned_preconditioner

            smooth = make_learned_preconditioner(
                params, op_l, jnp.sqrt((cfg.source.omega ** 2) / k_sq_l),
                cfg=cfg, iterations=smoother_iterations,
            )
        elif level == 0 and smoother == "none":
            smooth = None
        else:
            smooth = make_shifted_laplace_inverse(op_l, k_sq_l, shift)

        hc, wc = hl // factor, wl // factor
        op_c, k_sq_c = make_coarse_level(
            k_sq_l, k0=k0_l, pml_size=pml_l, sigma_max=sigma_max,
            factor=factor, mode=mode,
        )
        mv_c = make_helmholtz_matvec(op_c, k_sq_c, mode)

        if level + 2 >= levels:  # next level is the deepest: CSLP-GMRES
            minv_c = make_shifted_laplace_inverse(op_c, k_sq_c, shift)

            def solve_c(rc: jax.Array) -> jax.Array:
                res = gmres_restarted(
                    lambda v: mv_c(minv_c(v)), rc,
                    restart=coarse_restart,
                    max_restarts=coarse_max_restarts, tol=1e-8,
                )
                return minv_c(res.x)

        else:  # intermediate level: few flexible Krylov steps, recurse
            sub = build(op_c, k_sq_c, k0_l * factor,
                        max(pml_l // factor, 4), level + 1)
            mvc_flat = lambda v: mv_c(v.reshape(hc, wc)).reshape(-1)
            sub_flat = lambda v: sub(v.reshape(hc, wc)).reshape(-1)

            def solve_c(rc: jax.Array) -> jax.Array:
                rf = rc.reshape(-1)
                zf = jnp.zeros(rf.shape, jnp.float32)
                x = jax.lax.complex(zf, zf).astype(rf.dtype)
                for _ in range(inner_cycles):
                    x = _fgmres_cycle(mvc_flat, sub_flat, rf, x,
                                      restart=inner_restart)
                return x.reshape(hc, wc)

        def apply(v: jax.Array) -> jax.Array:
            v2 = v.reshape(hl, wl)
            if smooth is None:
                z1r = jnp.zeros_like(v2.real)
                z1 = jax.lax.complex(z1r, z1r)
                r = v2
            else:
                z1 = smooth(v2)
                r = v2 - mv_l(z1)
            rc = resize(r, (hc, wc))
            ec = solve_c(float(factor * factor) * rc)
            z = z1 + resize(ec, (hl, wl))
            return z.reshape(v.shape)

        return apply

    return build(op, k_sq, k0, pml_size, 0)


def solve_fgmres_multilevel(
    op: SpectralPML,
    source: jax.Array,
    sos_map: jax.Array,
    *,
    cfg,
    geometry=None,
    levels: int = 3,
    smoother: str = "cslp",
    params=None,
    factor: int = 2,
    smoother_iterations: int = 20,
    coarse_restart: int = 32,
    coarse_max_restarts: int = 2,
    inner_restart: int = 6,
    inner_cycles: int = 1,
    transfer: str = "spectral",
    restart: int = 10,
    max_restarts: int = 20,
    tol: float = 1e-5,
    x0: Optional[jax.Array] = None,
    host_arnoldi: bool = False,
    recycle_k: int = 0,
    recycle_state=None,
    budget_s=None,
    on_cycle=None,
    keep_x_complex: bool = False,
    verbose: bool = False,
):
    """Flexible GMRES with the recursive multilevel preconditioner.

    levels=2 reproduces solve_fgmres_two_level; levels>=3 is the very-
    large-grid tool (each level's direct solve stays at the small deepest
    grid). source: [H, W, 2] channel pair; sos_map: [H, W]."""
    from .fgmres import solve_fgmres

    geometry = geometry or cfg.geometry
    k_sq = (cfg.source.omega / jnp.asarray(sos_map, jnp.float32)) ** 2
    precond_field = make_multilevel_preconditioner(
        op, k_sq, k0=cfg.k0, pml_size=geometry.pml_size,
        sigma_max=geometry.sigma_max, mode=cfg.operator_mode,
        levels=levels, factor=factor, shift=(1.0, 0.5), smoother=smoother,
        params=params, cfg=cfg, smoother_iterations=smoother_iterations,
        coarse_restart=coarse_restart,
        coarse_max_restarts=coarse_max_restarts,
        inner_restart=inner_restart, inner_cycles=inner_cycles,
        transfer=transfer,
    )
    return solve_fgmres(
        op, source, sos_map, cfg=cfg, precond_field=precond_field,
        restart=restart, max_restarts=max_restarts, tol=tol, x0=x0,
        host_arnoldi=host_arnoldi, recycle_k=recycle_k,
        recycle_state=recycle_state, budget_s=budget_s, on_cycle=on_cycle,
        keep_x_complex=keep_x_complex, verbose=verbose,
    )


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
    recycle_k: int = 0,
    recycle_state=None,
    budget_s=None,
    on_cycle=None,
    keep_x_complex: bool = False,
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
        host_arnoldi=host_arnoldi, recycle_k=recycle_k,
        recycle_state=recycle_state, budget_s=budget_s, on_cycle=on_cycle,
        keep_x_complex=keep_x_complex, verbose=verbose,
    )
