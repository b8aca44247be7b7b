"""Two-level (coarse-grid corrected) flexible GMRES in 3D.

The 3D stack (capability extension — the reference at
/root/reference/helmnet is 2D-only) previously had CSLP-GMRES only
(solvers/helm3d.py). This adds the composition that closed the 2D
strong-heterogeneity/high-wavenumber regime (solvers/twolevel.py): CSLP
smoother + factor-2 REDISCRETIZED spectral coarse-grid correction solved
approximately on device, under a flexible outer Krylov iteration.

Everything is the 3D analog of the 2D module, with the same TPU-first
choices: the coarse operator is three per-axis complex MXU matmuls (or
1D FFTs) on a spectrally-accurate factor-2 grid; inter-grid transfer is
3D Fourier truncation/zero-padding (exact for every coarse-resolvable
mode — at 2-3 points per wavelength trilinear interpolation error is
O(1) and destroys the correction); the outer flexible Arnoldi can run
host-driven so one dispatch stays one Krylov step (the tunneled worker's
~30 s single-dispatch limit). The same 2-ppw resolvability constraint
applies: a factor-2 coarse grid needs >= 4 fine points per wavelength.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.spectral3d import SpectralPML3D, make_operator3d
from .fgmres import FGMRESResult
from .gmres import gmres_restarted
from .helm3d import make_helmholtz_matvec3d, make_shifted_laplace_inverse3d


def _freq_indices(n_src: int, n_keep: int) -> np.ndarray:
    """FFT-order indices of the n_keep lowest-|frequency| modes among
    n_src (positive block first, then the negative tail)."""
    return np.concatenate([
        np.arange(0, n_keep - n_keep // 2),
        np.arange(n_src - n_keep // 2, n_src),
    ])


def spectral_resize_complex3d(
    v: jax.Array, shape: Tuple[int, int, int]
) -> jax.Array:
    """Fourier resize of a complex [D, H, W] volume: FFT truncation (down)
    or zero-padding (up). Exact for every mode the target grid resolves.
    Mixed per-axis up/down is not supported (not needed for uniform
    factor-2 levels)."""
    src = v.shape
    dst = tuple(shape)
    axes = (-3, -2, -1)
    F = jnp.fft.fftn(v, axes=axes)
    if all(d <= s for d, s in zip(dst, src)):
        idx = np.ix_(*[_freq_indices(s, d) for s, d in zip(src, dst)])
        Fc = F[idx]
    elif all(d >= s for d, s in zip(dst, src)):
        zf = jnp.zeros(dst, jnp.float32)
        Fc = jax.lax.complex(zf, zf)
        idx = np.ix_(*[_freq_indices(d, s) for s, d in zip(src, dst)])
        Fc = Fc.at[idx].set(F)
    else:
        raise ValueError(f"mixed up/down resize {src} -> {dst}")
    scale = float(np.prod(dst)) / float(np.prod(src))
    return jnp.fft.ifftn(Fc * scale, axes=axes)


def make_coarse_level3d(
    k_sq: jax.Array,
    *,
    k0: float,
    pml_size: int,
    sigma_max: float,
    factor: int = 2,
) -> tuple[SpectralPML3D, jax.Array]:
    """Coarse rediscretized 3D operator + index-space k^2 (the 3D analog
    of twolevel.make_coarse_level: coarse spacing factor*dx means the
    index-space system is (L_idx + factor^2 k_sq_c) e = factor^2 R r)."""
    df, hf, wf = k_sq.shape
    dc, hc, wc = df // factor, hf // factor, wf // factor
    op_c = make_operator3d(
        dc, hc, wc, max(pml_size // factor, 4), sigma_max, k0 * factor
    )
    k_sq_c = jax.image.resize(k_sq, (dc, hc, wc), method="linear")
    return op_c, (factor * factor) * k_sq_c


def make_learned_preconditioner3d(params, op: SpectralPML3D, sos_map,
                                  *, cfg, iterations: int = 20):
    """complex [D, H, W] -> complex [D, H, W] approximate A^-1 v.

    3D analog of fgmres.make_learned_preconditioner: `iterations` learned
    HybridNet3D steps on A z = v from zero wavefield and FRESH hidden
    states, with v amplitude-normalized to the training source scale (the
    solve is linear, the network is not); returns the best iterate,
    un-normalized."""
    from .iterative3d import rollout3d

    sos = jnp.asarray(sos_map, jnp.float32)[None]

    def apply(v: jax.Array) -> jax.Array:
        src = jnp.stack([v.real, v.imag], axis=-1)[None]
        amp = jnp.max(jnp.abs(v))
        scale = jnp.where(amp > 0, cfg.source.amplitude / amp, 1.0)
        out = rollout3d(
            params, op, src * scale.astype(src.dtype), sos, cfg=cfg,
            num_iterations=iterations, collect=("rmse", "best"),
        )
        w = out["best_wavefield"][0] / scale
        return jax.lax.complex(w[..., 0], w[..., 1])

    return apply


def make_two_level_preconditioner3d(
    op: SpectralPML3D,
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
    coarse_restart: int = 16,
    coarse_max_restarts: int = 2,
) -> Callable[[jax.Array], jax.Array]:
    """Two-grid preconditioner apply: complex [D, H, W] -> same shape.
    One multiplicative cycle: z1 = S(v); r = v - A z1;
    z = z1 + P A_c^{-approx} R r.

    smoother='cslp' uses the FFT shifted-Laplace inverse; 'learned' uses
    `smoother_iterations` fresh-state HybridNet3D steps (requires
    params+cfg, see make_learned_preconditioner3d)."""
    shape = k_sq.shape
    dc, hc, wc = (s // factor for s in shape)
    mv_f = make_helmholtz_matvec3d(op, k_sq, mode)

    if smoother == "learned":
        if params is None or cfg is None:
            raise ValueError("smoother='learned' requires params and cfg")
        smooth = make_learned_preconditioner3d(
            params, op, jnp.sqrt((cfg.source.omega ** 2) / k_sq), cfg=cfg,
            iterations=smoother_iterations,
        )
    elif smoother == "cslp":
        smooth = make_shifted_laplace_inverse3d(op, k_sq, shift)
    elif smoother == "none":
        smooth = None
    else:
        raise ValueError(f"unknown 3D smoother '{smoother}'")

    op_c, k_sq_c_idx = make_coarse_level3d(
        k_sq, k0=k0, pml_size=pml_size, sigma_max=sigma_max, factor=factor
    )
    mv_c = make_helmholtz_matvec3d(op_c, k_sq_c_idx, mode)
    minv_c = make_shifted_laplace_inverse3d(op_c, k_sq_c_idx, shift)

    def coarse_solve(rc: jax.Array) -> jax.Array:
        res = gmres_restarted(
            lambda v: mv_c(minv_c(v)), rc,
            restart=coarse_restart, max_restarts=coarse_max_restarts,
            tol=1e-8,
        )
        return minv_c(res.x)

    def apply(v: jax.Array) -> jax.Array:
        v3 = v.reshape(shape)
        if smooth is None:
            zr = jnp.zeros_like(v3.real)
            z1 = jax.lax.complex(zr, zr)
            r = v3
        else:
            z1 = smooth(v3)
            r = v3 - mv_f(z1)
        rc = spectral_resize_complex3d(r, (dc, hc, wc))
        ec = coarse_solve(float(factor * factor) * rc)
        z = z1 + spectral_resize_complex3d(ec, shape)
        return z.reshape(v.shape)

    return apply


def solve_fgmres_two_level3d(
    op: SpectralPML3D,
    source: jax.Array,
    k_sq: jax.Array,
    *,
    k0: float,
    pml_size: int,
    sigma_max: float,
    mode: str = "matmul",
    factor: int = 2,
    smoother: str = "cslp",
    params=None,
    cfg=None,
    smoother_iterations: int = 20,
    shift: Tuple[float, float] = (1.0, 0.5),
    coarse_restart: int = 16,
    coarse_max_restarts: int = 2,
    restart: int = 8,
    max_restarts: int = 10,
    tol: float = 1e-5,
    x0: Optional[jax.Array] = None,
    host_arnoldi: bool = False,
    recycle_k: int = 0,
    recycle_state=None,
    budget_s=None,
    on_cycle=None,
    keep_x_complex: bool = False,
    verbose: bool = False,
) -> FGMRESResult:
    """Flexible GMRES with the 3D two-level preconditioner.

    source: [D, H, W, 2] channel pair; k_sq: [D, H, W] real. Residual
    norms are TRUE relative residuals; host_arnoldi=True makes each outer
    Krylov step its own bounded device dispatch."""
    source = jnp.asarray(source)
    b = jax.lax.complex(source[..., 0], source[..., 1])
    shape = b.shape
    mv_field = make_helmholtz_matvec3d(op, k_sq, mode)
    mv = lambda v: mv_field(v.reshape(shape)).reshape(-1)
    precond_field = make_two_level_preconditioner3d(
        op, k_sq, k0=k0, pml_size=pml_size, sigma_max=sigma_max, mode=mode,
        factor=factor, shift=shift, smoother=smoother,
        params=params, cfg=cfg, smoother_iterations=smoother_iterations,
        coarse_restart=coarse_restart,
        coarse_max_restarts=coarse_max_restarts,
    )
    precond = lambda v: precond_field(v.reshape(shape)).reshape(-1)

    from .fgmres import run_fgmres_loop

    return run_fgmres_loop(
        mv, precond, b.reshape(-1), shape, restart=restart,
        max_restarts=max_restarts, tol=tol, x0=x0,
        host_arnoldi=host_arnoldi, recycle_k=recycle_k,
        recycle_state=recycle_state, budget_s=budget_s, on_cycle=on_cycle,
        keep_x_complex=keep_x_complex, verbose=verbose, label="fgmres3d",
    )
