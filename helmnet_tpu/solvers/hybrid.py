"""Hybrid solver: learned warm start + GMRES polish.

The learned iteration converges in tens of steps on in-distribution
problems but can oscillate on far out-of-distribution ones (huge grids,
extended transducer sources — see PERF_NOTES/TRAINING). The production-
robust path: run N learned iterations tracking the minimum-residual
iterate, then hand that iterate to restarted GMRES as the initial guess.
Krylov polishing from a good warm start costs a fraction of a cold solve
and comes with the classical convergence guarantee the learned solver
lacks. (The reference has no equivalent; its fallback is a cold MATLAB
GMRES run — BASELINE.json config 4 "learned iterations + GMRES fallback".)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config
from ..ops.spectral import SpectralPML
from .gmres import gmres_restarted_early_exit, make_helmholtz_matvec
from .iterative import rollout


class HybridResult(NamedTuple):
    wavefield: jax.Array  # [B, H, W, 2] polished solution
    warm_rmse: jax.Array  # [B] best learned residual RMSE (warm start)
    final_relres: jax.Array  # [B] GMRES relative residual after polish
    gmres_iterations: jax.Array  # [B]


def solve_hybrid(
    params,
    op: SpectralPML,
    source: jax.Array,
    sos_maps: jax.Array,
    *,
    cfg: Config,
    learned_iterations: int = 100,
    restart: int = 50,
    max_restarts: int = 10,
    tol: float = 1e-6,
    precond: str = "none",
    shift: tuple = (1.0, 0.5),
) -> HybridResult:
    """Learned warm start + per-sample GMRES polish (vmapped).

    precond='shifted_laplace' right-preconditions the polish with the
    CSLP operator (solvers/precond.py) — essential at high wavenumber
    (large grids), where the bare Krylov polish itself stalls. The warm
    start enters as defect correction (solve A M^-1 y = b - A x0 from
    y0 = 0, then x = x0 + M^-1 y): mapping x0 through M instead would
    amplify its high-frequency error by the Laplacian symbol and poison
    the Krylov space. Reported residuals remain TRUE residuals of the
    original system (A x - b == A M^-1 y - b_eff)."""
    out = rollout(
        params, op, source, sos_maps, cfg=cfg,
        num_iterations=learned_iterations, collect=("rmse", "best"),
    )
    warm = out["best_wavefield"]  # [B, H, W, 2]
    k_sq = (cfg.source.omega / sos_maps) ** 2

    def polish(w, ks, src):
        mv = make_helmholtz_matvec(op, ks, cfg.operator_mode)
        b = jax.lax.complex(src[..., 0], src[..., 1])
        x0 = jax.lax.complex(w[..., 0], w[..., 1])
        if precond == "shifted_laplace":
            from .precond import make_shifted_laplace_inverse

            minv = make_shifted_laplace_inverse(op, ks, shift)
            b_eff = b - mv(x0)
            y, rn, iters = gmres_restarted_early_exit(
                lambda v: mv(minv(v)), b_eff, jnp.zeros_like(b_eff),
                restart=restart, max_restarts=max_restarts,
                tol=tol * jnp.linalg.norm(b.reshape(-1))
                / jnp.maximum(jnp.linalg.norm(b_eff.reshape(-1)), 1e-30),
            )
            x = x0 + minv(y)
        else:
            x, rn, iters = gmres_restarted_early_exit(
                mv, b, x0, restart=restart, max_restarts=max_restarts,
                tol=tol,
            )
        rel = rn / jnp.maximum(jnp.linalg.norm(b.reshape(-1)), 1e-30)
        return jnp.stack([x.real, x.imag], axis=-1), rel, iters

    fields, rels, iters = jax.vmap(polish)(warm, k_sq, source)
    return HybridResult(
        wavefield=fields,
        warm_rmse=out["best_rmse"],
        final_relres=rels,
        gmres_iterations=iters,
    )
