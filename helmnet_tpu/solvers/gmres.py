"""Matrix-free restarted GMRES for the PML Helmholtz system.

First-class TPU replacement for the reference's MATLAB side-channel solver
(matlab/spectral_gmres_solver.m): same restarted GMRES semantics with a
solution/residual checkpoint every restart cycle, but matrix-free — the
operator application is the MXU matmul spectral operator instead of an
explicit sparse kron matrix, and whole test-set sweeps are a `vmap` instead
of a MATLAB parpool (parallel_spectral_gmres_solver.m).

Arnoldi uses modified Gram-Schmidt with masked inner loops so the whole
solve is one fixed-shape `lax.scan` — no dynamic shapes, fully jittable,
batchable, shardable. Complex vectors are native complex64 (complex128 on
CPU if x64 is enabled).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.spectral import SpectralPML, laplacian
from ..ops.stencil import StencilPML, laplacian_stencil


class GMRESResult(NamedTuple):
    x: jax.Array  # solution, same shape as b
    residual_norms: jax.Array  # [num_restarts + 1] true residual 2-norms
    checkpoints: jax.Array  # [num_restarts, *b.shape] solution after each cycle
    iterations: jax.Array  # total inner iterations performed


def _arnoldi_cycle(matvec, b, x0, restart: int):
    """One GMRES(m) cycle. Returns (x_new, true_residual_norm_estimate)."""
    n = b.shape[0]
    dtype = b.dtype
    r0 = b - matvec(x0)
    beta = jnp.linalg.norm(r0)
    safe_beta = jnp.where(beta > 0, beta, 1.0)

    V0 = jnp.zeros((restart + 1, n), dtype).at[0].set(r0 / safe_beta)
    H0 = jnp.zeros((restart + 1, restart), dtype)

    def body(j, carry):
        V, H = carry
        w = matvec(V[j])
        # masked modified Gram-Schmidt against V[0..j]
        def mgs(i, carry_w):
            w, hcol = carry_w
            active = i <= j
            h = jnp.where(active, jnp.vdot(V[i], w), 0.0)
            w = w - h * V[i]
            return w, hcol.at[i].set(h)

        w, hcol = jax.lax.fori_loop(
            0, restart, mgs, (w, jnp.zeros(restart + 1, dtype))
        )
        hnorm = jnp.linalg.norm(w)
        hcol = hcol.at[j + 1].set(hnorm.astype(dtype))
        safe = jnp.where(hnorm > 0, hnorm, 1.0)
        V = V.at[j + 1].set(w / safe)
        H = H.at[:, j].set(hcol)
        return V, H

    V, H = jax.lax.fori_loop(0, restart, body, (V0, H0))

    # least squares  min_y || beta e1 - H y ||  (small [m+1, m] system)
    e1 = jnp.zeros(restart + 1, dtype).at[0].set(beta.astype(dtype))
    y, _, _, _ = jnp.linalg.lstsq(H, e1)
    x_new = x0 + V[:restart].T @ y
    return jnp.where(beta > 0, 1.0, 0.0) * x_new + jnp.where(beta > 0, 0.0, 1.0) * x0


def gmres_restarted(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    restart: int = 20,
    max_restarts: int = 50,
    tol: float = 1e-10,
) -> GMRESResult:
    """Restarted GMRES with per-cycle solution checkpoints.

    Semantics match matlab/spectral_gmres_solver.m:95-115: run
    `max_restarts` cycles of GMRES(restart); record the solution and the TRUE
    residual norm ||b - A x|| after each cycle. Once the relative residual
    falls below `tol`, further cycles keep the converged solution (masked
    no-op) so shapes stay static.
    """
    flat = b.reshape(-1)
    x0f = jnp.zeros_like(flat) if x0 is None else x0.reshape(-1)
    mv = lambda v: matvec(v.reshape(b.shape)).reshape(-1)
    bnorm = jnp.linalg.norm(flat)
    r0 = jnp.linalg.norm(flat - mv(x0f))

    def cycle(carry, _):
        x, done, iters = carry
        x_new = _arnoldi_cycle(mv, flat, x, restart)
        x = jnp.where(done, x, x_new)
        rn = jnp.linalg.norm(flat - mv(x))
        iters = iters + jnp.where(done, 0, restart)
        done = done | (rn <= tol * jnp.maximum(bnorm, 1e-30))
        return (x, done, iters), (x, rn)

    (x, _, iters), (xs, rns) = jax.lax.scan(
        cycle, (x0f, jnp.array(False), jnp.array(0)), None, length=max_restarts
    )
    residual_norms = jnp.concatenate([r0[None], rns])
    return GMRESResult(
        x=x.reshape(b.shape),
        residual_norms=residual_norms,
        checkpoints=xs.reshape((max_restarts,) + b.shape),
        iterations=iters,
    )


# ---------------------------------------------------------------------------
# Helmholtz front end
# ---------------------------------------------------------------------------


def make_helmholtz_matvec(op, k_sq: jax.Array, mode: str = "auto"):
    """Complex matvec u -> L u + k^2 u on [H, W] complex grids.

    `op` may be the spectral operator (SpectralPML; `mode` selects
    matmul/fft) or the FD stencil operator (StencilPML) — the latter gives
    GMRES on the sparse 9-point system (the matrix-explicit MATLAB path)."""

    def mv(u: jax.Array) -> jax.Array:
        pair = jnp.stack([u.real, u.imag], axis=-1)[None]
        if isinstance(op, StencilPML):
            lap = laplacian_stencil(op, pair)[0]
        else:
            lap = laplacian(op, pair, mode)[0]
        lap_c = jax.lax.complex(lap[..., 0], lap[..., 1])
        return lap_c + k_sq.astype(u.real.dtype) * u

    return mv


def _solve_helmholtz_impl(
    op,
    k_sq: jax.Array,
    source: jax.Array,
    *,
    mode: str = "auto",
    restart: int = 20,
    max_restarts: int = 50,
    tol: float = 1e-10,
    precond: str = "none",
    shift: tuple = (1.0, 0.5),
) -> GMRESResult:
    """Solve (L + k^2) u = s for one problem.

    k_sq: [H, W] real; source: [H, W, 2] channel pair (or [H, W] complex).
    Returns channel-pair fields x/checkpoints of shape [..., H, W, 2].
    The reference drives MATLAB with `source amplitude 10` and tol 1e-10
    (support_functions.py:385-408); f32 stagnates near 1e-6 relative — use
    x64 on CPU or solvers/precond.solve_helmholtz_refined for tighter.

    precond='shifted_laplace' right-preconditions with the FFT-diagonal
    complex shifted Laplacian (solvers/precond.py) — the standard Helmholtz
    Krylov accelerator; essential at high wavenumber where the bare operator
    stalls GMRES. Residual norms remain TRUE residuals of the original
    system (right preconditioning).
    """
    if source.ndim == 3 and source.shape[-1] == 2:
        b = jax.lax.complex(source[..., 0], source[..., 1])
    else:
        # a real source still has a complex solution: promote explicitly
        b = jnp.asarray(source)
        if not jnp.iscomplexobj(b):
            b = b.astype(jnp.complex64)
    mv = make_helmholtz_matvec(op, k_sq, mode)
    if precond == "shifted_laplace":
        from .precond import make_shifted_laplace_inverse

        minv = make_shifted_laplace_inverse(op, k_sq, shift)
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
    # return channel-pair fields: complex host<->device transfers are not
    # supported on all TPU runtimes
    as_pair = lambda c: jnp.stack([c.real, c.imag], axis=-1)
    return GMRESResult(
        x=as_pair(res.x),
        residual_norms=res.residual_norms,
        checkpoints=as_pair(res.checkpoints),
        iterations=res.iterations,
    )


solve_helmholtz = functools.partial(
    jax.jit,
    static_argnames=("mode", "restart", "max_restarts", "tol", "precond",
                     "shift"),
)(_solve_helmholtz_impl)


@functools.lru_cache(maxsize=16)
def _checked_solver(mode, restart, max_restarts, tol, precond, shift):
    from ..core.sanitize import checked

    def fn(op, k_sq, source):
        return _solve_helmholtz_impl(
            op, k_sq, source, mode=mode, restart=restart,
            max_restarts=max_restarts, tol=tol, precond=precond, shift=shift,
        )

    return checked(fn, jit=True)


def solve_helmholtz_checked(
    op,
    k_sq: jax.Array,
    source: jax.Array,
    *,
    mode: str = "auto",
    restart: int = 20,
    max_restarts: int = 50,
    tol: float = 1e-10,
    precond: str = "none",
    shift: tuple = (1.0, 0.5),
) -> GMRESResult:
    """Sanitized solve_helmholtz: every primitive inside the GMRES cycles
    is checkify-instrumented (core/sanitize.py), so a NaN/inf born inside
    the solve — e.g. from a non-finite medium or source — raises a
    JaxRuntimeError naming the offending operation instead of silently
    filling the checkpoints with NaNs. Opt-in debugging path (SURVEY §5
    sanitizers); compiled executables are cached per option tuple."""
    return _checked_solver(mode, restart, max_restarts, tol, precond,
                           tuple(shift))(op, k_sq, source)


def solve_helmholtz_batch(
    op,
    k_sq_batch: jax.Array,
    source_batch: jax.Array,
    **kw,
) -> GMRESResult:
    """vmapped test-set sweep — replaces parallel_spectral_gmres_solver.m."""
    fn = lambda k, s: solve_helmholtz(op, k, s, **kw)
    return jax.vmap(fn)(k_sq_batch, source_batch)


def solve_helmholtz_chunked(
    op,
    k_sq: jax.Array,
    source: jax.Array,
    *,
    mode: str = "auto",
    restart: int = 25,
    max_cycles: int = 160,
    tol: float = 1e-4,
    precond: str = "shifted_laplace",
    shift: tuple = (1.0, 0.5),
    budget_s: float = float("inf"),
    verbose: bool = False,
    x0=None,
):
    """Host-chunked restarted GMRES: ONE bounded device dispatch per
    restart cycle, warm-started by defect correction (u += solve(-r(u))).

    x0: optional [H, W, 2] channel-pair initial iterate (e.g. the
    best-iterate of a learned rollout — the large-grid analog of
    solvers/hybrid.solve_hybrid). Defect correction makes warm starts
    exact: every cycle solves against the TRUE residual of the running
    iterate, so a good x0 only shrinks the work; reported norms remain
    true relative residuals of the original system.

    This is the production large-grid classical path (promoted from
    tools/r3_large_4096.py, which measured 4096^2 CSLP to 9.7e-5 with
    it): single dispatches past ~30 s crash the tunneled TPU worker, so
    a 2048^2+ solve must never run all its cycles in one jit. Everything
    enters the jit as ARGUMENTS (no baked closure constants — the
    remote-compile 413 hazard at very large grids). Returns a GMRESResult
    with per-cycle true relative residuals in residual_norms.
    """
    import time as _time

    import numpy as np

    from ..ops.spectral import helmholtz_residual

    if source.ndim == 3 and source.shape[-1] == 2:
        src = jnp.asarray(source)
    else:
        b = jnp.asarray(source)
        src = jnp.stack([b.real, b.imag], axis=-1) if jnp.iscomplexobj(b) \
            else jnp.stack([b, jnp.zeros_like(b)], axis=-1)

    @jax.jit
    def _neg_residual(op_, k_sq_, src_, u):
        r = helmholtz_residual(op_, u[None], k_sq_[None], src_[None],
                               mode=mode)[0]
        return -r, jnp.linalg.norm(r.reshape(-1))

    src_norm = float(np.asarray(jnp.linalg.norm(src.reshape(-1))))
    t0 = _time.time()
    if x0 is None:
        u = jnp.zeros(src.shape, jnp.float32)
    else:
        u = jnp.asarray(x0, jnp.float32)
        if u.shape != src.shape:
            raise ValueError(
                f"x0 shape {u.shape} != source pair shape {src.shape}")
    hist, cycles_run = [], 0
    for _ in range(max_cycles):
        b_eff, rnorm = _neg_residual(op, k_sq, src, u)
        hist.append(float(np.asarray(rnorm)) / max(src_norm, 1e-30))
        if verbose:
            print(f"  cslp-chunked[{cycles_run * restart}]: "
                  f"rel {hist[-1]:.3e}", flush=True)
        if hist[-1] < tol or _time.time() - t0 > budget_s:
            break
        step = solve_helmholtz(op, k_sq, b_eff, mode=mode, restart=restart,
                               max_restarts=1, tol=1e-12, precond=precond,
                               shift=shift)
        u = u + step.x
        cycles_run += 1
        del step
    else:
        _, rnorm = _neg_residual(op, k_sq, src, u)
        hist.append(float(np.asarray(rnorm)) / max(src_norm, 1e-30))
    return GMRESResult(
        x=u,
        residual_norms=jnp.asarray(hist),
        checkpoints=u[None],
        iterations=jnp.asarray(cycles_run * restart),
    )


def gmres_restarted_early_exit(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    restart: int = 20,
    max_restarts: int = 50,
    tol: float = 1e-10,
):
    """Restarted GMRES that STOPS once converged (lax.while_loop).

    Unlike `gmres_restarted` (fixed scan + per-cycle checkpoints, matching
    the MATLAB driver), this variant spends no cycles after convergence —
    the production fast path. Returns (x, final_residual_norm, iterations).
    """
    flat = b.reshape(-1)
    x0f = jnp.zeros_like(flat) if x0 is None else x0.reshape(-1)
    mv = lambda v: matvec(v.reshape(b.shape)).reshape(-1)
    bnorm = jnp.maximum(jnp.linalg.norm(flat), 1e-30)

    def cond(state):
        _, rn, cycles = state
        return (rn > tol * bnorm) & (cycles < max_restarts)

    def body(state):
        x, _, cycles = state
        x = _arnoldi_cycle(mv, flat, x, restart)
        rn = jnp.linalg.norm(flat - mv(x))
        return x, rn, cycles + 1

    rn0 = jnp.linalg.norm(flat - mv(x0f))
    x, rn, cycles = jax.lax.while_loop(cond, body, (x0f, rn0, jnp.array(0)))
    return x.reshape(b.shape), rn, cycles * restart
