"""Flexible GMRES with the LEARNED solver as the preconditioner.

Generalizes solvers/hybrid.py (learned warm start, then classical polish)
to the tighter coupling the reference never had: the network runs INSIDE
the Krylov iteration. Each outer step applies z_j = M_j^-1 v_j where
M_j^-1 is K learned iterations on the auxiliary problem A z = v_j
(amplitude-normalized into the network's training distribution, solved
from a fresh zero state). The preconditioner is nonlinear and varies per
iteration, which standard GMRES cannot tolerate — flexible GMRES (Saad
1993) stores the preconditioned vectors Z and forms x = x0 + Z y, so any
per-iteration operator is admissible.

Why this composition is stronger than either part:
- vs. the raw rollout: each M^-1 call is a SHORT (K~20) rollout from a
  fresh hidden state on a normalized problem — no recurrent-state
  divergence on out-of-distribution inputs — while the outer Arnoldi
  least-squares enforces true-residual decrease with a classical
  convergence guarantee.
- vs. CSLP-GMRES: the constant-coefficient shifted Laplacian ignores the
  medium; the network was trained on heterogeneous media and acts as a
  medium-aware approximate inverse.

Complex vectors are used on-device only (host I/O is channel-pair f32,
as everywhere in the framework). Restart cycles are driven from the host
(bounded single-dispatch duration, matching CLAUDE.md's runtime limits).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config
from ..core.hoist import LazyHoistedJit
from .gmres import make_helmholtz_matvec
from .iterative import rollout


class FGMRESResult(NamedTuple):
    wavefield: jax.Array       # [H, W, 2] solution (channel pair)
    residual_norms: jax.Array  # [cycles + 1] true relative residuals
    iterations: int            # outer Krylov iterations performed


def make_learned_preconditioner(params, op, sos_map, *, cfg: Config,
                                iterations: int = 20):
    """complex [H, W] -> complex [H, W] approximate A^-1 v.

    Runs `iterations` learned steps on A z = v from zero wavefield and
    FRESH hidden states, with v amplitude-normalized to the training
    source scale (the solve is linear, the network is not); returns the
    best iterate, un-normalized."""
    sos = jnp.asarray(sos_map, jnp.float32)[None]

    def apply(v: jax.Array) -> jax.Array:
        src = jnp.stack([v.real, v.imag], axis=-1)[None]
        amp = jnp.max(jnp.abs(v))
        scale = jnp.where(amp > 0, cfg.source.amplitude / amp, 1.0)
        out = rollout(
            params, op, src * scale.astype(src.dtype), sos, cfg=cfg,
            num_iterations=iterations, collect=("rmse", "best"),
        )
        w = out["best_wavefield"][0] / scale
        return jax.lax.complex(w[..., 0], w[..., 1])

    return apply


def _fgmres_cycle(matvec, precond, b, x0, restart: int):
    """One FGMRES(m) cycle; x = x0 + Z y with per-iteration Z_j."""
    n = b.shape[0]
    dtype = b.dtype
    r0 = b - matvec(x0)
    beta = jnp.linalg.norm(r0)
    safe_beta = jnp.where(beta > 0, beta, 1.0)

    V0 = jnp.zeros((restart + 1, n), dtype).at[0].set(r0 / safe_beta)
    Z0 = jnp.zeros((restart, n), dtype)
    H0 = jnp.zeros((restart + 1, restart), dtype)

    def body(j, carry):
        V, Z, H = carry
        z = precond(V[j])
        w = matvec(z)

        def mgs(i, carry_w):
            w, hcol = carry_w
            active = i <= j
            h = jnp.where(active, jnp.vdot(V[i], w), 0.0)
            return w - h * V[i], hcol.at[i].set(h)

        w, hcol = jax.lax.fori_loop(
            0, restart, mgs, (w, jnp.zeros(restart + 1, dtype))
        )
        hnorm = jnp.linalg.norm(w)
        hcol = hcol.at[j + 1].set(hnorm.astype(dtype))
        safe = jnp.where(hnorm > 0, hnorm, 1.0)
        V = V.at[j + 1].set(w / safe)
        Z = Z.at[j].set(z)
        H = H.at[:, j].set(hcol)
        return V, Z, H

    V, Z, H = jax.lax.fori_loop(0, restart, body, (V0, Z0, H0))
    e1 = jnp.zeros(restart + 1, dtype).at[0].set(beta.astype(dtype))
    y, _, _, _ = jnp.linalg.lstsq(H, e1)
    x_new = x0 + Z.T @ y
    return jnp.where(beta > 0, 1.0, 0.0) * x_new + jnp.where(
        beta > 0, 0.0, 1.0) * x0


def _make_host_arnoldi_cycle(mv, precond, restart: int):
    """FGMRES(m) cycle driven from the host: ONE device dispatch per
    Krylov step (preconditioner apply + matvec + CGS2 orthogonalization),
    so arbitrarily expensive preconditioners — e.g. hundreds of learned
    rollout iterations at 1024^2 — never exceed the runtime's
    single-dispatch duration limit (CLAUDE.md: the tunneled worker
    crashes past ~30 s per dispatch; a whole-cycle jit with a deep
    preconditioner did exactly that). The small Hessenberg least-squares
    is solved on the host in complex128 — a free numerics upgrade over
    the on-device f32 path. All host<->device traffic is f32 split re/im
    (complex transfers are unimplemented on axon)."""

    # alloc/step close over mv/precond, whose captures (k^2 maps, coarse
    # levels) are huge at large grids — hoist them to jit ARGUMENTS
    # (core/hoist.py) or the remote-compile request overflows (HTTP 413
    # at 8192^2, where k^2 alone is 268 MB of baked constants).
    @LazyHoistedJit
    def alloc(bv, x):
        r0 = bv - mv(x)
        beta = jnp.linalg.norm(r0)
        safe = jnp.where(beta > 0, beta, 1.0)
        V = jnp.zeros((restart + 1, bv.shape[0]), bv.dtype).at[0].set(
            r0 / safe
        )
        Z = jnp.zeros((restart, bv.shape[0]), bv.dtype)
        return V, Z, beta.real

    # V/Z are donated: at 8192^2 with restart 4 the two bases are 4.8 GB,
    # and double-buffering them across the in-place .at updates OOMs the
    # 16 GB chip (observed on the first post-413-fix attempt).
    @functools.partial(LazyHoistedJit, donate_argnums=(0, 1))
    def step(V, Z, j):
        z = precond(V[j])
        w = mv(z)
        # classical Gram-Schmidt with one reorthogonalization (CGS2):
        # two [m+1, n] matmuls per step ride the MXU and match MGS
        # stability in practice. Project against the FULL basis and mask
        # the [m+1] coefficient vector instead of masking V — a masked
        # copy of V doubles the basis footprint (2.7 GB at 8192^2,
        # restart 4: the OOM that killed the second 8192^2 attempt), and
        # rows beyond j are exactly zero anyway (alloc zero-fills; each
        # step writes only row j+1).
        mask = jnp.arange(V.shape[0]) <= j
        h1 = jnp.where(mask, V.conj() @ w, 0)
        w = w - V.T @ h1
        h2 = jnp.where(mask, V.conj() @ w, 0)
        w = w - V.T @ h2
        h = h1 + h2
        hn = jnp.linalg.norm(w)
        safe = jnp.where(hn > 0, hn, 1.0)
        hcol = h.at[j + 1].set(hn.astype(h.dtype))
        V = V.at[j + 1].set(w / safe)
        Z = Z.at[j].set(z)
        return V, Z, jnp.stack([hcol.real, hcol.imag]).astype(jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def update(x, Z, y_re, y_im):
        y = jax.lax.complex(y_re, y_im).astype(Z.dtype)
        return x + Z.T @ y

    def cycle(bvec, x):
        V, Z, beta = alloc(bvec, x)
        beta = float(np.asarray(beta))
        if beta == 0.0:
            return x
        H = np.zeros((restart + 1, restart), np.complex128)
        for j in range(restart):
            V, Z, hpair = step(V, Z, jnp.int32(j))
            hp = np.asarray(hpair, np.float64)
            H[:, j] = hp[0] + 1j * hp[1]
        e1 = np.zeros(restart + 1, np.complex128)
        e1[0] = beta
        y, *_ = np.linalg.lstsq(H, e1, rcond=None)
        return update(
            x, Z,
            jnp.asarray(y.real, jnp.float32),
            jnp.asarray(y.imag, jnp.float32),
        )

    return cycle


def solve_fgmres(
    op,
    source: jax.Array,
    sos_map: jax.Array,
    *,
    cfg: Config,
    precond_field,
    restart: int = 10,
    max_restarts: int = 10,
    tol: float = 1e-5,
    x0: jax.Array | None = None,
    host_arnoldi: bool = False,
    verbose: bool = False,
) -> FGMRESResult:
    """Solve A u = s with flexible GMRES under ANY (possibly nonlinear,
    iteration-varying) right preconditioner `precond_field`: complex
    [H, W] -> complex [H, W].

    source: [H, W, 2] channel pair; sos_map: [H, W]. One restart cycle
    per device dispatch (host loop), so arbitrarily long solves respect
    single-dispatch limits; `host_arnoldi=True` tightens that to one
    dispatch per Krylov STEP for deep/expensive preconditioners.
    Returns true relative residual history.
    """
    source = jnp.asarray(source)
    b = jax.lax.complex(source[..., 0], source[..., 1])
    shape = b.shape
    k_sq = (cfg.source.omega / jnp.asarray(sos_map, jnp.float32)) ** 2
    mv_field = make_helmholtz_matvec(op, k_sq, cfg.operator_mode)
    mv = lambda v: mv_field(v.reshape(shape)).reshape(-1)
    precond = lambda v: precond_field(v.reshape(shape)).reshape(-1)

    # b is passed as an ARGUMENT to the jitted functions, never closed
    # over: jit lowering embeds closures as host-fetched constants, and
    # complex64 host<->device transfer is unimplemented on the axon
    # runtime (CLAUDE.md); arguments stay device-resident.
    bvec = b.reshape(-1)
    if host_arnoldi:
        cycle = _make_host_arnoldi_cycle(mv, precond, restart)
    else:
        cycle = LazyHoistedJit(
            functools.partial(_fgmres_cycle, mv, precond, restart=restart),
            donate_argnums=(1,),  # x0 is dead after each cycle
        )

    @LazyHoistedJit
    def true_relres(bv, x):
        r = bv - mv(x)
        return jnp.linalg.norm(r) / jnp.maximum(jnp.linalg.norm(bv), 1e-30)

    # complex zeros must be BUILT on device from f32 (eager
    # jnp.zeros_like on complex64 round-trips a complex literal through
    # the unimplemented axon transfer path)
    zero_f = jnp.zeros(bvec.shape, jnp.float32)
    x = (jax.lax.complex(zero_f, zero_f) if x0 is None
         else jax.lax.complex(x0[..., 0], x0[..., 1]).reshape(-1))
    norms = [float(np.asarray(true_relres(bvec, x)))]
    it = 0
    for _ in range(max_restarts):
        if norms[-1] < tol:
            break
        x = cycle(bvec, x)
        it += restart
        norms.append(float(np.asarray(true_relres(bvec, x))))
        if verbose:
            print(f"  fgmres[{it}]: rel={norms[-1]:.3e}", flush=True)
    xf = x.reshape(shape)
    return FGMRESResult(
        wavefield=jnp.stack([xf.real, xf.imag], axis=-1),
        residual_norms=jnp.asarray(norms),
        iterations=it,
    )


def solve_fgmres_learned(
    params,
    op,
    source: jax.Array,
    sos_map: jax.Array,
    *,
    cfg: Config,
    inner_iterations: int = 20,
    restart: int = 10,
    max_restarts: int = 10,
    tol: float = 1e-5,
    x0: jax.Array | None = None,
    host_arnoldi: bool = False,
    verbose: bool = False,
) -> FGMRESResult:
    """Flexible GMRES with the LEARNED solver as the preconditioner
    (see module docstring). Thin front end over solve_fgmres."""
    precond_field = make_learned_preconditioner(
        params, op, sos_map, cfg=cfg, iterations=inner_iterations
    )
    return solve_fgmres(
        op, source, sos_map, cfg=cfg, precond_field=precond_field,
        restart=restart, max_restarts=max_restarts, tol=tol, x0=x0,
        host_arnoldi=host_arnoldi, verbose=verbose,
    )
