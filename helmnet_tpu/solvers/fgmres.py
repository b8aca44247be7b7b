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
    recycle_state: tuple | None = None  # (U, C) device bases (FGCRO-DR)


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


def _make_recycled_host_cycle(mv, precond, restart: int, k: int):
    """FGCRO-DR: host-Arnoldi flexible GMRES with a k-dimensional recycled
    deflation space carried ACROSS restart cycles (and across solve calls
    via FGMRESResult.recycle_state).

    Why: restarted FGMRES truncates the Krylov space every `restart` steps
    and re-learns the near-null Helmholtz components from scratch each
    cycle — the measured 8192^2 deceleration (R2_TPU_EXTRAS
    helm_8192_twolevel: gains per cycle shrink monotonically). GCRO-DR
    (Parks & de Sturler; flexible variant per Carvalho/Giraud) keeps
    harmonic-Ritz approximations of those components as U (solution space)
    and C = A U (orthonormal image space): every cycle first solves
    exactly in span(U), then runs the flexible Arnoldi on the PROJECTED
    operator (I - C C^H) A, so the truncated space never has to rediscover
    the recycled directions.

    The recycle pair satisfies A U^T = C^T — a property of A alone — so
    (U, C) stay valid when the (flexible, inexact) preconditioner changes
    between cycles, e.g. under a coarse-tolerance schedule.

    Bases are stored row-major [k, n] / [m+1, n] like the plain host cycle;
    all fetches are f32 re/im pairs (complex host transfer is
    unimplemented on axon); every kernel hoists its closure constants
    (core/hoist.py) and donates the large bases it rewrites.
    """
    m = restart

    @LazyHoistedJit
    def alloc(bv, x):
        """First cycle (no recycle space yet): plain flexible Arnoldi init."""
        r0 = bv - mv(x)
        beta = jnp.linalg.norm(r0)
        safe = jnp.where(beta > 0, beta, 1.0)
        V = jnp.zeros((m + 1, bv.shape[0]), bv.dtype).at[0].set(r0 / safe)
        Z = jnp.zeros((m, bv.shape[0]), bv.dtype)
        return V, Z, beta.real

    @functools.partial(LazyHoistedJit, donate_argnums=(1,))
    def alloc_proj(bv, x, U, C):
        """Recycled-cycle init: exact solve in span(U) + C-projection.
        x += U^T C^H r;  r -= C^T C^H r  (then r _|_ span(C))."""
        r0 = bv - mv(x)
        t = jnp.conj(C) @ r0
        x1 = x + U.T @ t
        r = r0 - C.T @ t
        beta = jnp.linalg.norm(r)
        safe = jnp.where(beta > 0, beta, 1.0)
        V = jnp.zeros((m + 1, bv.shape[0]), bv.dtype).at[0].set(r / safe)
        Z = jnp.zeros((m, bv.shape[0]), bv.dtype)
        return V, Z, x1, beta.real

    @functools.partial(LazyHoistedJit, donate_argnums=(0, 1))
    def step(V, Z, j):
        """Plain flexible Arnoldi step (first cycle) — CGS2, masked
        coefficients (see _make_host_arnoldi_cycle for the HBM rationale)."""
        z = precond(V[j])
        w = mv(z)
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

    @functools.partial(LazyHoistedJit, donate_argnums=(0, 1))
    def step_defl(V, Z, C, j):
        """Projected flexible Arnoldi step: w = (I - C C^H) A M(v_j),
        recording B[:, j] = C^H A M(v_j)."""
        z = precond(V[j])
        w = mv(z)
        bcol = jnp.conj(C) @ w
        w = w - C.T @ bcol
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
        return (V, Z,
                jnp.stack([hcol.real, hcol.imag]).astype(jnp.float32),
                jnp.stack([bcol.real, bcol.imag]).astype(jnp.float32))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def update(x, Z, y_re, y_im):
        y = jax.lax.complex(y_re, y_im).astype(Z.dtype)
        return x + Z.T @ y

    @functools.partial(jax.jit, donate_argnums=(0,))
    def update_defl(x, Z, U, y_re, y_im, z_re, z_im):
        """x += Z^T y + U^T (-B y): the -B y term cancels the C-component
        the new directions re-introduce (A Z^T = C^T B + V^T Hbar)."""
        y = jax.lax.complex(y_re, y_im).astype(Z.dtype)
        zc = jax.lax.complex(z_re, z_im).astype(U.dtype)
        return x + Z.T @ y + U.T @ zc

    @jax.jit
    def harvest(V, Z, p_re, p_im, q_re, q_im):
        """First-cycle recycle build. With Hbar P = Q R:
        U = (Z^T P R^{-1})^T,  C = (V^T Q)^T,  so A U^T = C^T exactly
        (up to f32) by the Arnoldi relation A Z^T = V^T Hbar."""
        PR = jax.lax.complex(p_re, p_im).astype(Z.dtype)  # [m, k]
        Q = jax.lax.complex(q_re, q_im).astype(V.dtype)   # [m+1, k]
        return PR.T @ Z, Q.T @ V

    @jax.jit
    def inner_blocks(U, C, V, Z):
        """Chat^H W blocks for the combined harmonic-Ritz problem,
        W = [U^T, Z^T], Chat = [C^T, V^T]; fetched as one f32 pair."""
        CU = jnp.conj(C) @ U.T   # [k, k]
        CZ = jnp.conj(C) @ Z.T   # [k, m]
        VU = jnp.conj(V) @ U.T   # [m+1, k]
        VZ = jnp.conj(V) @ Z.T   # [m+1, m]
        top = jnp.concatenate([CU, CZ], axis=1)
        bot = jnp.concatenate([VU, VZ], axis=1)
        W = jnp.concatenate([top, bot], axis=0)  # [k+m+1, k+m]
        return jnp.stack([W.real, W.imag]).astype(jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def refresh(U, C, V, Z, t1_re, t1_im, t2_re, t2_im,
                q1_re, q1_im, q2_re, q2_im):
        """Thick-restart rotation of the recycle space from the combined
        subspace [U^T, Z^T]: U_new = T1^T U + T2^T Z (T = P R^{-1} split),
        C_new = Q1^T C + Q2^T V (Q from QR of G P)."""
        dt = U.dtype
        T1 = jax.lax.complex(t1_re, t1_im).astype(dt)  # [k, k]
        T2 = jax.lax.complex(t2_re, t2_im).astype(dt)  # [m, k]
        Q1 = jax.lax.complex(q1_re, q1_im).astype(dt)  # [k, k]
        Q2 = jax.lax.complex(q2_re, q2_im).astype(dt)  # [m+1, k]
        return T1.T @ U + T2.T @ Z, Q1.T @ C + Q2.T @ V

    from .deflation import _f32_halves, _harmonic_ritz

    state = {"U": None, "C": None}

    def set_state(UC):
        if UC is not None:
            state["U"], state["C"] = UC

    def get_state():
        return (state["U"], state["C"]) if state["U"] is not None else None

    def cycle(bvec, x):
        if state["U"] is None:
            # ---- first cycle: plain flexible Arnoldi + harvest ----------
            V, Z, beta = alloc(bvec, x)
            beta = float(np.asarray(beta))
            if beta == 0.0:
                return x
            H = np.zeros((m + 1, m), np.complex128)
            for j in range(m):
                V, Z, hp = step(V, Z, jnp.int32(j))
                hp = np.asarray(hp, np.float64)
                H[:, j] = hp[0] + 1j * hp[1]
            e1 = np.zeros(m + 1, np.complex128)
            e1[0] = beta
            y, *_ = np.linalg.lstsq(H, e1, rcond=None)
            x = update(x, Z, *_f32_halves(y))
            P, _ = _harmonic_ritz(H, k)
            Q, R = np.linalg.qr(H @ P)
            if np.linalg.cond(R) < 1e12:
                PRinv = P @ np.linalg.inv(R)
                state["U"], state["C"] = harvest(
                    V, Z, *_f32_halves(PRinv), *_f32_halves(Q)
                )
            return x
        # ---- recycled cycle: project, deflated Arnoldi, refresh ---------
        U, C = state["U"], state["C"]
        V, Z, x, beta = alloc_proj(bvec, x, U, C)
        beta = float(np.asarray(beta))
        if beta == 0.0:
            return x
        H = np.zeros((m + 1, m), np.complex128)
        B = np.zeros((k, m), np.complex128)
        for j in range(m):
            V, Z, hp, bp = step_defl(V, Z, C, jnp.int32(j))
            hp = np.asarray(hp, np.float64)
            bp = np.asarray(bp, np.float64)
            H[:, j] = hp[0] + 1j * hp[1]
            B[:, j] = bp[0] + 1j * bp[1]
        e1 = np.zeros(m + 1, np.complex128)
        e1[0] = beta
        y, *_ = np.linalg.lstsq(H, e1, rcond=None)
        x = update_defl(x, Z, U, *_f32_halves(y), *_f32_halves(-B @ y))
        # thick restart: harmonic Ritz over the combined space [U^T, Z^T];
        # A W = Chat G with G = [[I, B], [0, H]]
        G = np.block([
            [np.eye(k, dtype=np.complex128), B],
            [np.zeros((m + 1, k), np.complex128), H],
        ])
        ChatW = np.asarray(inner_blocks(U, C, V, Z), np.float64)
        ChatW = ChatW[0] + 1j * ChatW[1]
        from .deflation import _combined_harmonic_ritz

        P, _ = _combined_harmonic_ritz(G, ChatW, k)
        if P is not None and np.all(np.isfinite(P)):
            GP = G @ P
            Q, R = np.linalg.qr(GP)
            if np.linalg.cond(R) < 1e12:
                PRinv = P @ np.linalg.inv(R)
                state["U"], state["C"] = refresh(
                    U, C, V, Z,
                    *_f32_halves(PRinv[:k]), *_f32_halves(PRinv[k:]),
                    *_f32_halves(Q[:k]), *_f32_halves(Q[k:]),
                )
        return x

    cycle.set_state = set_state
    cycle.get_state = get_state
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
    recycle_k: int = 0,
    recycle_state: tuple | None = None,
    budget_s: float | None = None,
    on_cycle=None,
    keep_x_complex: bool = False,
    verbose: bool = False,
) -> FGMRESResult:
    """Solve A u = s with flexible GMRES under ANY (possibly nonlinear,
    iteration-varying) right preconditioner `precond_field`: complex
    [H, W] -> complex [H, W].

    source: [H, W, 2] channel pair; sos_map: [H, W]. One restart cycle
    per device dispatch (host loop), so arbitrarily long solves respect
    single-dispatch limits; `host_arnoldi=True` tightens that to one
    dispatch per Krylov STEP for deep/expensive preconditioners.
    `recycle_k > 0` (requires host_arnoldi) carries a k-dimensional
    harmonic-Ritz deflation space across cycles (FGCRO-DR, see
    _make_recycled_host_cycle) and across calls via
    result.recycle_state -> the recycle_state argument of the next call.
    NOTE: like x0, the (U, C) buffers of an incoming `recycle_state`
    are DONATED — the thick-restart refresh invalidates them after the
    first recycled cycle, so a retained tuple cannot be passed twice
    (e.g. retrying after a crash); re-use only the tuple returned in
    the NEWEST result, or pass copies (jnp.array(U), jnp.array(C)).
    Returns true relative residual history.

    Very-large-grid controls (8192^2 lives ~0.5 GB from the HBM cliff —
    a 0.54 GB x-pair round trip per call was the r4 second-call OOM):
    `budget_s` stops the cycle loop on wall-clock so a long solve is ONE
    call; `on_cycle(norms)` fires after every cycle (crash-safe progress
    recording); `keep_x_complex=True` skips building the [H, W, 2]
    wavefield pair and returns the flat device-complex solution in
    `wavefield` instead — pass it back as `x0` (complex 1-D is accepted)
    to continue without any pair<->complex churn. NOTE: a complex x0 is
    DONATED into the first cycle; the caller's reference dies.
    """
    import time as _time

    source = jnp.asarray(source)
    b = jax.lax.complex(source[..., 0], source[..., 1])
    shape = b.shape
    k_sq = (cfg.source.omega / jnp.asarray(sos_map, jnp.float32)) ** 2
    mv_field = make_helmholtz_matvec(op, k_sq, cfg.operator_mode)
    mv = lambda v: mv_field(v.reshape(shape)).reshape(-1)
    precond = lambda v: precond_field(v.reshape(shape)).reshape(-1)
    return run_fgmres_loop(
        mv, precond, b.reshape(-1), shape, restart=restart,
        max_restarts=max_restarts, tol=tol, x0=x0,
        host_arnoldi=host_arnoldi, recycle_k=recycle_k,
        recycle_state=recycle_state, budget_s=budget_s, on_cycle=on_cycle,
        keep_x_complex=keep_x_complex, verbose=verbose,
    )


def run_fgmres_loop(
    mv,
    precond,
    bvec: jax.Array,
    shape: tuple,
    *,
    restart: int,
    max_restarts: int,
    tol: float,
    x0=None,
    host_arnoldi: bool = False,
    recycle_k: int = 0,
    recycle_state=None,
    budget_s=None,
    on_cycle=None,
    keep_x_complex: bool = False,
    verbose: bool = False,
    label: str = "fgmres",
) -> FGMRESResult:
    """Shared FGMRES host driver over flat complex vectors (used by the
    2D solve_fgmres and the 3D solve_fgmres_two_level3d). See
    solve_fgmres for the semantics of every option."""
    import time as _time

    # b is passed as an ARGUMENT to the jitted functions, never closed
    # over: jit lowering embeds closures as host-fetched constants, and
    # complex64 host<->device transfer is unimplemented on the axon
    # runtime (CLAUDE.md); arguments stay device-resident.
    if recycle_k > 0:
        if not host_arnoldi:
            raise ValueError("recycle_k > 0 requires host_arnoldi=True")
        if not (0 < recycle_k < restart):
            raise ValueError("need 0 < recycle_k < restart")
        cycle = _make_recycled_host_cycle(mv, precond, restart, recycle_k)
        cycle.set_state(recycle_state)
    elif host_arnoldi:
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
    if x0 is None:
        zero_f = jnp.zeros(bvec.shape, jnp.float32)
        x = jax.lax.complex(zero_f, zero_f)
    elif jnp.iscomplexobj(x0):
        x = jnp.asarray(x0).reshape(-1)
        x0 = None  # drop this frame's reference (donation safety)
    else:
        x = jax.lax.complex(x0[..., 0], x0[..., 1]).reshape(-1)
    norms = [float(np.asarray(true_relres(bvec, x)))]
    it = 0
    t0 = _time.time()
    for _ in range(max_restarts):
        if norms[-1] < tol:
            break
        if budget_s is not None and _time.time() - t0 > budget_s:
            break
        x = cycle(bvec, x)
        it += restart
        norms.append(float(np.asarray(true_relres(bvec, x))))
        if on_cycle is not None:
            on_cycle(list(norms))
        if verbose:
            print(f"  {label}[{it}]: rel={norms[-1]:.3e}", flush=True)
    if keep_x_complex:
        wavefield = x  # flat device complex; no channel pair built
    else:
        xf = x.reshape(shape)
        wavefield = jnp.stack([xf.real, xf.imag], axis=-1)
    return FGMRESResult(
        wavefield=wavefield,
        residual_norms=jnp.asarray(norms),
        iterations=it,
        recycle_state=cycle.get_state() if recycle_k > 0 else None,
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
