"""Deflated restarted GMRES (GCRO-DR) for high-wavenumber Helmholtz.

Why: restarted GMRES on the Helmholtz operator stagnates because each
restart throws away the slowly-converging near-null components
(|k_spatial| ~ k_ref eigenvalues close to zero). The MATLAB reference
(matlab/spectral_gmres_solver.m) simply runs long unpreconditioned f64
cycles; at high wavenumber / strong heterogeneity that stalls (see
PERF_NOTES.md large-grid section). Deflated restarting keeps a small
recycle space spanning the offending eigenvectors ACROSS restarts, so
every cycle starts where the last one left off in those directions.

Algorithm (Parks, de Sturler et al., "Recycling Krylov subspaces",
GCRO-DR):

  cycle 1   plain Arnoldi GMRES(m); harmonic Ritz vectors of H with the
            k smallest |theta| span the near-null subspace -> U, C = A U
            with C orthonormal (QR done in the small coordinate space).
  cycle j   project:  x += U C^H r,  r -= C C^H r        (C-exact solve)
            Arnoldi on (I - C C^H) A for m-k steps, recording
            B = C^H A V; least squares on the Arnoldi block alone,
            z = -B y kills the C-component exactly; x += U z + V y.
            Optionally refresh U from harmonic Ritz of the COMBINED
            space [U, V] (thick restart).

TPU mapping: each cycle is one fixed-shape jitted dispatch (bounded
duration — required on the tunneled worker, CLAUDE.md); the only host
work is the small (m x m) harmonic-Ritz eigenproblem, which cannot run
on TPU anyway (nonsymmetric eig is CPU-only in XLA) and costs O(m^3)
microseconds. Host<->device traffic per cycle is the small H/B blocks
plus scalars — never the n-vectors.

Composable with CSLP: deflate the RIGHT-preconditioned operator
A M^{-1} (pass the composed matvec), which clusters the spectrum first
and leaves deflation the few stragglers.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class DeflatedResult(NamedTuple):
    x: jax.Array                 # solution, same shape as b
    residual_norms: np.ndarray   # [cycles + 1] true residual 2-norms
    iterations: int              # total inner Arnoldi steps
    ritz_values: np.ndarray      # final recycle-space harmonic Ritz values


# ---------------------------------------------------------------------------
# device kernels (fixed shapes, one dispatch per cycle)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("mv", "m"))
def _arnoldi_block(mv, r0: jax.Array, m: int):
    """Plain Arnoldi: returns V [(m+1), n], H [(m+1), m], beta."""
    n = r0.shape[0]
    dtype = r0.dtype
    beta = jnp.linalg.norm(r0)
    safe = jnp.where(beta > 0, beta, 1.0)
    V0 = jnp.zeros((m + 1, n), dtype).at[0].set(r0 / safe)
    H0 = jnp.zeros((m + 1, m), dtype)

    def body(j, carry):
        V, H = carry
        w = mv(V[j])

        def mgs(i, cw):
            w, hcol = cw
            h = jnp.where(i <= j, jnp.vdot(V[i], w), 0.0)
            return w - h * V[i], hcol.at[i].set(h)

        w, hcol = jax.lax.fori_loop(0, m, mgs, (w, jnp.zeros(m + 1, dtype)))
        hn = jnp.linalg.norm(w)
        hcol = hcol.at[j + 1].set(hn.astype(dtype))
        V = V.at[j + 1].set(w / jnp.where(hn > 0, hn, 1.0))
        return V, H.at[:, j].set(hcol)

    V, H = jax.lax.fori_loop(0, m, body, (V0, H0))
    return V, H, beta


@functools.partial(jax.jit, static_argnames=("mv", "mk"))
def _deflated_arnoldi_block(mv, C: jax.Array, r0: jax.Array, mk: int):
    """Arnoldi on (I - C C^H) A: returns V [(mk+1), n], H, B = C^H A V, beta.

    r0 must already be C-orthogonal (the caller projects)."""
    n = r0.shape[0]
    dtype = r0.dtype
    k = C.shape[0]
    beta = jnp.linalg.norm(r0)
    safe = jnp.where(beta > 0, beta, 1.0)
    V0 = jnp.zeros((mk + 1, n), dtype).at[0].set(r0 / safe)
    H0 = jnp.zeros((mk + 1, mk), dtype)
    B0 = jnp.zeros((k, mk), dtype)

    def body(j, carry):
        V, H, B = carry
        w = mv(V[j])
        bcol = jnp.conj(C) @ w  # C^H (A v_j): [k]
        w = w - C.T @ bcol      # project out the recycle image space

        def mgs(i, cw):
            w, hcol = cw
            h = jnp.where(i <= j, jnp.vdot(V[i], w), 0.0)
            return w - h * V[i], hcol.at[i].set(h)

        w, hcol = jax.lax.fori_loop(0, mk, mgs, (w, jnp.zeros(mk + 1, dtype)))
        hn = jnp.linalg.norm(w)
        hcol = hcol.at[j + 1].set(hn.astype(dtype))
        V = V.at[j + 1].set(w / jnp.where(hn > 0, hn, 1.0))
        return V, H.at[:, j].set(hcol), B.at[:, j].set(bcol)

    V, H, B = jax.lax.fori_loop(0, mk, body, (V0, H0, B0))
    return V, H, B, beta


# ---------------------------------------------------------------------------
# host-side small linear algebra
# ---------------------------------------------------------------------------


def _harmonic_ritz(H: np.ndarray, k: int):
    """k smallest-|theta| harmonic Ritz pairs of the Arnoldi block H.

    Harmonic Ritz values of A w.r.t. the Krylov space solve
        (H_m + h^2 (H_m^{-H} e_m) e_m^H) g = theta g,   h = H[m, m-1].
    Small-|theta| pairs approximate A's near-null eigenvectors — exactly
    the components restarting loses. Returns P [m, k] (coordinates in V)
    and the theta values."""
    m = H.shape[1]
    Hm = H[:m, :]
    h2 = abs(H[m, m - 1]) ** 2
    em = np.zeros(m, H.dtype)
    em[-1] = 1.0
    try:
        f = np.linalg.solve(Hm.conj().T, em)
    except np.linalg.LinAlgError:
        f = np.zeros(m, H.dtype)
    theta, G = np.linalg.eig(Hm + h2 * np.outer(f, em))
    order = np.argsort(np.abs(theta))[:k]
    return np.ascontiguousarray(G[:, order]), theta[order]


def _combined_harmonic_ritz(G: np.ndarray, ChatW: np.ndarray, k: int):
    """Harmonic Ritz over the combined space W = [U, V_mk].

    With A W = Chat G (Chat = [C, V_{mk+1}] orthonormal), harmonic Ritz
    pairs solve  (G^H G) g = theta (G^H Chat^H W) g.  ChatW = Chat^H W is
    the only quantity needing extra device inner products."""
    Amat = G.conj().T @ G
    Bmat = G.conj().T @ ChatW
    try:
        theta, P = np.linalg.eig(np.linalg.solve(Bmat, Amat))
    except np.linalg.LinAlgError:
        return None, None
    order = np.argsort(np.abs(theta))[:k]
    return np.ascontiguousarray(P[:, order]), theta[order]


# ---------------------------------------------------------------------------
# driver (host loop, one device dispatch per cycle)
# ---------------------------------------------------------------------------


def gmres_deflated(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    restart: int = 30,
    k: int = 10,
    max_cycles: int = 20,
    tol: float = 1e-8,
    refresh: bool = True,
    debug_trace: Optional[list] = None,
) -> DeflatedResult:
    """GCRO-DR: restarted GMRES with a k-dimensional recycled deflation
    space. `restart` is the TOTAL subspace size per cycle (k recycled +
    restart-k new Krylov directions), so cost per cycle matches
    GMRES(restart).

    Host-driven: safe for long solves on the tunneled TPU worker (one
    bounded dispatch per cycle) and required anyway because harmonic-Ritz
    extraction needs a nonsymmetric eig (CPU-only). refresh=True updates
    the recycle space from the combined [U, V] subspace every cycle
    (thick restart); refresh=False freezes it after cycle 1.
    """
    if not (0 < k < restart):
        raise ValueError("need 0 < k < restart")
    flat = b.reshape(-1)
    x = jnp.zeros_like(flat) if x0 is None else x0.reshape(-1)
    mv = lambda v: matvec(v.reshape(b.shape)).reshape(-1)
    mk = restart - k

    bnorm = float(jnp.linalg.norm(flat))
    r = flat - mv(x)
    norms = [float(jnp.linalg.norm(r))]
    iters = 0
    U = C = None
    theta = np.zeros(0, np.complex128)

    for _ in range(max_cycles):
        if norms[-1] <= tol * max(bnorm, 1e-30):
            break
        if U is None:
            # --- first cycle: plain GMRES(restart) + harvest U, C ---------
            V, H, beta = _arnoldi_block(mv, r, restart)
            iters += restart
            Hh = np.asarray(H, np.complex128)
            e1 = np.zeros(restart + 1, np.complex128)
            e1[0] = float(beta)
            y, *_ = np.linalg.lstsq(Hh, e1, rcond=None)
            cdtype = np.dtype(V.dtype)
            x = x + V[:restart].T @ jnp.asarray(y.astype(cdtype))
            P, theta = _harmonic_ritz(Hh, k)
            # C = V Q, U = (V[:m]^T P) R^{-1}  with  Hbar P = Q R
            Q, R = np.linalg.qr(Hh @ P)
            U = V[:restart].T @ jnp.asarray(P.astype(cdtype))
            C = (V.T @ jnp.asarray(Q.astype(cdtype))).T          # [k, n]
            U = U @ jnp.asarray(np.linalg.inv(R).astype(cdtype))  # [n, k]
        else:
            # --- GCRO cycle: recycle-space solve + projected Arnoldi ------
            z = jnp.conj(C) @ r                  # C^H r
            x = x + U @ z
            r = r - C.T @ z
            V, H, B, beta = _deflated_arnoldi_block(mv, C, r, mk)
            iters += mk
            Hh = np.asarray(H, np.complex128)
            Bh = np.asarray(B, np.complex128)
            e1 = np.zeros(mk + 1, np.complex128)
            e1[0] = float(beta)
            y, *_ = np.linalg.lstsq(Hh, e1, rcond=None)
            cdtype = np.dtype(V.dtype)
            yj = jnp.asarray(y.astype(cdtype))
            x = x + V[:mk].T @ yj + U @ jnp.asarray((-Bh @ y).astype(cdtype))
            if refresh:
                # A [U V] = [C V+] G,  G = [[I, B], [0, H]]
                G = np.block([
                    [np.eye(k, dtype=np.complex128), Bh],
                    [np.zeros((mk + 1, k), np.complex128), Hh],
                ])
                # Chat^H W blocks (small device inner products)
                CU = np.asarray(jnp.conj(C) @ U, np.complex128)   # [k, k]
                VU = np.asarray(jnp.conj(V) @ U, np.complex128)  # [mk+1, k]
                ChatW = np.block([
                    [CU, np.zeros((k, mk), np.complex128)],
                    [VU, np.vstack([np.eye(mk), np.zeros((1, mk))])],
                ])
                P, th = _combined_harmonic_ritz(G, ChatW, k)
                if P is not None and np.all(np.isfinite(P)):
                    theta = th
                    GP = G @ P
                    Q, R = np.linalg.qr(GP)
                    if np.linalg.cond(R) < 1e12:
                        Wp = U @ jnp.asarray(P[:k].astype(cdtype)) \
                            + V[:mk].T @ jnp.asarray(P[k:].astype(cdtype))
                        Chat_Q = (
                            C.T @ jnp.asarray(Q[:k].astype(cdtype))
                            + V.T @ jnp.asarray(Q[k:].astype(cdtype))
                        )
                        C = Chat_Q.T
                        U = Wp @ jnp.asarray(np.linalg.inv(R).astype(cdtype))
        r = flat - mv(x)
        norms.append(float(jnp.linalg.norm(r)))
        if debug_trace is not None:
            debug_trace.append((np.asarray(U), np.asarray(C), theta))

    return DeflatedResult(
        x=x.reshape(b.shape),
        residual_norms=np.asarray(norms),
        iterations=iters,
        ritz_values=theta,
    )


def solve_helmholtz_deflated(
    op,
    k_sq: jax.Array,
    source: jax.Array,
    *,
    mode: str = "matmul",
    restart: int = 30,
    k: int = 10,
    max_cycles: int = 20,
    tol: float = 1e-8,
    precond: str = "none",
    shift: tuple = (1.0, 0.5),
    refresh: bool = True,
) -> DeflatedResult:
    """Deflated GMRES front end for (L + k^2) u = s.

    precond='shifted_laplace' deflates the RIGHT-preconditioned operator
    A M^{-1}: CSLP clusters the bulk of the spectrum, deflation removes
    the few near-null stragglers CSLP cannot move — the combination is
    the standard strong-heterogeneity high-k recipe. Returns channel-pair
    x [H, W, 2]; residual norms are true residuals of the (preconditioned)
    system solved."""
    from .gmres import make_helmholtz_matvec

    if source.ndim == 3 and source.shape[-1] == 2:
        b = jax.lax.complex(source[..., 0], source[..., 1])
    else:
        b = jnp.asarray(source)
        if not jnp.iscomplexobj(b):
            b = b.astype(jnp.complex64)
    mv = make_helmholtz_matvec(op, k_sq, mode)
    if precond == "shifted_laplace":
        from .precond import make_shifted_laplace_inverse

        minv = make_shifted_laplace_inverse(op, k_sq, shift)
        res = gmres_deflated(
            lambda v: mv(minv(v)), b, restart=restart, k=k,
            max_cycles=max_cycles, tol=tol, refresh=refresh,
        )
        res = res._replace(x=minv(res.x))
    else:
        res = gmres_deflated(
            mv, b, restart=restart, k=k,
            max_cycles=max_cycles, tol=tol, refresh=refresh,
        )
    pair = jnp.stack([res.x.real, res.x.imag], axis=-1)
    return res._replace(x=pair)
