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
microseconds.

Host<->device traffic is TPU-safe by construction: complex64 transfer is
UNIMPLEMENTED on the axon runtime (CLAUDE.md), so every fetched block
(H, B, inner products) leaves the device as stacked f32 [2, ...] re/im
pairs and every pushed coefficient matrix (y, harmonic-Ritz coordinate
transforms, QR factors) enters as separate f32 re/im arrays combined on
device with lax.complex — the same discipline as fgmres.py. The n-sized
vectors never cross the link.

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
# device kernel factory (one compile set per (matvec, shape, restart, k))
# ---------------------------------------------------------------------------


def _as_pair(z: jax.Array) -> jax.Array:
    """complex -> stacked f32 [2, ...] re/im (the only fetch-safe form)."""
    return jnp.stack([z.real, z.imag]).astype(jnp.float32)


def _host_complex(pair) -> np.ndarray:
    p = np.asarray(pair, np.float64)
    return p[0] + 1j * p[1]


@functools.lru_cache(maxsize=32)
def make_deflated_kernels(matvec, shape: tuple, restart: int, k: int):
    """Build the jitted per-cycle kernels for GCRO-DR once per
    (matvec, field shape, restart, k). lru_cache keys on the matvec
    function object, so repeated solves with the same operator reuse
    compiled executables instead of paying a 20-300 s remote compile
    per call (the earlier static-argnum lambda design guaranteed a
    cache miss every invocation)."""
    mk = restart - k
    mv = lambda v: matvec(v.reshape(shape)).reshape(-1)

    @jax.jit
    def arnoldi(r0):
        """Plain Arnoldi(restart): V [(m+1), n] device-resident,
        H as f32 pair [2, m+1, m], beta as f32 scalar."""
        m = restart
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
        return V, _as_pair(H), beta.real.astype(jnp.float32)

    @jax.jit
    def defl_arnoldi(C, r0):
        """Arnoldi on (I - C C^H) A for mk steps. r0 must already be
        C-orthogonal. Returns device V plus f32-pair H [2, mk+1, mk],
        B = C^H A V [2, k, mk], beta."""
        n = r0.shape[0]
        dtype = r0.dtype
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

            w, hcol = jax.lax.fori_loop(
                0, mk, mgs, (w, jnp.zeros(mk + 1, dtype))
            )
            hn = jnp.linalg.norm(w)
            hcol = hcol.at[j + 1].set(hn.astype(dtype))
            V = V.at[j + 1].set(w / jnp.where(hn > 0, hn, 1.0))
            return V, H.at[:, j].set(hcol), B.at[:, j].set(bcol)

        V, H, B = jax.lax.fori_loop(0, mk, body, (V0, H0, B0))
        return V, _as_pair(H), _as_pair(B), beta.real.astype(jnp.float32)

    @jax.jit
    def axpy_basis(x, V, re, im):
        """x + V.T @ complex(re, im) — coefficient pushed as f32 halves,
        combined on device. Coefficients are padded to V's row count on
        host so one kernel serves every update."""
        coef = jax.lax.complex(re, im).astype(V.dtype)
        return x + V.T @ coef

    @jax.jit
    def harvest(V, u_re, u_im, q_re, q_im):
        """First-cycle recycle-space build: U = V.T @ (P R^{-1}) (padded
        to m+1 rows), C = (V.T @ Q).T. Coordinate matrices arrive as
        f32 halves."""
        Pc = jax.lax.complex(u_re, u_im).astype(V.dtype)
        Qc = jax.lax.complex(q_re, q_im).astype(V.dtype)
        return V.T @ Pc, (V.T @ Qc).T

    @jax.jit
    def project(C, U, x, r):
        """Recycle-space exact solve: x += U C^H r, r -= C C^H r."""
        z = jnp.conj(C) @ r
        return x + U @ z, r - C.T @ z

    @jax.jit
    def gcro_update(x, V, U, y_re, y_im, z_re, z_im):
        """x += V.T @ y_pad + U @ z (y padded to mk+1 on host,
        z = -B y computed on host)."""
        y = jax.lax.complex(y_re, y_im).astype(V.dtype)
        z = jax.lax.complex(z_re, z_im).astype(U.dtype)
        return x + V.T @ y + U @ z

    @jax.jit
    def inner_products(C, V, U):
        """Chat^H U blocks needed for the combined harmonic-Ritz
        eigenproblem, fetched as f32 pairs."""
        CU = jnp.conj(C) @ U   # [k, k]
        VU = jnp.conj(V) @ U   # [mk+1, k]
        return _as_pair(CU), _as_pair(VU)

    @jax.jit
    def refresh_update(U, V, C, a_re, a_im, b_re, b_im,
                       q1_re, q1_im, q2_re, q2_im):
        """Thick-restart space rotation. On host:
        A = P[:k] R^{-1} [k,k], Bc = pad(P[k:] R^{-1}) [mk+1,k],
        Q split as Q1 = Q[:k] [k,k], Q2 = Q[k:] [mk+1,k].
        U_new = U A + V.T Bc;  C_new = (C.T Q1 + V.T Q2).T."""
        dt = U.dtype
        A = jax.lax.complex(a_re, a_im).astype(dt)
        Bc = jax.lax.complex(b_re, b_im).astype(dt)
        Q1 = jax.lax.complex(q1_re, q1_im).astype(dt)
        Q2 = jax.lax.complex(q2_re, q2_im).astype(dt)
        U_new = U @ A + V.T @ Bc
        C_new = (C.T @ Q1 + V.T @ Q2).T
        return U_new, C_new

    @jax.jit
    def residual(bv, x):
        """True residual r = b - A x (device) + its norm as f32."""
        r = bv - mv(x)
        return r, jnp.linalg.norm(r).real.astype(jnp.float32)

    @jax.jit
    def zero_like_f32(bv):
        """Complex zero built from f32 halves on device (eager
        jnp.zeros_like on complex poisons the axon transfer path)."""
        z = jnp.zeros(bv.shape, jnp.float32)
        return jax.lax.complex(z, z).astype(bv.dtype)

    @jax.jit
    def fetch_pair(Z):
        return _as_pair(Z)

    return dict(
        arnoldi=arnoldi, defl_arnoldi=defl_arnoldi, axpy_basis=axpy_basis,
        harvest=harvest, project=project, gcro_update=gcro_update,
        inner_products=inner_products, refresh_update=refresh_update,
        residual=residual, zero=zero_like_f32, fetch_pair=fetch_pair,
    )


def _f32_halves(M: np.ndarray):
    return (jnp.asarray(np.ascontiguousarray(M.real), jnp.float32),
            jnp.asarray(np.ascontiguousarray(M.imag), jnp.float32))


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
# driver (host loop, bounded device dispatches per cycle)
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

    Host-driven: safe for long solves on the tunneled TPU worker
    (bounded dispatches per cycle) and required anyway because
    harmonic-Ritz extraction needs a nonsymmetric eig (CPU-only).
    refresh=True updates the recycle space from the combined [U, V]
    subspace every cycle (thick restart); refresh=False freezes it
    after cycle 1.
    """
    if not (0 < k < restart):
        raise ValueError("need 0 < k < restart")
    mk = restart - k
    kern = make_deflated_kernels(matvec, tuple(b.shape), restart, k)

    flat = b.reshape(-1)
    x = kern["zero"](flat) if x0 is None else x0.reshape(-1)

    bnorm = float(np.asarray(jnp.linalg.norm(flat).real))
    r, rn = kern["residual"](flat, x)
    norms = [float(np.asarray(rn))]
    iters = 0
    U = C = None
    theta = np.zeros(0, np.complex128)

    for _ in range(max_cycles):
        if norms[-1] <= tol * max(bnorm, 1e-30):
            break
        if U is None:
            # --- first cycle: plain GMRES(restart) + harvest U, C ---------
            V, Hp, beta = kern["arnoldi"](r)
            iters += restart
            Hh = _host_complex(Hp)
            e1 = np.zeros(restart + 1, np.complex128)
            e1[0] = float(np.asarray(beta))
            y, *_ = np.linalg.lstsq(Hh, e1, rcond=None)
            ypad = np.zeros((restart + 1, 1), np.complex128)
            ypad[:restart, 0] = y
            x = kern["axpy_basis"](x, V, *_f32_halves(ypad[:, 0]))
            P, theta = _harmonic_ritz(Hh, k)
            # C = V Q, U = (V[:m]^T P) R^{-1}  with  Hbar P = Q R;
            # fold R^{-1} into the coordinate matrix on host so the
            # device sees one [m+1, k] push.
            Q, R = np.linalg.qr(Hh @ P)
            PRinv = np.zeros((restart + 1, k), np.complex128)
            PRinv[:restart] = P @ np.linalg.inv(R)
            U, C = kern["harvest"](
                V, *_f32_halves(PRinv), *_f32_halves(Q)
            )
        else:
            # --- GCRO cycle: recycle-space solve + projected Arnoldi ------
            x, r = kern["project"](C, U, x, r)
            V, Hp, Bp, beta = kern["defl_arnoldi"](C, r)
            iters += mk
            Hh = _host_complex(Hp)
            Bh = _host_complex(Bp)
            e1 = np.zeros(mk + 1, np.complex128)
            e1[0] = float(np.asarray(beta))
            y, *_ = np.linalg.lstsq(Hh, e1, rcond=None)
            ypad = np.zeros(mk + 1, np.complex128)
            ypad[:mk] = y
            x = kern["gcro_update"](
                x, V, U, *_f32_halves(ypad), *_f32_halves(-Bh @ y)
            )
            if refresh:
                # A [U V] = [C V+] G,  G = [[I, B], [0, H]]
                G = np.block([
                    [np.eye(k, dtype=np.complex128), Bh],
                    [np.zeros((mk + 1, k), np.complex128), Hh],
                ])
                # Chat^H W blocks (small device inner products, f32 pairs)
                CUp, VUp = kern["inner_products"](C, V, U)
                CU = _host_complex(CUp)
                VU = _host_complex(VUp)
                ChatW = np.block([
                    [CU, np.zeros((k, mk), np.complex128)],
                    [VU, np.vstack([np.eye(mk), np.zeros((1, mk))])],
                ])
                P, th = _combined_harmonic_ritz(G, ChatW, k)
                if P is not None and np.all(np.isfinite(P)):
                    GP = G @ P
                    Q, R = np.linalg.qr(GP)
                    if np.linalg.cond(R) < 1e12:
                        # theta only updates when the refresh is
                        # INSTALLED — otherwise ritz_values would
                        # describe a space never put in use.
                        theta = th
                        PRinv = P @ np.linalg.inv(R)
                        Bpad = np.zeros((mk + 1, k), np.complex128)
                        Bpad[:mk] = PRinv[k:]
                        U, C = kern["refresh_update"](
                            U, V, C,
                            *_f32_halves(PRinv[:k]),
                            *_f32_halves(Bpad),
                            *_f32_halves(Q[:k]),
                            *_f32_halves(Q[k:]),
                        )
        r, rn = kern["residual"](flat, x)
        norms.append(float(np.asarray(rn)))
        if debug_trace is not None:
            debug_trace.append((
                _host_complex(kern["fetch_pair"](U)),
                _host_complex(kern["fetch_pair"](C)),
                theta,
            ))

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
