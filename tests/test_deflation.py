"""Deflated restarted GMRES (GCRO-DR, solvers/deflation.py).

Validates the recycling machinery on a spectrum it is designed for
(isolated small eigenvalues -> restart stagnation), checks the Helmholtz
front end against the dense direct solve, and pins the measured negative
result on the Helmholtz operator itself (dense near-null cluster — see
PERF_NOTES.md), which is why the two-level coarse-space preconditioner
(solvers/twolevel.py) is the production high-k path.
"""

import numpy as np
import pytest

from helmnet_tpu.ops.source import point_source_map
from helmnet_tpu.ops.spectral import assemble_dense, make_operator
from helmnet_tpu.solvers import gmres
from helmnet_tpu.solvers.deflation import (
    gmres_deflated,
    solve_helmholtz_deflated,
)


def _isolated_spectrum_problem(n=400, n_small=6, seed=0):
    """Normal matrix: indefinite complex-arc bulk + isolated tiny eigs.

    Restarted GMRES stagnates on it; GCRO-DR must not."""
    rng = np.random.default_rng(seed)
    small = np.array([1e-3, -2e-3, 3e-3j, 5e-3, -8e-3j, 1.5e-2])[:n_small]
    bulk = (np.exp(1j * rng.uniform(-1.2, 1.2, n - n_small))
            * rng.uniform(0.5, 3.0, n - n_small))
    d = np.concatenate([small, bulk]).astype(np.complex128)
    Q = np.linalg.qr(
        rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    )[0]
    A = (Q * d) @ Q.conj().T
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    return A, b, np.sort(np.abs(small))


class TestGCRODR:
    def test_breaks_restart_stagnation(self):
        import jax.numpy as jnp

        A, b, _ = _isolated_spectrum_problem()
        Aj = jnp.asarray(A.astype(np.complex64))
        bj = jnp.asarray(b.astype(np.complex64))
        mv = lambda v: Aj @ v
        bn = float(np.linalg.norm(b))

        plain = gmres.gmres_restarted(
            mv, bj, restart=20, max_restarts=30, tol=1e-12
        )
        defl = gmres_deflated(
            mv, bj, restart=20, k=8, max_cycles=30, tol=1e-12
        )
        plain_final = float(plain.residual_norms[-1]) / bn
        defl_final = defl.residual_norms[-1] / bn
        # plain GMRES(20) stagnates ~1e-1; GCRO-DR converges (f32 floor)
        assert plain_final > 1e-2
        assert defl_final < 1e-4
        assert defl_final < plain_final / 100

    def test_ritz_values_recover_isolated_eigenvalues(self):
        import jax.numpy as jnp

        A, b, small = _isolated_spectrum_problem()
        Aj = jnp.asarray(A)
        mv = lambda v: Aj @ v
        res = gmres_deflated(
            mv, jnp.asarray(b), restart=20, k=8, max_cycles=20, tol=1e-12
        )
        got = np.sort(np.abs(res.ritz_values))[: len(small)]
        # f32 Arnoldi perturbs the tiniest values; what matters for the
        # deflation space is landing in the isolated cluster (< 0.05),
        # clearly separated from the bulk (>= 0.5).
        assert np.all(got < 0.05)
        np.testing.assert_allclose(got[-1], small[-1], rtol=0.1)

    def test_true_residual_norms(self):
        import jax.numpy as jnp

        A, b, _ = _isolated_spectrum_problem(n=200)
        Aj = jnp.asarray(A)
        mv = lambda v: Aj @ v
        res = gmres_deflated(
            mv, jnp.asarray(b), restart=15, k=5, max_cycles=10, tol=1e-12
        )
        r = np.linalg.norm(b - A @ np.asarray(res.x))
        assert abs(r - res.residual_norms[-1]) < 1e-6 * np.linalg.norm(b)


class TestHelmholtzFrontEnd:
    def test_matches_dense_direct_solve(self):
        n, pml = 32, 4
        sos = np.ones((n, n), np.float32)
        sos[10:24, 8:26] = 1.5
        k_sq = (1.0 / sos) ** 2
        src = point_source_map(n, n, (n - 8, n // 2), 10.0)
        op = make_operator(n, n, pml, 2.0, 1.0)
        res = solve_helmholtz_deflated(
            op, k_sq, src, restart=25, k=6, max_cycles=30, tol=1e-7
        )
        M = assemble_dense(n, n, pml, 2.0, 1.0, k_sq=k_sq)
        b = (src[..., 0] + 1j * src[..., 1]).ravel()
        u = np.linalg.solve(M, b).reshape(n, n)
        xp = np.asarray(res.x)
        got = xp[..., 0] + 1j * xp[..., 1]
        np.testing.assert_allclose(got, u, atol=5e-3 * np.abs(u).max())

    def test_helmholtz_near_null_cluster_defeats_deflation(self):
        """Documented negative result (PERF_NOTES.md): the Helmholtz
        near-null spectrum is a DENSE cluster (O(n) modes with
        |k_spatial| ~ k_ref), so a k=8 recycle space cannot capture it —
        deflated and plain GMRES converge at the same order. This is the
        measured justification for the two-level coarse-space design."""
        n, pml = 64, 8
        rng = np.random.default_rng(3)
        sos = np.ones((n, n), np.float32)
        sos[16:50, 12:52] = 1.0 + rng.random((34, 40)).astype(np.float32)
        k_sq = (1.0 / sos) ** 2
        src = point_source_map(n, n, (n - 12, n // 2), 10.0)
        op = make_operator(n, n, pml, 2.0, 1.0)

        import jax
        import jax.numpy as jnp

        mv = gmres.make_helmholtz_matvec(op, jnp.asarray(k_sq))
        b = jax.lax.complex(
            jnp.asarray(src[..., 0]), jnp.asarray(src[..., 1])
        )
        bn = float(jnp.linalg.norm(b.ravel()))
        plain = gmres.gmres_restarted(
            mv, b, restart=12, max_restarts=25, tol=1e-12
        )
        defl = gmres_deflated(
            mv, b, restart=12, k=6, max_cycles=25, tol=1e-12
        )
        plain_final = float(plain.residual_norms[-1]) / bn
        defl_final = defl.residual_norms[-1] / bn
        # same order of magnitude — deflation neither helps nor breaks
        assert defl_final < 1.0
        assert defl_final / plain_final < 50
