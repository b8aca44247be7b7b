"""GMRES solver tests: scipy cross-check, dense direct-solve parity,
checkpoint semantics, batched sweeps."""

import numpy as np
import pytest
import scipy.sparse.linalg as spla

from helmnet_tpu.ops.source import point_source_map
from helmnet_tpu.ops.spectral import assemble_dense, make_operator
from helmnet_tpu.solvers import gmres


def problem(n=32, pml=4, seed=0):
    rng = np.random.default_rng(seed)
    sos = np.ones((n, n), np.float32)
    sos[10:20, 8:26] = 1.5
    k_sq = (1.0 / sos) ** 2
    src = point_source_map(n, n, (n - 8, n // 2), 10.0)
    op = make_operator(n, n, pml, 2.0, 1.0)
    return op, k_sq, src, n, pml


class TestGMRES:
    def test_matches_dense_direct_solve(self):
        op, k_sq, src, n, pml = problem()
        res = gmres.solve_helmholtz(
            op, k_sq, src, restart=30, max_restarts=40, tol=1e-7
        )
        M = assemble_dense(n, n, pml, 2.0, 1.0, k_sq=k_sq)
        b = (src[..., 0] + 1j * src[..., 1]).ravel()
        u_direct = np.linalg.solve(M, b).reshape(n, n)
        xp = np.asarray(res.x)
        got = xp[..., 0] + 1j * xp[..., 1]
        scale = np.abs(u_direct).max()
        np.testing.assert_allclose(got, u_direct, atol=2e-3 * scale)

    def test_matches_scipy_gmres(self):
        op, k_sq, src, n, pml = problem()
        M = assemble_dense(n, n, pml, 2.0, 1.0, k_sq=k_sq)
        b = (src[..., 0] + 1j * src[..., 1]).ravel()
        x_sp, info = spla.gmres(
            M.astype(np.complex64), b.astype(np.complex64),
            restart=30, maxiter=40, rtol=1e-6,
        )
        res = gmres.solve_helmholtz(
            op, k_sq, src, restart=30, max_restarts=40, tol=1e-6
        )
        scale = np.abs(x_sp).max()
        xp = np.asarray(res.x)
        np.testing.assert_allclose(
            (xp[..., 0] + 1j * xp[..., 1]).ravel(), x_sp, atol=5e-3 * scale
        )

    def test_residual_norms_decrease_and_checkpoint(self):
        op, k_sq, src, n, pml = problem()
        res = gmres.solve_helmholtz(
            op, k_sq, src, restart=30, max_restarts=10, tol=1e-12
        )
        rn = np.asarray(res.residual_norms)
        assert rn.shape == (11,)
        assert rn[-1] < rn[0] * 1e-3
        # checkpoint after last cycle == final solution
        np.testing.assert_allclose(
            np.asarray(res.checkpoints[-1]), np.asarray(res.x), atol=0
        )
        # monotone (non-increasing up to fp wiggle)
        assert np.all(rn[1:] <= rn[:-1] * 1.01)

    def test_early_convergence_freezes_solution(self):
        op, k_sq, src, n, pml = problem()
        res = gmres.solve_helmholtz(
            op, k_sq, src, restart=30, max_restarts=30, tol=1e-5
        )
        assert int(res.iterations) < 30 * 30
        rn = np.asarray(res.residual_norms)
        bnorm = np.linalg.norm(np.asarray(src[..., 0] + 1j * src[..., 1]))
        assert rn[-1] <= 1e-5 * bnorm * 1.5

    def test_batched_sweep(self):
        op, k_sq, src, n, pml = problem()
        k2 = np.stack([k_sq, np.ones_like(k_sq)])
        s2 = np.stack([src, src])
        res = gmres.solve_helmholtz_batch(
            op, k2, s2, restart=20, max_restarts=10, tol=1e-6
        )
        assert res.x.shape == (2, n, n, 2)
        rn = np.asarray(res.residual_norms)
        assert rn.shape == (2, 11)
        assert np.all(rn[:, -1] < rn[:, 0] * 1e-2)

    def test_zero_rhs(self):
        op, k_sq, src, n, pml = problem()
        res = gmres.solve_helmholtz(
            op, k_sq, np.zeros_like(src), restart=10, max_restarts=3, tol=1e-8
        )
        assert np.allclose(np.asarray(res.x), 0.0)
        assert np.all(np.isfinite(np.asarray(res.residual_norms)))

    def test_learned_solver_agrees_with_gmres(self):
        """Cross-solver consistency on the same discrete operator (the
        parity harness core, support_functions.py:375-513)."""
        import os

        ckpt = "/root/reference/trained_models/jcp_paper_trained_weights.ckpt"
        if not os.path.exists(ckpt):
            pytest.skip("reference checkpoint not available")
        from helmnet_tpu.solvers.iterative import IterativeSolver

        solver = IterativeSolver.from_reference_checkpoint(ckpt)
        sos = np.ones((96, 96), np.float32)
        sos[40:64, 12:84] = 1.5
        out = solver.forward(sos[None], num_iterations=200)
        u_model = np.asarray(out["wavefield"])[0]
        u_model_c = u_model[..., 0] + 1j * u_model[..., 1]

        k_sq = (1.0 / sos) ** 2
        res = gmres.solve_helmholtz(
            solver.op, k_sq, np.asarray(solver.source[0]),
            restart=50, max_restarts=40, tol=1e-7,
        )
        xp = np.asarray(res.x)
        u_g = xp[..., 0] + 1j * xp[..., 1]
        scale = np.abs(u_g).max()
        err = np.abs(u_model_c - u_g).max() / scale
        assert err < 0.05, f"learned vs GMRES relative l_inf {err}"


class TestGMRESStencilPath:
    def test_gmres_on_stencil_operator(self):
        """GMRES over the 9-point FD system (the sparse matrix-explicit
        path) solves its own discrete system to high accuracy."""
        import scipy.sparse.linalg as sspla

        from helmnet_tpu.ops.pallas_stencil import stencil_to_csr
        from helmnet_tpu.ops.stencil import make_stencil_operator

        n, pml = 32, 4
        sos = np.ones((n, n), np.float32)
        sos[10:20, 8:26] = 1.5
        k_sq = (1.0 / sos) ** 2
        src = point_source_map(n, n, (n - 8, n // 2), 10.0)
        st = make_stencil_operator(n, n, pml, 2.0, 1.0, order=4)
        res = gmres.solve_helmholtz(
            st, k_sq, src, restart=40, max_restarts=30, tol=1e-6
        )
        # cross-check against scipy spsolve on the explicit CSR matrix
        M = stencil_to_csr(st, k_sq)
        b = (src[..., 0] + 1j * src[..., 1]).ravel()
        u_direct = sspla.spsolve(M.tocsc(), b).reshape(n, n)
        xp = np.asarray(res.x)
        got = xp[..., 0] + 1j * xp[..., 1]
        scale = np.abs(u_direct).max()
        np.testing.assert_allclose(got, u_direct, atol=5e-3 * scale)


class TestEarlyExit:
    def test_early_exit_matches_and_stops(self):
        import jax

        op, k_sq, src, n, pml = problem()
        mv = gmres.make_helmholtz_matvec(op, k_sq)
        b = jax.lax.complex(
            np.asarray(src[..., 0]), np.asarray(src[..., 1])
        )
        x, rn, iters = jax.jit(
            lambda bb: gmres.gmres_restarted_early_exit(
                mv, bb, restart=30, max_restarts=40, tol=1e-5
            )
        )(b)
        bnorm = float(np.linalg.norm(np.asarray(b)))
        assert float(rn) <= 1e-5 * bnorm * 1.01
        assert int(iters) < 30 * 40  # stopped early
        # agrees with the checkpointing variant
        full = gmres.solve_helmholtz(
            op, k_sq, src, restart=30, max_restarts=40, tol=1e-5
        )
        xf = np.asarray(full.x)
        got = np.stack([np.asarray(x.real), np.asarray(x.imag)], -1)
        scale = np.abs(xf).max()
        np.testing.assert_allclose(got, xf, atol=1e-3 * scale)


class TestPreconditioned:
    def test_shifted_laplace_accelerates(self):
        """CSLP right preconditioning: converges where bare GMRES stalls.

        At 96^2 / omega 1 (~15 wavelengths across), GMRES(30)x6 without a
        preconditioner stalls around 1e-1 relative; with the FFT-diagonal
        shifted Laplacian it passes 1e-3 (measured 1.7e-4)."""
        n = 96
        op = make_operator(n, n, 8, 2.0, 1.0)
        import jax.numpy as jnp

        k_sq = jnp.full((n, n), 1.0)
        src = jnp.asarray(point_source_map(n, n, (n // 2, n // 2), 10.0))
        kw = dict(restart=30, max_restarts=6, tol=1e-12)
        bare = gmres.solve_helmholtz(op, k_sq, src, precond="none", **kw)
        pre = gmres.solve_helmholtz(
            op, k_sq, src, precond="shifted_laplace", **kw
        )
        rel = lambda r: float(r.residual_norms[-1] / r.residual_norms[0])
        assert rel(pre) < 1e-3
        assert rel(pre) < rel(bare) / 50

    def test_preconditioned_solves_same_system(self):
        """Right preconditioning must not change the solution."""
        op, k_sq, src, n, pml = problem()
        res = gmres.solve_helmholtz(
            op, k_sq, src, restart=30, max_restarts=40, tol=1e-7,
            precond="shifted_laplace",
        )
        M = assemble_dense(n, n, pml, 2.0, 1.0, k_sq=k_sq)
        b = (src[..., 0] + 1j * src[..., 1]).ravel()
        u_direct = np.linalg.solve(M, b).reshape(n, n)
        xp = np.asarray(res.x)
        got = xp[..., 0] + 1j * xp[..., 1]
        scale = np.abs(u_direct).max()
        np.testing.assert_allclose(got, u_direct, atol=2e-3 * scale)


class TestIterativeRefinement:
    def test_reaches_1e10(self):
        """Mixed-precision refinement: f64 defect + f32 inner GMRES reaches
        the MATLAB tol 1e-10 (spectral_gmres_solver.m:96-98) without any
        f64 device solves."""
        from helmnet_tpu.core.config import Config
        from helmnet_tpu.solvers.precond import solve_helmholtz_refined

        cfg = Config()
        n, omega = 64, 1.0
        g = cfg.geometry
        op = make_operator(n, n, g.pml_size, g.sigma_max, omega)
        sos = np.ones((n, n), np.float32)
        sos[20:40, 20:40] = 1.8
        k_sq = (omega / sos) ** 2
        src = point_source_map(n, n, (n - 10, n // 2), 10.0)
        x, norms = solve_helmholtz_refined(
            op, g, omega, k_sq, src, tol=1e-10,
            inner_restart=40, inner_max_restarts=8, max_outer=10,
        )
        assert norms[-1] / norms[0] < 1e-10
        # true f64 residual of the returned solution
        from helmnet_tpu.solvers.precond import _HostOperator

        host = _HostOperator(n, n, g.pml_size, g.sigma_max, omega, k_sq)
        b = src[..., 0] + 1j * src[..., 1]
        r = np.linalg.norm(b - host(x)) / np.linalg.norm(b)
        assert r < 1e-10


class TestChunkedSolve:
    def test_chunked_matches_monolithic(self):
        """solve_helmholtz_chunked (host-driven defect-correction cycles,
        the production large-grid path promoted from tools/r3_large_4096)
        reaches the same solution as the one-dispatch solve."""
        import jax.numpy as jnp

        from helmnet_tpu.core.config import Config, GeometryConfig
        from helmnet_tpu.ops.spectral import make_operator
        from helmnet_tpu.solvers.gmres import (
            solve_helmholtz,
            solve_helmholtz_chunked,
        )

        n, pml = 64, 8
        cfg = Config(geometry=GeometryConfig(domain_size=n, pml_size=pml,
                                             sigma_max=2.0))
        op = make_operator(n, n, pml, 2.0, cfg.k0)
        rng = np.random.default_rng(5)
        sos = np.ones((n, n), np.float32)
        sos[20:44, 16:48] = 1.0 + 0.4 * rng.random((24, 32)).astype(np.float32)
        k_sq = jnp.asarray((1.0 / sos) ** 2)
        src = np.zeros((n, n, 2), np.float32)
        src[48, 32, 0] = 10.0
        src = jnp.asarray(src)

        mono = solve_helmholtz(op, k_sq, src, mode="matmul", restart=25,
                               max_restarts=12, tol=1e-6,
                               precond="shifted_laplace")
        chun = solve_helmholtz_chunked(op, k_sq, src, mode="matmul",
                                       restart=25, max_cycles=12, tol=1e-6,
                                       precond="shifted_laplace")
        norms = np.asarray(chun.residual_norms)
        assert norms[-1] < 1e-5          # true relative residual
        xm = np.asarray(mono.x)
        xc = np.asarray(chun.x)
        scale = np.abs(xm).max()
        assert np.abs(xm - xc).max() < 1e-3 * scale

    def test_chunked_warm_start(self):
        """x0 warm start (the large-grid hybrid handoff): starting from
        the converged solution needs zero additional cycles, and a
        partially-converged x0 reaches tol in fewer cycles than cold."""
        import jax.numpy as jnp

        from helmnet_tpu.core.config import Config, GeometryConfig
        from helmnet_tpu.ops.spectral import make_operator
        from helmnet_tpu.solvers.gmres import solve_helmholtz_chunked

        n, pml = 64, 8
        cfg = Config(geometry=GeometryConfig(domain_size=n, pml_size=pml,
                                             sigma_max=2.0))
        op = make_operator(n, n, pml, 2.0, cfg.k0)
        rng = np.random.default_rng(5)
        sos = np.ones((n, n), np.float32)
        sos[20:44, 16:48] = 1.0 + 0.4 * rng.random((24, 32)).astype(np.float32)
        k_sq = jnp.asarray((1.0 / sos) ** 2)
        src = np.zeros((n, n, 2), np.float32)
        src[48, 32, 0] = 10.0
        src = jnp.asarray(src)

        cold = solve_helmholtz_chunked(op, k_sq, src, mode="matmul",
                                       restart=25, max_cycles=30, tol=1e-5,
                                       precond="shifted_laplace")
        cold_cycles = len(np.asarray(cold.residual_norms)) - 1
        assert np.asarray(cold.residual_norms)[-1] < 1e-5

        # exact warm start: the initial residual already satisfies tol
        warm = solve_helmholtz_chunked(op, k_sq, src, mode="matmul",
                                       restart=25, max_cycles=30, tol=1e-5,
                                       precond="shifted_laplace",
                                       x0=cold.x)
        assert len(np.asarray(warm.residual_norms)) == 1
        assert np.asarray(warm.residual_norms)[0] < 1e-5

        # partial warm start: hand off a half-converged iterate
        part = solve_helmholtz_chunked(op, k_sq, src, mode="matmul",
                                       restart=25,
                                       max_cycles=max(cold_cycles // 2, 1),
                                       tol=1e-30,
                                       precond="shifted_laplace")
        cont = solve_helmholtz_chunked(op, k_sq, src, mode="matmul",
                                       restart=25, max_cycles=30, tol=1e-5,
                                       precond="shifted_laplace",
                                       x0=part.x)
        cont_cycles = len(np.asarray(cont.residual_norms)) - 1
        assert np.asarray(cont.residual_norms)[-1] < 1e-5
        assert cont_cycles < cold_cycles

        # shape guard
        with pytest.raises(ValueError):
            solve_helmholtz_chunked(op, k_sq, src, mode="matmul",
                                    x0=jnp.zeros((n, n)))

    def test_chunked_budget_stops(self):
        import time

        import jax.numpy as jnp

        from helmnet_tpu.core.config import Config, GeometryConfig
        from helmnet_tpu.ops.spectral import make_operator
        from helmnet_tpu.solvers.gmres import solve_helmholtz_chunked

        n, pml = 64, 8
        cfg = Config(geometry=GeometryConfig(domain_size=n, pml_size=pml,
                                             sigma_max=2.0))
        op = make_operator(n, n, pml, 2.0, cfg.k0)
        k_sq = jnp.ones((n, n), jnp.float32)
        src = np.zeros((n, n, 2), np.float32)
        src[48, 32, 0] = 10.0
        res = solve_helmholtz_chunked(op, k_sq, jnp.asarray(src),
                                      mode="matmul", restart=10,
                                      max_cycles=10000, tol=1e-30,
                                      budget_s=0.0)
        # budget 0: at most the initial residual + one cycle ran
        assert len(np.asarray(res.residual_norms)) <= 2
