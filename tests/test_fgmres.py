"""Learned-preconditioned flexible GMRES (solvers/fgmres.py).

Uses the committed round-2 trained checkpoint — a random-weight network
is no preconditioner."""

import os

import numpy as np
import pytest

from helmnet_tpu.solvers.fgmres import solve_fgmres_learned
from helmnet_tpu.solvers.gmres import solve_helmholtz
from helmnet_tpu.solvers.iterative import IterativeSolver

CKPT = os.path.join(os.path.dirname(__file__), "..", "checkpoints",
                    "tpu_r2a")


def _problem():
    import jax.numpy as jnp

    if not os.path.isdir(CKPT):
        pytest.skip("trained checkpoint not present")
    solver = IterativeSolver.from_orbax_checkpoint(CKPT)
    rng = np.random.default_rng(7)
    sos = np.ones((96, 96), np.float32)
    sos[30:66, 24:78] = 1.0 + rng.random((36, 54)).astype(np.float32)
    src = np.asarray(solver.source[0])
    return solver, jnp.asarray(sos), src


class TestFGMRESLearned:
    def test_converges_and_reports_true_residuals(self):
        import jax.numpy as jnp

        from helmnet_tpu.ops.spectral import helmholtz_residual

        solver, sos, src = _problem()
        res = solve_fgmres_learned(
            solver.params, solver.op, src, sos, cfg=solver.cfg,
            inner_iterations=16, restart=8, max_restarts=10, tol=1e-5,
        )
        norms = np.asarray(res.residual_norms)
        assert norms[-1] < 1e-4
        assert norms[-1] < norms[0] / 100
        # the reported norm is the TRUE relative residual
        k_sq = (solver.cfg.source.omega / sos) ** 2
        r = helmholtz_residual(
            solver.op, res.wavefield[None], k_sq[None],
            jnp.asarray(src)[None], "matmul",
        )
        true_rel = float(
            np.linalg.norm(np.asarray(r).ravel())
            / np.linalg.norm(np.asarray(src).ravel())
        )
        np.testing.assert_allclose(true_rel, norms[-1], rtol=1e-3, atol=1e-8)

    def test_matches_gmres_solution(self):
        solver, sos, src = _problem()
        res = solve_fgmres_learned(
            solver.params, solver.op, src, sos, cfg=solver.cfg,
            inner_iterations=16, restart=8, max_restarts=12, tol=1e-6,
        )
        ref = solve_helmholtz(
            solver.op, (solver.cfg.source.omega / np.asarray(sos)) ** 2,
            src, restart=30, max_restarts=20, tol=1e-8,
        )
        a, b = np.asarray(res.wavefield), np.asarray(ref.x)
        scale = np.abs(b).max()
        # solution-level agreement: residual ~1e-5 with cond(A) ~1e3
        # bounds the field error near 1% of max — same 2% convention as
        # the rollout parity fixtures
        np.testing.assert_allclose(a, b, atol=2e-2 * scale)

    def test_outperforms_unpreconditioned_at_equal_outer_iterations(self):
        """The medium-aware learned preconditioner compresses the Krylov
        work: FGMRES reaches a far lower residual in the same number of
        OUTER iterations than bare restarted GMRES."""
        solver, sos, src = _problem()
        res = solve_fgmres_learned(
            solver.params, solver.op, src, sos, cfg=solver.cfg,
            inner_iterations=8, restart=6, max_restarts=2, tol=0.0,
        )
        bare = solve_helmholtz(
            solver.op, (solver.cfg.source.omega / np.asarray(sos)) ** 2,
            src, restart=6, max_restarts=2, tol=0.0,
        )
        hist = np.asarray(bare.residual_norms)
        bare_rel = float(hist[-1] / hist[0])
        assert float(np.asarray(res.residual_norms)[-1]) < bare_rel / 3
