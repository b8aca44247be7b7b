"""Hybrid solver: learned warm start + GMRES polish."""

import os

import numpy as np
import pytest

from helmnet_tpu.solvers.hybrid import solve_hybrid


class TestHybrid:
    def test_best_tracking_in_rollout(self):
        import jax

        from helmnet_tpu.core.config import Config, GeometryConfig, SourceConfig
        from helmnet_tpu.models import hybridnet
        from helmnet_tpu.ops.source import point_source_map
        from helmnet_tpu.ops.spectral import make_operator
        from helmnet_tpu.solvers.iterative import rollout

        cfg = Config(
            geometry=GeometryConfig(domain_size=32, pml_size=4),
            source=SourceConfig(location=(26, 16)),
        )
        params = hybridnet.init_params(jax.random.PRNGKey(0), cfg.model)
        op = make_operator(32, 32, 4, 2.0, 1.0)
        src = np.asarray(point_source_map(32, 32, (26, 16), 10.0))[None]
        sos = np.ones((1, 32, 32), np.float32)
        out = rollout(params, op, src, sos, cfg=cfg, num_iterations=6,
                      collect=("rmse", "best"))
        rmse = np.asarray(out["rmse"])[:, 0]
        assert float(out["best_rmse"][0]) == pytest.approx(rmse.min(), rel=1e-6)

    def test_hybrid_beats_both_parts(self):
        ckpt = "/root/reference/trained_models/jcp_paper_trained_weights.ckpt"
        if not os.path.exists(ckpt):
            pytest.skip("reference checkpoint not available")
        import jax.numpy as jnp

        from helmnet_tpu.solvers.iterative import IterativeSolver

        solver = IterativeSolver.from_reference_checkpoint(ckpt)
        sos = np.ones((2, 96, 96), np.float32)
        sos[0, 40:64, 12:84] = 1.5
        sos[1, 20:40, 20:70] = 1.8
        src = jnp.broadcast_to(solver.source, (2, 96, 96, 2))
        res = solve_hybrid(
            solver.params, solver.op, src, jnp.asarray(sos), cfg=solver.cfg,
            learned_iterations=100, restart=100, max_restarts=5, tol=1e-4,
        )
        rels = np.asarray(res.final_relres)
        assert np.all(rels <= 1e-4 * 1.5), rels
        assert np.all(np.asarray(res.warm_rmse) < 1e-2)

        # warm start must save Krylov iterations vs a cold solve to the
        # same tolerance
        from helmnet_tpu.solvers.gmres import (
            gmres_restarted_early_exit,
            make_helmholtz_matvec,
        )

        k_sq = (1.0 / sos[0]) ** 2
        mv = make_helmholtz_matvec(solver.op, jnp.asarray(k_sq))
        b = jnp.asarray(solver.source[0])
        b = 1j * b[..., 1] + b[..., 0]
        _, _, cold_iters = gmres_restarted_early_exit(
            mv, b, restart=100, max_restarts=5, tol=1e-4
        )
        assert int(res.gmres_iterations[0]) < int(cold_iters), (
            int(res.gmres_iterations[0]), int(cold_iters))

    def test_cslp_preconditioned_polish(self):
        """CSLP-preconditioned polish reports TRUE residuals and reaches
        tolerance at least as well as the bare polish (warm start mapped
        through y0 = M x0)."""
        import jax.numpy as jnp
        import numpy as np

        from helmnet_tpu.ops.spectral import helmholtz_residual
        from helmnet_tpu.solvers.hybrid import solve_hybrid
        from helmnet_tpu.solvers.iterative import IterativeSolver
        from tests.test_training import tiny_config

        solver = IterativeSolver(tiny_config())
        rng = np.random.default_rng(5)
        sos = np.ones((1, 32, 32), np.float32)
        sos[:, 12:22, 8:24] = 1.0 + rng.random((1, 10, 16)).astype(np.float32)
        src = jnp.broadcast_to(solver.source, (1, 32, 32, 2))
        hy = solve_hybrid(
            solver.params, solver.op, src, jnp.asarray(sos),
            cfg=solver.cfg, learned_iterations=5, restart=30,
            max_restarts=10, tol=1e-5, precond="shifted_laplace",
        )
        rel = float(np.asarray(hy.final_relres)[0])
        assert rel < 1e-4
        # reported residual is the TRUE unpreconditioned residual
        k_sq = (solver.cfg.source.omega / jnp.asarray(sos)) ** 2
        r = helmholtz_residual(solver.op, hy.wavefield, k_sq, src, "matmul")
        true_rel = float(
            jnp.linalg.norm(r.reshape(-1)) / jnp.linalg.norm(src.reshape(-1))
        )
        assert abs(true_rel - rel) < 5e-2 * max(rel, 1e-6) + 1e-6
