"""Recycled flexible GMRES — FGCRO-DR (solvers/fgmres.py
_make_recycled_host_cycle).

Carries a harmonic-Ritz deflation space across restart cycles AND across
solve calls; built for the 8192^2 two-level plateau (R2_TPU_EXTRAS
helm_8192_twolevel showed restarted-FGMRES deceleration). No reference
counterpart — the MATLAB GMRES re-learns the near-null space every
restart (matlab/spectral_gmres_solver.m:95-115).
"""

import numpy as np
import pytest

from helmnet_tpu.core.config import Config, GeometryConfig
from helmnet_tpu.ops.spectral import make_operator
from helmnet_tpu.solvers.fgmres import solve_fgmres
from helmnet_tpu.solvers.precond import make_shifted_laplace_inverse
from helmnet_tpu.solvers.twolevel import solve_fgmres_two_level


def _problem(n=64, pml=8, contrast=1.0):
    """contrast=0.3 converges to 1e-6 under CSLP in ~22 cycles of
    FGMRES(8); contrast=1.0 is the slow regime (plain reaches only ~7e-3
    in 20 cycles) used to measure the recycling edge."""
    import jax.numpy as jnp

    cfg = Config(geometry=GeometryConfig(domain_size=n, pml_size=pml,
                                         sigma_max=2.0))
    op = make_operator(n, n, pml, cfg.geometry.sigma_max, cfg.k0)
    rng = np.random.default_rng(11)
    sos = np.ones((n, n), np.float32)
    sos[n // 4: 3 * n // 4, n // 4: 3 * n // 4] = (
        1.0 + contrast * rng.random((n // 2, n // 2)).astype(np.float32)
    )
    src = np.zeros((n, n, 2), np.float32)
    src[3 * n // 4, n // 2, 0] = 10.0
    return cfg, op, jnp.asarray(sos), jnp.asarray(src)


def _cslp_precond(cfg, op, sos):
    import jax.numpy as jnp

    k_sq = (cfg.source.omega / jnp.asarray(sos, jnp.float32)) ** 2
    return make_shifted_laplace_inverse(op, k_sq, (1.0, 0.5))


class TestRecycledFGMRES:
    def test_converges_and_true_residuals(self):
        cfg, op, sos, src = _problem(contrast=0.3)
        res = solve_fgmres(
            op, src, sos, cfg=cfg,
            precond_field=_cslp_precond(cfg, op, sos),
            restart=8, max_restarts=25, tol=1e-6,
            host_arnoldi=True, recycle_k=3,
        )
        norms = np.asarray(res.residual_norms)
        assert norms[-1] < 1e-6
        assert res.recycle_state is not None

    def test_recycle_space_invariant(self):
        """A U^T = C^T with C orthonormal — the GCRO-DR invariant that
        keeps the space valid under preconditioner changes."""
        import jax.numpy as jnp

        from helmnet_tpu.solvers.gmres import make_helmholtz_matvec

        cfg, op, sos, src = _problem()
        res = solve_fgmres(
            op, src, sos, cfg=cfg,
            precond_field=_cslp_precond(cfg, op, sos),
            restart=8, max_restarts=4, tol=1e-12,
            host_arnoldi=True, recycle_k=3,
        )
        U, C = res.recycle_state
        U = np.asarray(U.real) + 1j * np.asarray(U.imag)
        C = np.asarray(C.real) + 1j * np.asarray(C.imag)
        # C orthonormal rows
        G = C @ C.conj().T
        np.testing.assert_allclose(G, np.eye(3), atol=2e-3)
        # A U^T == C^T (columns), via the device matvec
        k_sq = (cfg.source.omega / jnp.asarray(sos, jnp.float32)) ** 2
        mv = make_helmholtz_matvec(op, k_sq, "matmul")
        n = sos.shape[0]
        for i in range(3):
            ui = jnp.asarray(U[i].reshape(n, n))
            ui = jnp.asarray(ui)  # complex on CPU tests is fine
            Au = np.asarray(mv(ui)).reshape(-1)
            scale = max(np.abs(Au).max(), 1e-12)
            assert np.abs(Au - C[i]).max() / scale < 5e-2

    def test_beats_or_matches_plain_restarted(self):
        """At an aggressive restart truncation (the 8192^2 regime scaled
        down), recycling must reach a deeper residual in the same number
        of outer iterations."""
        cfg, op, sos, src = _problem()
        pre = _cslp_precond(cfg, op, sos)
        kw = dict(cfg=cfg, precond_field=pre, restart=4, max_restarts=12,
                  tol=1e-12, host_arnoldi=True)
        plain = solve_fgmres(op, src, sos, **kw)
        rec = solve_fgmres(op, src, sos, recycle_k=2, **kw)
        p = np.asarray(plain.residual_norms)[-1]
        r = np.asarray(rec.residual_norms)[-1]
        assert r < p * 1.05, (r, p)

    def test_state_survives_across_calls(self):
        """Warm-started continuation with the returned recycle_state must
        keep converging (the 8192^2 tool's budget loop)."""
        cfg, op, sos, src = _problem()
        pre = _cslp_precond(cfg, op, sos)
        kw = dict(cfg=cfg, precond_field=pre, restart=6, tol=1e-12,
                  host_arnoldi=True, recycle_k=2)
        r1 = solve_fgmres(op, src, sos, max_restarts=3, **kw)
        r2 = solve_fgmres(
            op, src, sos, max_restarts=3, x0=r1.wavefield,
            recycle_state=r1.recycle_state, **kw,
        )
        n1 = np.asarray(r1.residual_norms)
        n2 = np.asarray(r2.residual_norms)
        assert n2[0] == pytest.approx(n1[-1], rel=1e-3)
        assert n2[-1] < n1[-1]

    def test_two_level_recycled_front_end(self):
        cfg, op, sos, src = _problem(contrast=0.3)
        res = solve_fgmres_two_level(
            op, src, sos, cfg=cfg, smoother="cslp", restart=6,
            max_restarts=10, coarse_restart=16, coarse_max_restarts=1,
            tol=1e-5, host_arnoldi=True, recycle_k=2,
        )
        norms = np.asarray(res.residual_norms)
        assert norms[-1] < 1e-4
        assert res.recycle_state is not None
