"""Two-level (coarse-grid corrected) flexible GMRES (solvers/twolevel.py).

The coarse level is a factor-2 rediscretized spectral operator solved
approximately on device; the outer flexible iteration tolerates the
inexact solve. The reference's MATLAB GMRES is unpreconditioned
(matlab/spectral_gmres_solver.m:95-115) — this subsystem exists for the
strong-heterogeneity high-wavenumber regime it cannot reach.
"""

import numpy as np

from helmnet_tpu.core.config import Config, GeometryConfig
from helmnet_tpu.ops.spectral import make_operator
from helmnet_tpu.solvers.gmres import solve_helmholtz
from helmnet_tpu.solvers.twolevel import (
    resize_complex,
    solve_fgmres_multilevel,
    solve_fgmres_two_level,
    spectral_resize_complex,
)


def _problem(n=96, pml=8, sos_base=1.0):
    """Heterogeneous test problem. sos_base scales the background sound
    speed: k = omega/sos, so sos_base=2 doubles the points-per-wavelength
    (needed for valid >=3-level hierarchies — see the resolvability
    constraint in make_multilevel_preconditioner)."""
    import jax.numpy as jnp

    cfg = Config(geometry=GeometryConfig(domain_size=n, pml_size=pml,
                                         sigma_max=2.0))
    op = make_operator(n, n, pml, cfg.geometry.sigma_max, cfg.k0)
    rng = np.random.default_rng(3)
    sos = sos_base * np.ones((n, n), np.float32)
    r0, r1 = n // 3, 2 * n // 3
    c0, c1 = n // 4, 3 * n // 4
    sos[r0:r1, c0:c1] = (
        sos_base + rng.random((r1 - r0, c1 - c0)).astype(np.float32)
    )
    src = np.zeros((n, n, 2), np.float32)
    src[2 * n // 3, n // 4: 3 * n // 4, 0] = 10.0
    return cfg, op, jnp.asarray(sos), jnp.asarray(src)


class TestResize:
    def test_roundtrip_preserves_smooth_fields(self):
        import jax
        import jax.numpy as jnp

        y, x = np.mgrid[0:64, 0:64] / 64.0
        v = np.exp(1j * 2 * np.pi * (y + 2 * x)).astype(np.complex64)
        # complex values enter the device as split re/im (axon constraint)
        vj = jax.lax.complex(jnp.asarray(v.real), jnp.asarray(v.imag))
        down = resize_complex(vj, (32, 32))
        up = resize_complex(down, (64, 64))
        err = np.abs(np.asarray(up - vj)).max()
        # bilinear transfer keeps oscillatory 16-points-per-cycle content
        # to ~20% pointwise — plenty for a coarse-grid CORRECTION (the
        # outer flexible iteration absorbs transfer error); measured 0.209
        assert err < 0.25

    def test_spectral_resize_exact_for_resolvable_modes(self):
        """Fourier transfer must reproduce EXACTLY any mode the coarse
        grid resolves — the property that makes a 2-3 ppw spectral coarse
        grid usable where bilinear transfer is O(1) wrong."""
        import jax
        import jax.numpy as jnp

        y, x = np.mgrid[0:64, 0:64]
        # near-Nyquist-on-the-coarse-grid mode: 12 cycles across 64 fine
        # points = 2.7 coarse points per cycle at factor 2
        v = np.exp(1j * 2 * np.pi * (5 * y + 12 * x) / 64).astype(
            np.complex64
        )
        vj = jax.lax.complex(jnp.asarray(v.real), jnp.asarray(v.imag))
        down = spectral_resize_complex(vj, (32, 32))
        up = spectral_resize_complex(down, (64, 64))
        err = np.abs(np.asarray(up - vj)).max()
        assert err < 1e-5, err
        # and restriction preserves amplitude (unitary-mean scaling)
        amp = np.abs(np.asarray(down)).max()
        np.testing.assert_allclose(amp, 1.0, rtol=1e-5)


class TestTwoLevel:
    def test_converges_with_true_residuals(self):
        import jax.numpy as jnp

        from helmnet_tpu.ops.spectral import helmholtz_residual

        cfg, op, sos, src = _problem()
        res = solve_fgmres_two_level(
            op, src, sos, cfg=cfg, smoother="cslp",
            restart=8, max_restarts=8, coarse_restart=24,
            coarse_max_restarts=2, tol=1e-6,
        )
        norms = np.asarray(res.residual_norms)
        assert norms[-1] < 1e-4, norms
        k_sq = (cfg.source.omega / np.asarray(sos)) ** 2
        r = helmholtz_residual(
            op, res.wavefield[None], jnp.asarray(k_sq)[None],
            src[None], "matmul",
        )
        true_rel = float(
            np.linalg.norm(np.asarray(r).ravel())
            / np.linalg.norm(np.asarray(src).ravel())
        )
        np.testing.assert_allclose(true_rel, norms[-1], rtol=1e-3, atol=1e-8)

    def test_beats_cslp_at_equal_outer_iterations(self):
        """Coarse-grid correction must compress Krylov work beyond what
        the CSLP smoother alone achieves at the same outer budget."""
        cfg, op, sos, src = _problem()
        two = solve_fgmres_two_level(
            op, src, sos, cfg=cfg, smoother="cslp",
            restart=6, max_restarts=2, coarse_restart=24,
            coarse_max_restarts=2, tol=0.0,
        )
        cslp = solve_helmholtz(
            op, (cfg.source.omega / np.asarray(sos)) ** 2, src,
            restart=6, max_restarts=2, tol=0.0, precond="shifted_laplace",
        )
        hist = np.asarray(cslp.residual_norms)
        cslp_rel = float(hist[-1] / hist[0])
        two_rel = float(np.asarray(two.residual_norms)[-1])
        assert two_rel < cslp_rel / 2, (two_rel, cslp_rel)

    def test_host_arnoldi_matches_device_cycle(self):
        """The per-step host-driven Arnoldi (bounded single-dispatch
        duration for deep preconditioners) is numerically the same
        iteration as the whole-cycle device jit."""
        cfg, op, sos, src = _problem(n=64, pml=8)
        kw = dict(cfg=cfg, smoother="cslp", restart=6, max_restarts=3,
                  coarse_restart=16, coarse_max_restarts=1, tol=0.0)
        dev = solve_fgmres_two_level(op, src, sos, host_arnoldi=False, **kw)
        host = solve_fgmres_two_level(op, src, sos, host_arnoldi=True, **kw)
        a = np.asarray(dev.residual_norms)
        b = np.asarray(host.residual_norms)
        np.testing.assert_allclose(a, b, rtol=2e-2)

    def test_learned_smoother_composition(self):
        """The composition that solved the far-OOD 1024^2 problem
        (PERF_NOTES.md): learned smoother + spectral coarse correction.
        Uses the committed trained checkpoint at its native 96^2."""
        import os

        import pytest

        from helmnet_tpu.solvers.iterative import IterativeSolver

        ckpt = os.path.join(os.path.dirname(__file__), "..", "checkpoints",
                            "tpu_r2a")
        if not os.path.isdir(ckpt):
            pytest.skip("trained checkpoint not present")
        solver = IterativeSolver.from_orbax_checkpoint(ckpt)
        rng = np.random.default_rng(5)
        n = 96
        sos = np.ones((n, n), np.float32)
        sos[30:66, 24:78] = 1.0 + rng.random((36, 54)).astype(np.float32)
        src = np.zeros((n, n, 2), np.float32)
        src[60, n // 4: 3 * n // 4, 0] = 30.0  # extended line source
        import jax.numpy as jnp

        res = solve_fgmres_two_level(
            solver.op, jnp.asarray(src), jnp.asarray(sos), cfg=solver.cfg,
            smoother="learned", params=solver.params,
            smoother_iterations=10, restart=6, max_restarts=4,
            coarse_restart=16, coarse_max_restarts=1, tol=1e-5,
        )
        norms = np.asarray(res.residual_norms)
        assert norms[-1] < 5e-3, norms
        assert norms[-1] < norms[0] / 100

    def test_multilevel_levels2_matches_two_level(self):
        """levels=2 must reproduce the two-level composition exactly
        (same smoother, same deepest-grid CSLP-GMRES solve)."""
        cfg, op, sos, src = _problem(n=64, pml=8)
        kw = dict(cfg=cfg, smoother="cslp", restart=6, max_restarts=3,
                  coarse_restart=16, coarse_max_restarts=1, tol=0.0)
        two = solve_fgmres_two_level(op, src, sos, **kw)
        ml2 = solve_fgmres_multilevel(op, src, sos, levels=2, **kw)
        np.testing.assert_allclose(
            np.asarray(two.residual_norms), np.asarray(ml2.residual_norms),
            rtol=1e-4,
        )

    def test_three_level_converges_with_true_residuals(self):
        """128 -> 64 -> 32 recursion at a resolvable discretization
        (sos_base=2 -> 12.6 fine ppw, 3.1 ppw at the deepest level):
        intermediate level solved by a few flexible Krylov steps
        preconditioned by the deepest-level cycle; outer converges on the
        heterogeneous problem and the reported norms are TRUE residuals."""
        import jax.numpy as jnp

        from helmnet_tpu.ops.spectral import helmholtz_residual

        cfg, op, sos, src = _problem(n=128, pml=8, sos_base=2.0)
        res = solve_fgmres_multilevel(
            op, src, sos, cfg=cfg, levels=3, smoother="cslp",
            restart=8, max_restarts=8, inner_restart=6, inner_cycles=1,
            coarse_restart=24, coarse_max_restarts=2, tol=1e-6,
        )
        norms = np.asarray(res.residual_norms)
        assert norms[-1] < 1e-4, norms
        k_sq = (cfg.source.omega / np.asarray(sos)) ** 2
        r = helmholtz_residual(
            op, res.wavefield[None], jnp.asarray(k_sq)[None],
            src[None], "matmul",
        )
        true_rel = float(
            np.linalg.norm(np.asarray(r).ravel())
            / np.linalg.norm(np.asarray(src).ravel())
        )
        np.testing.assert_allclose(true_rel, norms[-1], rtol=1e-3, atol=1e-8)

    def test_three_level_beats_cslp_at_equal_outer_iterations(self):
        """The recursion must keep the two-level property that matters:
        compressing Krylov work beyond the smoother alone."""
        cfg, op, sos, src = _problem(n=128, pml=8, sos_base=2.0)
        ml = solve_fgmres_multilevel(
            op, src, sos, cfg=cfg, levels=3, smoother="cslp",
            restart=6, max_restarts=2, inner_restart=6,
            coarse_restart=24, coarse_max_restarts=2, tol=0.0,
        )
        cslp = solve_helmholtz(
            op, (cfg.source.omega / np.asarray(sos)) ** 2, src,
            restart=6, max_restarts=2, tol=0.0, precond="shifted_laplace",
        )
        hist = np.asarray(cslp.residual_norms)
        cslp_rel = float(hist[-1] / hist[0])
        ml_rel = float(np.asarray(ml.residual_norms)[-1])
        assert ml_rel < cslp_rel / 2, (ml_rel, cslp_rel)

    def test_underresolved_hierarchy_rejected(self):
        """3 levels at the JCP discretization (~6.3 fine ppw) puts the
        deepest grid at 1.6 ppw — aliased, and the correction actively
        hurts (measured stall at 8e-3). Must be rejected with the max
        valid depth in the message."""
        import pytest

        cfg, op, sos, src = _problem(n=128, pml=8, sos_base=1.0)
        with pytest.raises(ValueError, match="Max valid levels.*2"):
            solve_fgmres_multilevel(
                op, src, sos, cfg=cfg, levels=3, smoother="cslp",
                restart=4, max_restarts=1, tol=0.0,
            )

    def test_matches_reference_gmres_solution(self):
        cfg, op, sos, src = _problem()
        res = solve_fgmres_two_level(
            op, src, sos, cfg=cfg, smoother="cslp",
            restart=8, max_restarts=10, tol=1e-6,
        )
        ref = solve_helmholtz(
            op, (cfg.source.omega / np.asarray(sos)) ** 2, src,
            restart=30, max_restarts=30, tol=1e-8,
            precond="shifted_laplace",
        )
        a, b = np.asarray(res.wavefield), np.asarray(ref.x)
        scale = np.abs(b).max()
        np.testing.assert_allclose(a, b, atol=2e-2 * scale)
