"""3D two-level flexible GMRES (solvers/twolevel3d.py) — the 3D analog of
the composition that closed the 2D high-wavenumber/heterogeneous regime.
The reference has no 3D at all (/root/reference/helmnet is 2D-only)."""

import numpy as np
import pytest

from helmnet_tpu.ops.spectral3d import make_operator3d, point_source_map3d
from helmnet_tpu.solvers.helm3d import solve_helmholtz3d
from helmnet_tpu.solvers.twolevel3d import (
    solve_fgmres_two_level3d,
    spectral_resize_complex3d,
)

PML, SIGMA, K0 = 8, 2.0, 1.0


def _problem(n=48):
    import jax.numpy as jnp

    op = make_operator3d(n, n, n, PML, SIGMA, K0)
    rng = np.random.default_rng(7)
    sos = np.ones((n, n, n), np.float32)
    a, b = n // 3, 2 * n // 3
    sos[a:b, a:b, a:b] = 1.0 + 0.8 * rng.random((b - a,) * 3).astype(
        np.float32
    )
    k_sq = (K0 / sos) ** 2
    src = np.asarray(
        point_source_map3d(n, n, n, (n - 12, n // 2, n // 2), 10.0, 0.0, K0)
    )
    return op, jnp.asarray(k_sq), jnp.asarray(src)


class TestResize3D:
    def test_spectral_resize_exact_for_resolvable_modes(self):
        import jax
        import jax.numpy as jnp

        z, y, x = np.mgrid[0:32, 0:32, 0:32]
        v = np.exp(
            1j * 2 * np.pi * (3 * z + 5 * y + 7 * x) / 32
        ).astype(np.complex64)
        vj = jax.lax.complex(jnp.asarray(v.real), jnp.asarray(v.imag))
        down = spectral_resize_complex3d(vj, (16, 16, 16))
        up = spectral_resize_complex3d(down, (32, 32, 32))
        assert np.abs(np.asarray(up - vj)).max() < 1e-5
        np.testing.assert_allclose(
            np.abs(np.asarray(down)).max(), 1.0, rtol=1e-5
        )

    def test_mixed_resize_rejected(self):
        import jax
        import jax.numpy as jnp

        zf = jnp.zeros((16, 16, 16), jnp.float32)
        v = jax.lax.complex(zf, zf)
        with pytest.raises(ValueError, match="mixed"):
            spectral_resize_complex3d(v, (8, 32, 16))


class TestTwoLevel3D:
    def test_converges_with_true_residuals(self):
        import jax.numpy as jnp

        from helmnet_tpu.ops.spectral3d import helmholtz_residual3d

        op, k_sq, src = _problem()
        res = solve_fgmres_two_level3d(
            op, src, k_sq, k0=K0, pml_size=PML, sigma_max=SIGMA,
            restart=8, max_restarts=8, coarse_restart=16,
            coarse_max_restarts=2, tol=1e-6,
        )
        norms = np.asarray(res.residual_norms)
        assert norms[-1] < 1e-4, norms
        r = helmholtz_residual3d(op, res.wavefield, k_sq, src, "matmul")
        true_rel = float(
            np.linalg.norm(np.asarray(r).ravel())
            / np.linalg.norm(np.asarray(src).ravel())
        )
        np.testing.assert_allclose(true_rel, norms[-1], rtol=1e-3, atol=1e-8)

    def test_beats_cslp_at_equal_outer_iterations(self):
        op, k_sq, src = _problem()
        two = solve_fgmres_two_level3d(
            op, src, k_sq, k0=K0, pml_size=PML, sigma_max=SIGMA,
            restart=6, max_restarts=2, coarse_restart=16,
            coarse_max_restarts=2, tol=0.0,
        )
        cslp = solve_helmholtz3d(
            op, k_sq, src, restart=6, max_restarts=2, tol=0.0,
            precond="shifted_laplace",
        )
        hist = np.asarray(cslp.residual_norms)
        cslp_rel = float(hist[-1] / hist[0])
        two_rel = float(np.asarray(two.residual_norms)[-1])
        assert two_rel < cslp_rel / 2, (two_rel, cslp_rel)

    def test_learned_smoother_composition(self):
        """3D analog of the 2D learned-smoother two-level composition:
        trained HybridNet3D steps as the smoother + spectral coarse
        correction. Uses the committed 3D checkpoint at its native 48^3."""
        import dataclasses
        import os

        import jax.numpy as jnp
        import pytest

        ckpt = os.path.join(os.path.dirname(__file__), "..", "checkpoints",
                            "tpu3d_a", "params3d_ep80.npz")
        if not os.path.exists(ckpt):
            pytest.skip("trained 3D checkpoint not present")

        from helmnet_tpu.core.config import Config
        from helmnet_tpu.train.loop3d import load_params3d_npz

        cfg = Config()
        cfg = cfg.replace(
            geometry=dataclasses.replace(cfg.geometry, domain_size=48),
            model=dataclasses.replace(
                cfg.model, depth=3, state_depth=3, features=16,
                in_channels=7,
            ),
        )
        params = load_params3d_npz(ckpt, cfg)
        n = 48
        op = make_operator3d(n, n, n, cfg.geometry.pml_size,
                             cfg.geometry.sigma_max, cfg.source.omega)
        rng = np.random.default_rng(5)
        sos = np.ones((n, n, n), np.float32)
        sos[16:33, 12:39, 12:39] = 1.0 + rng.random(
            (17, 27, 27)).astype(np.float32)
        k_sq = jnp.asarray((cfg.source.omega / sos) ** 2)
        src = jnp.asarray(point_source_map3d(
            n, n, n, (n - 12, n // 2, n // 2), cfg.source.amplitude, 0.0,
            cfg.source.omega))

        res = solve_fgmres_two_level3d(
            op, src, k_sq, k0=cfg.source.omega,
            pml_size=cfg.geometry.pml_size,
            sigma_max=cfg.geometry.sigma_max,
            smoother="learned", params=params, cfg=cfg,
            smoother_iterations=6, restart=4, max_restarts=2,
            coarse_restart=12, coarse_max_restarts=1, tol=1e-5,
        )
        norms = np.asarray(res.residual_norms)
        assert norms[-1] < norms[0] / 40, norms
        assert np.all(np.diff(norms) < 0), norms

    def test_learned_smoother_requires_params_and_cfg(self):
        op, k_sq, src = _problem(n=32)
        with pytest.raises(ValueError, match="params and cfg"):
            solve_fgmres_two_level3d(
                op, src, k_sq, k0=K0, pml_size=PML, sigma_max=SIGMA,
                smoother="learned", restart=2, max_restarts=1,
            )

    def test_host_arnoldi_matches_device_cycle(self):
        op, k_sq, src = _problem(n=32)
        kw = dict(k0=K0, pml_size=PML, sigma_max=SIGMA, restart=6,
                  max_restarts=3, coarse_restart=12, coarse_max_restarts=1,
                  tol=0.0)
        dev = solve_fgmres_two_level3d(op, src, k_sq,
                                       host_arnoldi=False, **kw)
        host = solve_fgmres_two_level3d(op, src, k_sq,
                                        host_arnoldi=True, **kw)
        np.testing.assert_allclose(
            np.asarray(dev.residual_norms), np.asarray(host.residual_norms),
            rtol=2e-2,
        )
