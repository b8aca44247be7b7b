"""Golden math tests for the spectral PML operator.

Strategy (SURVEY.md section 4): unit-test each op against closed forms —
spectral derivatives of sinusoids, PML coefficients vs their defining
formulas, and the matrix-free operator vs dense kron assembly (the MATLAB
construction, matlab/spectral_gmres_solver.m:50-90).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helmnet_tpu.ops import pml, spectral


def as_pair(c):
    return np.stack([c.real, c.imag], axis=-1).astype(np.float32)


def as_complex(p):
    return np.asarray(p[..., 0] + 1j * p[..., 1])


class TestProfiles:
    def test_sigma_profile_values(self):
        s = pml.sigma_profile(96, 8, 2.0)
        assert s[0] == pytest.approx(2.0)
        assert s[8] == 0.0 and s[48] == 0.0
        # mirrored: flip(outer) ends at sigma_max at the boundary
        assert s[-1] == pytest.approx(2.0)
        assert s[-8] == pytest.approx(2.0 * (1 / 8) ** 2)
        np.testing.assert_allclose(s[1], 2.0 * (1 - 1 / 8) ** 2)

    def test_coefficients_interior(self):
        a, b = pml.pml_coefficients_1d(96, 8, 2.0, 1.0)
        # interior: gamma=1 -> a=0, b=1
        np.testing.assert_allclose(a[8:-8], 0.0)
        np.testing.assert_allclose(b[8:-8], 1.0)

    def test_coefficients_formula(self):
        n, p, sm, k0 = 64, 8, 2.0, 1.0
        a, b = pml.pml_coefficients_1d(n, p, sm, k0)
        sig = pml.sigma_profile(n, p, sm)
        sigp = pml.sigma_prime_profile(n, p, sm)
        gamma = 1 + 1j / k0 * sig
        np.testing.assert_allclose(b, 1 / gamma**2, rtol=1e-12)
        np.testing.assert_allclose(a, -(1j / k0 * sigp) / gamma**3, rtol=1e-12)

    def test_sigma_maps_orientation(self):
        sx, sy = pml.sigma_maps(32, 48, 4, 2.0)
        assert sx.shape == (32, 48) and sy.shape == (32, 48)
        # sigma_x varies along the last axis only
        assert np.all(sx[0] == sx[17])
        assert np.all(sy[:, 0] == sy[:, 31])
        assert sx[16, 0] == pytest.approx(2.0)
        assert sy[0, 20] == pytest.approx(2.0)


class TestDerivativeMatrices:
    def test_derivative_of_sinusoid(self):
        # unit grid spacing (dx=1), so e^{i k_m x} with k_m = 2*pi*m/n
        n = 64
        D1, D2 = spectral.dft_derivative_matrices(n)
        x = np.arange(n)
        for m in (1, 3, 7):
            km = 2 * np.pi * m / n
            u = np.exp(1j * km * x)
            np.testing.assert_allclose(D1 @ u, 1j * km * u, atol=1e-10)
            np.testing.assert_allclose(D2 @ u, -(km**2) * u, atol=1e-9)

    def test_wavenumbers_match_reference_construction(self):
        # reference: 2*pi*linspace(-.5,.5,n,endpoint=False) rolled to fft order
        n = 96
        k_ref = 2 * np.pi * np.linspace(-0.5, 0.5, n, endpoint=False)
        k_ref = np.concatenate([k_ref[n // 2 :], k_ref[: n // 2]])
        np.testing.assert_allclose(spectral.wavenumbers(n), k_ref, atol=1e-12)


class TestLaplacian:
    @pytest.fixture(scope="class")
    def op(self):
        return spectral.make_operator(48, 48, 8, 2.0, 1.0)

    def test_matmul_vs_fft_mode(self, op):
        rng = np.random.default_rng(0)
        u = rng.standard_normal((2, 48, 48, 2)).astype(np.float32)
        lm = spectral.laplacian(op, u, "matmul")
        lf = spectral.laplacian(op, u, "fft")
        np.testing.assert_allclose(np.asarray(lm), np.asarray(lf), atol=2e-4)

    def test_matches_dense_kron_assembly(self):
        H = W = 32
        op = spectral.make_operator(H, W, 8, 2.0, 1.0)
        rng = np.random.default_rng(1)
        uc = rng.standard_normal((H, W)) + 1j * rng.standard_normal((H, W))
        M = spectral.assemble_dense(H, W, 8, 2.0, 1.0)
        expected = (M @ uc.ravel()).reshape(H, W)
        got = as_complex(np.asarray(spectral.laplacian(op, as_pair(uc)[None], "matmul"))[0])
        np.testing.assert_allclose(got, expected, atol=5e-3, rtol=1e-4)

    def test_interior_is_plain_laplacian(self):
        # Away from the PML, the operator must reduce to the spectral Laplacian
        n = 64
        op = spectral.make_operator(n, n, 8, 2.0, 1.0)
        x = 2 * np.pi * np.arange(n) / n  # wavenumbers 2*pi*m/n on dx=1 grid
        u = np.outer(np.sin(2 * x), np.cos(3 * x)).astype(np.complex128)
        k2, k3 = 2 * np.pi * 2 / n, 2 * np.pi * 3 / n
        expected = -(k2**2 + k3**2) * u
        got = as_complex(np.asarray(spectral.laplacian(op, as_pair(u)[None], "matmul"))[0])
        interior = np.s_[16:-16, 16:-16]
        np.testing.assert_allclose(got[interior], expected[interior], atol=5e-3)

    def test_residual(self, op):
        rng = np.random.default_rng(2)
        u = rng.standard_normal((1, 48, 48, 2)).astype(np.float32)
        k_sq = rng.uniform(0.5, 1.0, (1, 48, 48)).astype(np.float32)
        src = rng.standard_normal((1, 48, 48, 2)).astype(np.float32)
        r = spectral.helmholtz_residual(op, u, k_sq, src)
        expected = np.asarray(spectral.laplacian(op, u)) + k_sq[..., None] * u - src
        np.testing.assert_allclose(np.asarray(r), expected, atol=1e-5)

    def test_dense_free_operator(self, op):
        # make_operator(dense=False) must serve the fft path exactly (the
        # 8192^2 capability path: the dense tables are ~1 GB there and
        # overflow remote-compile requests when closed over), while matmul
        # mode fails loudly and a CSLP-preconditioned solve still works.
        from helmnet_tpu.solvers.gmres import solve_helmholtz

        lean = spectral.make_operator(48, 48, 8, 2.0, 1.0, dense=False)
        assert not lean.has_dense and (lean.height, lean.width) == (48, 48)
        rng = np.random.default_rng(4)
        u = rng.standard_normal((2, 48, 48, 2)).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(spectral.laplacian(lean, u, "fft")),
            np.asarray(spectral.laplacian(op, u, "fft")),
        )
        with pytest.raises(ValueError, match="dense=False"):
            spectral.laplacian(lean, u, "matmul")
        k_sq = np.full((48, 48), 1.0, np.float32)
        src = rng.standard_normal((48, 48, 2)).astype(np.float32)
        res = solve_helmholtz(lean, k_sq, src, mode="fft", restart=20,
                              max_restarts=30, tol=1e-5,
                              precond="shifted_laplace")
        assert float(res.residual_norms[-1]) < 1e-4 * np.linalg.norm(src)

    def test_rectangular_grid(self):
        # capability beyond the square-only reference
        op = spectral.make_operator(32, 64, 4, 2.0, 1.0)
        u = np.random.default_rng(3).standard_normal((1, 32, 64, 2)).astype(np.float32)
        lm = spectral.laplacian(op, u, "matmul")
        lf = spectral.laplacian(op, u, "fft")
        assert lm.shape == (1, 32, 64, 2)
        np.testing.assert_allclose(np.asarray(lm), np.asarray(lf), atol=2e-4)

    def test_solution_of_manufactured_problem(self):
        """Solve M u = s densely, check residual op returns ~0 at the solution."""
        H = W = 32
        op = spectral.make_operator(H, W, 4, 2.0, 1.0)
        rng = np.random.default_rng(4)
        k_sq = rng.uniform(0.8, 1.2, (H, W))
        M = spectral.assemble_dense(H, W, 4, 2.0, 1.0, k_sq=k_sq)
        s = np.zeros((H, W), np.complex128)
        s[H // 2, W // 2] = 1.0
        u = np.linalg.solve(M, s.ravel()).reshape(H, W)
        r = spectral.helmholtz_residual(
            op,
            as_pair(u)[None],
            jnp.asarray(k_sq, jnp.float32)[None],
            as_pair(s)[None],
        )
        assert float(jnp.abs(r).max()) < 5e-4 * float(np.abs(u).max() + 1)


class TestAutoMode:
    """operator_mode='auto' resolves per grid size from the measured
    on-chip crossover (tools/r3_op_crossover.py)."""

    def test_resolution_thresholds(self):
        from helmnet_tpu.ops.spectral import resolve_mode

        assert resolve_mode("auto", 96, 96) == "matmul"
        assert resolve_mode("auto", 512, 512) == "matmul"
        assert resolve_mode("auto", 1024, 1024) == "fft"
        assert resolve_mode("auto", 2048, 2048) == "fft"
        assert resolve_mode("auto", 512, 1024) == "fft"  # max-dim rule
        assert resolve_mode("matmul", 4096, 4096) == "matmul"  # explicit wins

    def test_auto_matches_concrete_mode(self):
        import jax.numpy as jnp
        import numpy as np

        from helmnet_tpu.ops.spectral import (
            helmholtz_residual,
            make_operator,
        )

        n = 32
        op = make_operator(n, n, 6, 2.0, 1.0)
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.standard_normal((n, n, 2)), jnp.float32)
        k_sq = jnp.ones((n, n), jnp.float32)
        src = jnp.zeros((n, n, 2), jnp.float32)
        r_auto = helmholtz_residual(op, u, k_sq, src, "auto")
        r_mm = helmholtz_residual(op, u, k_sq, src, "matmul")
        np.testing.assert_array_equal(np.asarray(r_auto), np.asarray(r_mm))
