"""3D spectral PML operator + GMRES tests (capability extension; the
reference is 2D-only — helmnet/spectral.py and the MATLAB baseline both
build 2D grids). Cross-checks: matmul vs fft operator modes, dense kron
assembly, direct solve, CSLP-preconditioned GMRES convergence."""

import numpy as np

from helmnet_tpu.ops.spectral3d import (
    assemble_dense3d,
    helmholtz_residual3d,
    laplacian3d,
    make_operator3d,
    point_source_map3d,
)
from helmnet_tpu.solvers.helm3d import (
    solve_helmholtz3d,
    solve_helmholtz3d_batch,
)


def tiny_problem(d=10, h=12, w=14, pml=3, omega=1.0):
    rng = np.random.default_rng(0)
    sos = np.ones((d, h, w), np.float32)
    sos[3:6, 4:8, 5:10] = 1.5
    k_sq = (omega / sos) ** 2
    src = point_source_map3d(d, h, w, (d - 4, h // 2, w // 2), 10.0)
    op = make_operator3d(d, h, w, pml, 2.0, omega)
    return op, k_sq, src, (d, h, w), pml


class TestOperator3D:
    def test_matmul_fft_modes_agree(self):
        op, k_sq, src, (d, h, w), _ = tiny_problem()
        rng = np.random.default_rng(1)
        u = rng.standard_normal((d, h, w, 2)).astype(np.float32)
        lm = np.asarray(laplacian3d(op, u, "matmul"))
        lf = np.asarray(laplacian3d(op, u, "fft"))
        scale = np.abs(lm).max()
        np.testing.assert_allclose(lm, lf, atol=2e-5 * scale)

    def test_matches_dense_assembly(self):
        op, k_sq, src, (d, h, w), pml = tiny_problem()
        rng = np.random.default_rng(2)
        u = rng.standard_normal((d, h, w, 2)).astype(np.float32)
        uc = u[..., 0] + 1j * u[..., 1]
        M = assemble_dense3d(d, h, w, pml, 2.0, 1.0)
        want = (M @ uc.ravel()).reshape(d, h, w)
        got_pair = np.asarray(laplacian3d(op, u, "matmul"))
        got = got_pair[..., 0] + 1j * got_pair[..., 1]
        scale = np.abs(want).max()
        np.testing.assert_allclose(got, want, atol=2e-5 * scale)

    def test_residual_of_direct_solution_is_small(self):
        op, k_sq, src, (d, h, w), pml = tiny_problem()
        M = assemble_dense3d(d, h, w, pml, 2.0, 1.0, k_sq=k_sq)
        b = (src[..., 0] + 1j * src[..., 1]).ravel()
        u = np.linalg.solve(M, b).reshape(d, h, w)
        pair = np.stack([u.real, u.imag], -1).astype(np.float32)
        r = np.asarray(helmholtz_residual3d(op, pair, k_sq, src))
        assert np.abs(r).max() < 2e-4 * np.abs(b).max()

    def test_sigma_maps_shape_and_bands(self):
        op, *_ = tiny_problem()
        s = np.asarray(op.sigmas)
        assert s.shape == (3, 10, 12, 14)
        # sigma_x varies along the last axis only
        assert s[0, :, :, 0].std() == 0 and s[0, 0, 0, 0] > 0
        # interior is absorption-free
        assert s[:, 4:6, 4:8, 4:10].max() == 0


class TestSolve3D:
    def test_gmres_matches_dense_direct(self):
        op, k_sq, src, (d, h, w), pml = tiny_problem()
        res = solve_helmholtz3d(
            op, k_sq, src, restart=30, max_restarts=40, tol=1e-7
        )
        M = assemble_dense3d(d, h, w, pml, 2.0, 1.0, k_sq=k_sq)
        b = (src[..., 0] + 1j * src[..., 1]).ravel()
        u = np.linalg.solve(M, b).reshape(d, h, w)
        xp = np.asarray(res.x)
        got = xp[..., 0] + 1j * xp[..., 1]
        scale = np.abs(u).max()
        np.testing.assert_allclose(got, u, atol=5e-3 * scale)

    def test_cslp_accelerates_and_true_residual(self):
        # larger heterogeneous problem: CSLP reaches a tighter residual
        # than bare GMRES at the same iteration budget
        n, pml, omega = 24, 4, 2.0
        sos = np.ones((n, n, n), np.float32)
        sos[8:16, 6:18, 6:18] = 1.8
        k_sq = (omega / sos) ** 2
        src = point_source_map3d(n, n, n, (n - 6, n // 2, n // 2), 10.0)
        op = make_operator3d(n, n, n, pml, 2.0, omega)
        bare = solve_helmholtz3d(
            op, k_sq, src, restart=20, max_restarts=10, tol=1e-12
        )
        pre = solve_helmholtz3d(
            op, k_sq, src, restart=20, max_restarts=10, tol=1e-12,
            precond="shifted_laplace",
        )
        bnorm = np.linalg.norm(src)
        rel_bare = np.asarray(bare.residual_norms)[-1] / bnorm
        rel_pre = np.asarray(pre.residual_norms)[-1] / bnorm
        assert rel_pre < rel_bare
        assert rel_pre < 1e-3
        # recorded norms are TRUE residuals of the original system
        x = np.asarray(pre.x)
        r = np.asarray(
            helmholtz_residual3d(op, x, k_sq, src)
        )
        true_rel = np.linalg.norm(r) / bnorm
        np.testing.assert_allclose(true_rel, rel_pre, rtol=2e-2)

    def test_batched_sweep(self):
        op, k_sq, src, (d, h, w), pml = tiny_problem()
        k_batch = np.stack([k_sq, (1.0 / 1.2) ** 2 * np.ones_like(k_sq)])
        s_batch = np.stack([src, src])
        res = solve_helmholtz3d_batch(
            op, k_batch, s_batch, restart=20, max_restarts=20, tol=1e-6
        )
        assert res.x.shape == (2, d, h, w, 2)
        rel = np.asarray(res.residual_norms)[:, -1] / np.linalg.norm(src)
        assert (rel < 1e-4).all()
