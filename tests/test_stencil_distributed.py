"""Stencil operator accuracy + sharded == single-device equality on the
8-device virtual CPU mesh (SURVEY.md section 4c test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from helmnet_tpu.core.config import ParallelConfig
from helmnet_tpu.core.meshes import make_mesh
from helmnet_tpu.distributed.halo import (
    make_sharded_residual_norm,
    make_sharded_stencil_residual,
    spatial_put,
)
from helmnet_tpu.ops import spectral, stencil


class TestStencilAccuracy:
    def test_orders_converge_to_spectral(self):
        """4th order must beat 2nd order against the spectral operator on a
        smooth field; both should be small."""
        n = 64
        sp = spectral.make_operator(n, n, 8, 2.0, 1.0)
        x = 2 * np.pi * np.arange(n) / n
        u = np.outer(np.sin(2 * x), np.cos(x)).astype(np.float32)
        u_pair = np.stack([u, 0 * u], -1)[None]
        ref = np.asarray(spectral.laplacian(sp, u_pair))
        errs = {}
        for order in (2, 4):
            st = stencil.make_stencil_operator(n, n, 8, 2.0, 1.0, order)
            got = np.asarray(stencil.laplacian_stencil(st, u_pair))
            errs[order] = np.abs(got - ref).max() / np.abs(ref).max()
        assert errs[4] < errs[2] * 0.2
        assert errs[4] < 5e-3

    def test_matches_dense_fd_matrix(self):
        """Cross-check the tap tables against a brute-force dense assembly."""
        n = 16
        st = stencil.make_stencil_operator(n, n, 4, 2.0, 1.0, order=2)
        from helmnet_tpu.ops.pml import pml_coefficients_1d

        a, b = pml_coefficients_1d(n, 4, 2.0, 1.0)
        # dense 1D operator with periodic wrap
        A = np.zeros((n, n), np.complex128)
        for i in range(n):
            A[i, (i - 1) % n] += a[i] * -0.5 + b[i] * 1.0
            A[i, i] += b[i] * -2.0
            A[i, (i + 1) % n] += a[i] * 0.5 + b[i] * 1.0
        rng = np.random.default_rng(0)
        uc = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        expected = A @ uc + uc @ A.T
        u_pair = np.stack([uc.real, uc.imag], -1).astype(np.float32)[None]
        got = np.asarray(stencil.laplacian_stencil(st, u_pair))[0]
        got_c = got[..., 0] + 1j * got[..., 1]
        np.testing.assert_allclose(got_c, expected, atol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestShardedStencil:
    @pytest.fixture(scope="class")
    def mesh(self):
        return make_mesh(ParallelConfig(data=2, y=2, x=2))

    def test_sharded_equals_single_device(self, mesh):
        n = 32
        st = stencil.make_stencil_operator(n, n, 4, 2.0, 1.0, order=4)
        rng = np.random.default_rng(1)
        u = rng.standard_normal((4, n, n, 2)).astype(np.float32)
        k_sq = rng.uniform(0.5, 1.2, (4, n, n)).astype(np.float32)
        src = rng.standard_normal((4, n, n, 2)).astype(np.float32)

        expected = np.asarray(
            stencil.helmholtz_residual_stencil(st, u, k_sq, src)
        )

        residual = make_sharded_stencil_residual(mesh, st)
        u_s, k_s, s_s = spatial_put(mesh, (jnp.asarray(u), jnp.asarray(k_sq), jnp.asarray(src)))
        got = residual(u_s, k_s, s_s)
        np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)

    def test_sharded_norm(self, mesh):
        rng = np.random.default_rng(2)
        res = rng.standard_normal((4, 32, 32, 2)).astype(np.float32)
        norm_fn = make_sharded_residual_norm(mesh)
        got = np.asarray(norm_fn(spatial_put(mesh, jnp.asarray(res))))
        expected = np.sqrt((res**2).mean(axis=(1, 2, 3)))
        np.testing.assert_allclose(got, expected, rtol=1e-6)

    def test_gspmd_spectral_matmul_sharded(self, mesh):
        """The matmul spectral operator under plain GSPMD spatial sharding
        must match single-device results (XLA inserts the collectives)."""
        n = 32
        op = spectral.make_operator(n, n, 4, 2.0, 1.0)
        rng = np.random.default_rng(3)
        u = rng.standard_normal((4, n, n, 2)).astype(np.float32)
        expected = np.asarray(spectral.laplacian(op, u))
        u_s = jax.device_put(
            jnp.asarray(u), NamedSharding(mesh, P("data", "y", "x", None))
        )
        got = jax.jit(lambda v: spectral.laplacian(op, v))(u_s)
        np.testing.assert_allclose(np.asarray(got), expected, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestDistributedFFT:
    def test_sharded_fft_laplacian_matches(self):
        from helmnet_tpu.distributed.dfft import (
            make_sharded_laplacian_fft,
            make_sharded_residual_fft,
        )

        mesh = make_mesh(ParallelConfig(data=2, y=4, x=1))
        n = 64
        op = spectral.make_operator(n, n, 8, 2.0, 1.0)
        rng = np.random.default_rng(5)
        u = rng.standard_normal((4, n, n, 2)).astype(np.float32)
        expected = np.asarray(spectral.laplacian(op, u, "fft"))

        lap = make_sharded_laplacian_fft(mesh, op)
        u_s = jax.device_put(
            jnp.asarray(u), NamedSharding(mesh, P("data", "y", None, None))
        )
        got = np.asarray(lap(u_s))
        np.testing.assert_allclose(got, expected, atol=2e-4)

        # residual form
        k_sq = rng.uniform(0.5, 1.2, (4, n, n)).astype(np.float32)
        src = rng.standard_normal((4, n, n, 2)).astype(np.float32)
        res = make_sharded_residual_fft(mesh, op)
        got_r = np.asarray(res(
            u_s,
            jax.device_put(jnp.asarray(k_sq), NamedSharding(mesh, P("data", "y", None))),
            jax.device_put(jnp.asarray(src), NamedSharding(mesh, P("data", "y", None, None))),
        ))
        exp_r = expected + k_sq[..., None] * u - src
        np.testing.assert_allclose(got_r, exp_r, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestShardedGMRES:
    def test_gmres_under_spatial_sharding(self):
        """GMRES with spatially-sharded vectors (GSPMD partitions the
        matvec) matches the single-device solve."""
        from helmnet_tpu.ops.source import point_source_map
        from helmnet_tpu.solvers import gmres

        n = 64
        op = spectral.make_operator(n, n, 8, 2.0, 1.0)
        sos = np.ones((n, n), np.float32)
        sos[20:40, 16:52] = 1.5
        k_sq = (1.0 / sos) ** 2
        src = point_source_map(n, n, (n - 12, n // 2), 10.0)

        ref = gmres.solve_helmholtz(
            op, k_sq, src, restart=60, max_restarts=15, tol=1e-6
        )

        mesh = make_mesh(ParallelConfig(data=1, y=4, x=2))
        sharding = NamedSharding(mesh, P("y", "x"))
        k_s = jax.device_put(jnp.asarray(k_sq), sharding)
        s_s = jax.device_put(
            jnp.asarray(src), NamedSharding(mesh, P("y", "x", None))
        )
        got = gmres.solve_helmholtz(
            op, k_s, s_s, restart=60, max_restarts=15, tol=1e-6
        )
        # f32 Krylov trajectories differ under resharded reduction order;
        # assert solution QUALITY matches: both converge to the same
        # residual level and the fields agree to iterative-solver accuracy
        rn_ref = np.asarray(ref.residual_norms)
        rn_got = np.asarray(got.residual_norms)
        assert rn_got[-1] <= rn_ref[-1] * 10
        assert rn_got[-1] <= rn_got[0] * 1e-2
        scale = np.abs(np.asarray(ref.x)).max()
        np.testing.assert_allclose(
            np.asarray(got.x), np.asarray(ref.x), atol=3e-2 * scale
        )
