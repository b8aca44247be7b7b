"""Pallas stencil-residual kernel vs the XLA stencil op and scipy CSR.

On CPU the kernel runs in interpret mode; the compiled path is exercised by
bench.py / TPU drives.
"""

import jax
import numpy as np
import pytest

from helmnet_tpu.ops import stencil
from helmnet_tpu.ops.pallas_stencil import (
    helmholtz_residual_pallas,
    stencil_to_csr,
)

INTERPRET = jax.devices()[0].platform == "cpu"


@pytest.fixture(scope="module", params=[2, 4])
def op(request):
    return stencil.make_stencil_operator(32, 32, 4, 2.0, 1.0, order=request.param)


class TestPallasStencil:
    def test_matches_xla_stencil(self, op):
        rng = np.random.default_rng(0)
        u = rng.standard_normal((3, 32, 32, 2)).astype(np.float32)
        k_sq = rng.uniform(0.5, 1.2, (3, 32, 32)).astype(np.float32)
        src = rng.standard_normal((3, 32, 32, 2)).astype(np.float32)
        expected = np.asarray(stencil.helmholtz_residual_stencil(op, u, k_sq, src))
        got = np.asarray(
            helmholtz_residual_pallas(op, u, k_sq, src, interpret=INTERPRET)
        )
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_matches_scipy_csr(self, op):
        rng = np.random.default_rng(1)
        uc = rng.standard_normal((32, 32)) + 1j * rng.standard_normal((32, 32))
        k_sq = rng.uniform(0.5, 1.2, (32, 32))
        M = stencil_to_csr(op, k_sq)
        expected = (M @ uc.ravel()).reshape(32, 32)
        u = np.stack([uc.real, uc.imag], -1).astype(np.float32)[None]
        got = np.asarray(
            helmholtz_residual_pallas(
                op, u, k_sq.astype(np.float32)[None],
                np.zeros_like(u), interpret=INTERPRET,
            )
        )[0]
        got_c = got[..., 0] + 1j * got[..., 1]
        np.testing.assert_allclose(got_c, expected, atol=1e-4)

    def test_csr_nnz_structure(self, op):
        M = stencil_to_csr(op)
        n = 32 * 32
        r = op.radius
        # cross stencil: 2 axes x 2r offsets + shared center = 4r + 1 nnz/row
        assert M.shape == (n, n)
        assert M.nnz == n * (4 * r + 1)

    def test_rectangular(self):
        op = stencil.make_stencil_operator(16, 48, 4, 2.0, 1.0, order=4)
        rng = np.random.default_rng(2)
        u = rng.standard_normal((2, 16, 48, 2)).astype(np.float32)
        k_sq = np.ones((2, 16, 48), np.float32)
        src = np.zeros_like(u)
        expected = np.asarray(stencil.helmholtz_residual_stencil(op, u, k_sq, src))
        got = np.asarray(
            helmholtz_residual_pallas(op, u, k_sq, src, interpret=INTERPRET)
        )
        np.testing.assert_allclose(got, expected, atol=1e-5)


class TestTiledKernel:
    def test_tiled_matches_xla(self):
        """Row-tiled manual-DMA path == XLA stencil (interpret on CPU)."""
        from helmnet_tpu.ops.pallas_stencil import residual_planes_tiled

        op = stencil.make_stencil_operator(256, 128, 8, 2.0, 1.0, order=4)
        rng = np.random.default_rng(3)
        u = rng.standard_normal((2, 256, 128, 2)).astype(np.float32)
        k_sq = rng.uniform(0.5, 1.2, (2, 256, 128)).astype(np.float32)
        src = rng.standard_normal((2, 256, 128, 2)).astype(np.float32)
        expected = np.asarray(stencil.helmholtz_residual_stencil(op, u, k_sq, src))
        rr, ri = residual_planes_tiled(
            op, u[..., 0], u[..., 1], k_sq, src[..., 0], src[..., 1],
            tile_h=64, interpret=INTERPRET,
        )
        got = np.stack([np.asarray(rr), np.asarray(ri)], -1)
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_bad_tile_divisor(self):
        from helmnet_tpu.ops.pallas_stencil import residual_planes_tiled

        op = stencil.make_stencil_operator(96, 128, 8, 2.0, 1.0, order=4)
        u = np.zeros((1, 96, 128), np.float32)
        with pytest.raises(ValueError):
            residual_planes_tiled(op, u, u, u, u, u, tile_h=40, interpret=INTERPRET)


class TestMXUKernel:
    def test_mxu_hybrid_matches_xla(self):
        from helmnet_tpu.ops.pallas_stencil import residual_planes_mxu

        op = stencil.make_stencil_operator(256, 128, 8, 2.0, 1.0, order=4)
        rng = np.random.default_rng(4)
        u = rng.standard_normal((2, 256, 128, 2)).astype(np.float32)
        k_sq = rng.uniform(0.5, 1.2, (2, 256, 128)).astype(np.float32)
        src = rng.standard_normal((2, 256, 128, 2)).astype(np.float32)
        expected = np.asarray(stencil.helmholtz_residual_stencil(op, u, k_sq, src))
        rr, ri = residual_planes_mxu(
            op, u[..., 0], u[..., 1], k_sq, src[..., 0], src[..., 1],
            tile_h=64, interpret=INTERPRET,
        )
        got = np.stack([np.asarray(rr), np.asarray(ri)], -1)
        np.testing.assert_allclose(got, expected, atol=2e-4)
