"""Eval-harness tests: metric conventions + the fig_generic parity flow."""

import os

import numpy as np
import pytest

from helmnet_tpu.eval import harness


class TestMetrics:
    def test_normalize_at_source_pixel(self):
        f = np.random.default_rng(0).standard_normal((8, 8, 2)).astype(np.float32)
        norm = harness.normalize_wavefield(f, (3, 4))
        assert norm[3, 4] == pytest.approx(1.0 + 0j, abs=1e-6)

    def test_field_difference_identical_is_zero(self):
        f = np.random.default_rng(1).standard_normal((16, 16, 2))
        diff, _, _ = harness.field_difference(f, f, (8, 8), pml_size=2)
        assert diff.shape == (12, 12)
        np.testing.assert_allclose(diff, 0.0, atol=1e-12)

    def test_conjugate_reference_convention(self):
        f = np.random.default_rng(2).standard_normal((16, 16, 2))
        fc = harness.to_complex(f)
        diff, _, _ = harness.field_difference(
            f, np.conj(fc), (8, 8), pml_size=2, conjugate_reference=True
        )
        np.testing.assert_allclose(diff, 0.0, atol=1e-12)

    def test_linf_rmse(self):
        d = np.zeros((4, 10, 10))
        d[2, 3, 3] = 0.5
        linf, rmse = harness.linf_and_rmse(d)
        assert linf[2] == 0.5 and linf[0] == 0.0
        assert rmse[2] == pytest.approx(0.05)

    def test_error_traces_shape(self):
        wfs = np.random.default_rng(3).standard_normal((5, 16, 16, 2))
        ref = wfs[-1]
        linf, rmse = harness.error_traces(wfs, ref, (8, 8), pml_size=2)
        assert linf.shape == (5,) and rmse.shape == (5,)
        assert linf[-1] == pytest.approx(0.0, abs=1e-6)


class TestCompareSolvers:
    def test_fig_generic_flow(self):
        ckpt = "/root/reference/trained_models/jcp_paper_trained_weights.ckpt"
        if not os.path.exists(ckpt):
            pytest.skip("reference checkpoint not available")
        from helmnet_tpu.solvers.iterative import IterativeSolver

        solver = IterativeSolver.from_reference_checkpoint(ckpt)
        sos = np.ones((96, 96), np.float32)
        sos[30:60, 20:70] = 1.6
        cmp = harness.compare_solvers(
            solver, sos, num_iterations=200, decimate=20,
            gmres_restart=50, gmres_max_restarts=20, gmres_tol=1e-7,
        )
        # learned solver within 2% l_inf of GMRES on the same operator
        assert cmp.linf < 0.02, cmp.linf
        # error trace decreases as iterations proceed
        assert cmp.model_linf_trace[-1] < cmp.model_linf_trace[0]
        # GMRES checkpoints show convergence
        assert cmp.gmres_residual_norms[-1] < cmp.gmres_residual_norms[0] * 1e-2
