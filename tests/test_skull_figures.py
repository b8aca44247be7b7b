"""Skull pipeline + figure generation tests."""

import os

import numpy as np
import pytest

from helmnet_tpu.data import skull


class TestSkullPipeline:
    def test_hounsfield_to_density_anchors(self):
        rho = skull.hounsfield_to_density(np.array([-1000.0, 0.0, 1500.0]))
        assert rho[0] < 10  # air
        assert 950 < rho[1] < 1100  # water
        assert rho[2] > 1800  # cortical bone

    def test_clean_mask(self):
        m = np.zeros((32, 32), bool)
        m[5:20, 5:20] = True
        m[10:12, 10:12] = False  # hole
        m[28, 28] = True  # speck
        c = skull.clean_mask(m)
        assert c[10, 10]  # hole filled
        assert not c[28, 28]  # speck removed

    def test_ct_to_medium(self):
        hu = skull.synthetic_skull_ct(128, seed=0)
        med = skull.ct_to_medium(hu)
        assert med.sos.shape == (128, 128)
        assert med.sos.min() >= 1.0 - 1e-6 and med.sos.max() <= 2.0 + 1e-6
        # skull annulus is the fast region
        assert med.sos[med.skull_mask].mean() > med.sos[~med.skull_mask].mean()
        assert 0.005 < med.skull_mask.mean() < 0.5

    def test_arc_source(self):
        src = skull.make_arc_source((64, 64), (60, 32), 10.0, (32, 32), 2.0)
        assert src.shape == (64, 64, 2)
        assert src[..., 0].sum() > 5  # some arc pixels
        assert np.all(src[..., 1] == 0)
        # arc points lie near the requested radius
        ys, xs = np.nonzero(src[..., 0])
        d = np.sqrt((ys - 60.0) ** 2 + (xs - 32.0) ** 2)
        assert np.all(np.abs(d - 10.0) < 1.5)

    def test_skull_example_runs_through_solver(self):
        """End-to-end: synthetic skull at small size through the solver."""
        ckpt = "/root/reference/trained_models/jcp_paper_trained_weights.ckpt"
        if not os.path.exists(ckpt):
            pytest.skip("reference checkpoint not available")
        from helmnet_tpu.solvers.iterative import IterativeSolver

        sos, source = skull.skull_example_problem(128, seed=0)
        solver = IterativeSolver.from_reference_checkpoint(ckpt)
        solver.set_domain_size(128, source_map=source[None])
        out = solver.forward(sos[None], num_iterations=100)
        r = np.asarray(out["rmse"])[:, 0]
        assert np.isfinite(r).all()
        assert r[-1] < r[0]


class TestFigures:
    def test_figures_render(self, tmp_path):
        from helmnet_tpu.eval import figures

        out = str(tmp_path)
        rmse = np.abs(np.random.default_rng(0).standard_normal((10, 50))) * \
            np.exp(-np.arange(50) / 10)[None] + 1e-6
        p1 = figures.fig_residual_rmse(rmse, out)
        wfs = np.random.default_rng(1).standard_normal((8, 32, 32, 2))
        p2 = figures.fig_testset_mosaic(wfs, rows=2, cols=4, out_dir=out)
        p3 = figures.fig_error_histograms(
            np.abs(np.random.default_rng(2).standard_normal(100)) * 0.01, out
        )
        for p in (p1, p2, p3):
            assert os.path.exists(p) and os.path.getsize(p) > 1000

    def test_fig_example_flow(self, tmp_path):
        ckpt = "/root/reference/trained_models/jcp_paper_trained_weights.ckpt"
        if not os.path.exists(ckpt):
            pytest.skip("reference checkpoint not available")
        from helmnet_tpu.eval import figures
        from helmnet_tpu.eval.harness import compare_solvers
        from helmnet_tpu.solvers.iterative import IterativeSolver

        solver = IterativeSolver.from_reference_checkpoint(ckpt)
        sos = np.ones((96, 96), np.float32)
        sos[40:60, 30:70] = 1.5
        cmp = compare_solvers(
            solver, sos, num_iterations=100, decimate=10,
            gmres_restart=40, gmres_max_restarts=10, gmres_tol=1e-6,
        )
        p = figures.fig_example(cmp, sos, str(tmp_path))
        assert os.path.exists(p) and os.path.getsize(p) > 10000

    def test_new_figure_families_render(self, tmp_path):
        """error-vs-residual, residual+l_inf overlay, histograms/boxplot
        (the produce_figures.py:77-276 families)."""
        from helmnet_tpu.eval import figures

        rng = np.random.default_rng(3)
        out = str(tmp_path)
        n, t = 12, 20
        res = np.abs(rng.standard_normal((n, t))) * \
            np.exp(-np.arange(t) / 4)[None] + 1e-6
        linf = res * (0.5 + rng.random((n, t)))
        p1 = figures.fig_error_vs_residual(res, linf, out)
        gm = np.abs(rng.standard_normal((n, 6))) * \
            np.exp(-np.arange(6))[None] + 1e-8
        p2 = figures.fig_residual_and_error_overlay(
            res, linf, gm, gm * 2.0, total_iterations=t, out_dir=out
        )
        p3 = figures.fig_error_histograms_boxplot(
            linf[:, -1], res[:, -1], linf[:, -1] * 0.1, res[:, -1] * 0.1,
            out_dir=out,
        )
        for p in (p1, p2, p3):
            assert os.path.exists(p) and os.path.getsize(p) > 1000

    def test_compare_solvers_new_traces(self):
        """compare_solvers exposes GMRES error traces + aligned residual."""
        ckpt = "/root/reference/trained_models/jcp_paper_trained_weights.ckpt"
        if not os.path.exists(ckpt):
            pytest.skip("reference checkpoint not available")
        from helmnet_tpu.eval.harness import compare_solvers
        from helmnet_tpu.solvers.iterative import IterativeSolver

        solver = IterativeSolver.from_reference_checkpoint(ckpt)
        sos = np.ones((96, 96), np.float32)
        sos[40:60, 30:70] = 1.5
        cmp = compare_solvers(
            solver, sos, num_iterations=100, decimate=10,
            gmres_restart=40, gmres_max_restarts=10, gmres_tol=1e-6,
        )
        assert cmp.gmres_linf_trace is not None
        assert cmp.gmres_linf_trace[-1] < 1e-3  # checkpoints -> converged
        assert cmp.model_residual_at_trace.shape == cmp.model_linf_trace.shape
