"""IterativeSolver.forward robustness wrappers: source-amplitude
normalization (linearity: solve at the training amplitude, rescale back)
and best-iterate selection."""

import numpy as np

from helmnet_tpu.solvers.iterative import IterativeSolver
from tests.test_training import tiny_config


class TestForwardWrappers:
    def test_source_normalization_linearity(self):
        """An amplitude-1000 source must return exactly 100x the fields of
        the amplitude-10 solve (network sees the identical normalized
        problem; outputs rescale linearly)."""
        cfg = tiny_config()
        solver = IterativeSolver(cfg)
        sos = np.ones((1, 32, 32), np.float32)

        out_ref = solver.forward(
            sos, num_iterations=8, normalize_source=False, best_iterate=False
        )
        big = np.asarray(solver.source) * 100.0
        solver.set_source_maps(big)
        out_n = solver.forward(sos, num_iterations=8, best_iterate=False)
        np.testing.assert_allclose(
            np.asarray(out_n["wavefield"]),
            100.0 * np.asarray(out_ref["wavefield"]),
            rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out_n["rmse"]),
            100.0 * np.asarray(out_ref["rmse"]),
            rtol=1e-4,
        )

    def test_unnormalized_differs(self):
        """Without normalization the network sees a 100x out-of-distribution
        source — results are NOT the linear rescale (sanity check that the
        wrapper is doing something)."""
        cfg = tiny_config()
        solver = IterativeSolver(cfg)
        sos = np.ones((1, 32, 32), np.float32)
        out_ref = solver.forward(
            sos, num_iterations=8, normalize_source=False, best_iterate=False
        )
        solver.set_source_maps(np.asarray(solver.source) * 100.0)
        out_raw = solver.forward(
            sos, num_iterations=8, normalize_source=False, best_iterate=False
        )
        assert not np.allclose(
            np.asarray(out_raw["wavefield"]),
            100.0 * np.asarray(out_ref["wavefield"]),
            rtol=1e-3,
        )

    def test_best_iterate_default(self):
        """out['wavefield'] is the minimum-residual iterate; the raw final
        is under 'final_wavefield'; best_rmse <= every trajectory rmse."""
        cfg = tiny_config()
        solver = IterativeSolver(cfg)
        sos = np.ones((1, 32, 32), np.float32)
        out = solver.forward(sos, num_iterations=10)
        assert "final_wavefield" in out
        rmse = np.asarray(out["rmse"])  # [iters, B]
        best = np.asarray(out["best_rmse"])
        assert best[0] <= rmse.min() + 1e-7
        # with a random-init net the trajectory is not monotone: the best
        # iterate generally differs from the final one
        assert out["wavefield"].shape == out["final_wavefield"].shape


class TestChunkedForward:
    def test_chunked_equals_monolithic(self):
        """forward(chunk_iterations=k) == forward(): warm-started chunks
        are the same op sequence (residual is a pure function of the
        wavefield), so rmse trace / best iterate / finals match exactly."""
        import jax.numpy as jnp
        import numpy as np

        from helmnet_tpu.solvers.iterative import IterativeSolver
        from tests.test_training import tiny_config

        solver = IterativeSolver(tiny_config())
        rng = np.random.default_rng(3)
        sos = np.ones((2, 32, 32), np.float32)
        sos[:, 8:20, 6:26] = 1.0 + rng.random((2, 12, 20)).astype(np.float32)
        ref = solver.forward(sos, num_iterations=12, decimate=2)
        got = solver.forward(sos, num_iterations=12, decimate=2,
                             chunk_iterations=4)
        np.testing.assert_array_equal(np.asarray(got["rmse"]),
                                      np.asarray(ref["rmse"]))
        np.testing.assert_array_equal(np.asarray(got["wavefield"]),
                                      np.asarray(ref["wavefield"]))
        np.testing.assert_array_equal(np.asarray(got["best_rmse"]),
                                      np.asarray(ref["best_rmse"]))

    def test_best_iterate_survives_nan_divergence(self):
        """A diverging rollout (NaN tail) must not poison the best-so-far
        tracking — jnp.minimum(nan, x) would."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from helmnet_tpu.solvers.iterative import IterativeSolver
        from tests.test_training import tiny_config

        solver = IterativeSolver(tiny_config())
        # blow up the weights so the rollout diverges to NaN
        solver.params = jax.tree.map(
            lambda t: t * 100 if t.ndim == 4 else t, solver.params
        )
        sos = np.ones((1, 32, 32), np.float32)
        out = solver.forward(sos, num_iterations=40)
        rmse = np.asarray(out["rmse"])[:, 0]
        assert not np.isfinite(rmse[-1])  # it really diverged
        best = float(np.asarray(out["best_rmse"])[0])
        assert np.isfinite(best)
        assert np.isfinite(np.asarray(out["wavefield"])).all()
