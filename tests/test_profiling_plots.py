"""Profiling utilities + plot helpers."""

import os

import jax.numpy as jnp
import numpy as np

from helmnet_tpu.core.profiling import Roofline, Timer, solver_roofline
from helmnet_tpu.eval import plots


class TestProfiling:
    def test_timer_blocks_on_device_work(self):
        import jax

        f = jax.jit(lambda x: x * 2 + 1)
        x = jnp.ones((64, 64))
        with Timer() as t:
            y = f(x)
            t.block(y)
        assert t.seconds > 0
        assert float(y[0, 0]) == 3.0

    def test_roofline_counts(self):
        r = solver_roofline(32, 96, 96)
        assert isinstance(r, Roofline)
        assert r.gridpoints == 32 * 96 * 96
        assert r.flops_per_iteration > 1e8
        # gridpoints/s accounting
        assert r.gridpoints_per_s(0.001) == 32 * 96 * 96 / 0.001


class TestPlots:
    def test_to_real_layouts(self):
        pair = np.zeros((8, 8, 2))
        pair[..., 0] = 3
        assert np.all(plots.to_real(pair) == 3)
        torch_layout = np.zeros((2, 8, 8))
        torch_layout[0] = 5
        assert np.all(plots.to_real(torch_layout) == 5)
        assert np.all(plots.to_real(np.full((8, 8), 7 + 2j)) == 7)

    def test_show_and_save(self, tmp_path):
        ax = plots.show_wavefield(np.random.randn(16, 16, 2), title="t")
        ax2 = plots.show_magnitude_db(np.random.randn(16, 16, 2))
        ax3 = plots.plot_residual_traces({"a": np.abs(np.random.randn(10)) + 1e-3})
        out = os.path.join(tmp_path, "fig.png")
        plots.rasterize_and_save(out, fig=ax.figure)
        assert os.path.getsize(out) > 500
        plt = plots._plt()
        plt.close("all")
