"""Pixel-packed fused DoubleConv == XLA DoubleConv (bf16 'default'
precision both sides), interpret mode on CPU; the real kernel runs on TPU
via bench.py / tools/r2_tpu_extras.py."""

import numpy as np
import pytest

from helmnet_tpu.models.blocks import conv2d, double_conv, init_double_conv
from helmnet_tpu.ops.pallas_pixconv import fused_double_conv_pix, pix_supported


def _params(key, cin, cout, act="prelu", scale=50):
    import jax

    p = init_double_conv(key, cin, cout, act)
    return jax.tree.map(lambda t: t * scale if t.ndim == 4 else t, p)


class TestPixConv:
    @pytest.mark.parametrize(
        "cin,cout,h,w",
        [
            (6, 8, 16, 16),    # inc shape, one packed row per image row
            (10, 8, 32, 32),   # enc signal shape, wpr=2
            (16, 8, 24, 48),   # decoder concat shape, wpr=3, H != W
            (8, 2, 16, 32),    # narrow output
        ],
    )
    def test_matches_xla(self, cin, cout, h, w):
        import jax

        p = _params(jax.random.PRNGKey(0), cin, cout)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, h, w, cin))
        ref = np.asarray(double_conv(p, x, "prelu", "default"))
        got = np.asarray(fused_double_conv_pix(p, x, interpret=True))
        np.testing.assert_allclose(got, ref, atol=2e-2 * np.abs(ref).max())

    def test_relu_empty_act_params(self):
        import jax

        p = _params(jax.random.PRNGKey(0), 6, 8, "relu")
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 6))
        ref = np.asarray(double_conv(p, x, "relu", "default"))
        got = np.asarray(fused_double_conv_pix(p, x, interpret=True))
        np.testing.assert_allclose(got, ref, atol=2e-2 * np.abs(ref).max())

    def test_multi_input_parts(self):
        import jax
        import jax.numpy as jnp

        p = _params(jax.random.PRNGKey(0), 10, 8)
        a = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 8))
        bb = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 2))
        cat = jnp.concatenate([a, bb], axis=-1)
        ref = np.asarray(double_conv(p, cat, "prelu", "default"))
        w1s = (p["c1"]["w"][:, :, :8], p["c1"]["w"][:, :, 8:])
        fp = {"c1": {"w": w1s, "b": p["c1"]["b"]}, "act": p["act"],
              "c2": p["c2"]}
        got = np.asarray(fused_double_conv_pix(fp, (a, bb), interpret=True))
        np.testing.assert_allclose(got, ref, atol=2e-2 * np.abs(ref).max())

    def test_post_1x1_head(self):
        import jax

        p = _params(jax.random.PRNGKey(0), 16, 8)
        w3 = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 8, 2)) * 0.5
        b3 = jax.random.normal(jax.random.PRNGKey(4), (2,)) * 0.1
        p_post = dict(p, post={"w": w3, "b": b3})
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 16))
        mid = double_conv(p, x, "prelu", "default")
        ref = np.asarray(conv2d({"w": w3, "b": b3}, mid, precision="default"))
        got = np.asarray(fused_double_conv_pix(p_post, x, interpret=True))
        np.testing.assert_allclose(got, ref, atol=2e-2 * np.abs(ref).max())

    def test_multi_tile_matches_whole_plane(self, monkeypatch):
        import jax

        from helmnet_tpu.ops import pallas_pixconv

        p = _params(jax.random.PRNGKey(0), 10, 8)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 10))
        ref = np.asarray(double_conv(p, x, "prelu", "default"))
        t, h = pallas_pixconv._pick_tile(64 * 64 // 16, 4, 16, 8, 8)
        assert h == 0  # whole-plane by default at this size
        monkeypatch.setattr(pallas_pixconv, "_VMEM_BUDGET", 2_000_000)
        t, h = pallas_pixconv._pick_tile(64 * 64 // 16, 4, 16, 8, 8)
        assert h > 0 and t < 64 * 64 // 16  # tiled with halo windows
        try:
            got = np.asarray(fused_double_conv_pix(p, x, interpret=True))
        finally:
            fused_double_conv_pix.clear_cache()  # budget-dependent trace
        np.testing.assert_allclose(got, ref, atol=2e-2 * np.abs(ref).max())

    def test_supported_bounds(self):
        assert pix_supported(96, 96, (2, 2, 2), 8, 8)
        assert pix_supported(96, 96, 16, 8, 8, c_emit=2)
        assert not pix_supported(96, 96, 24, 8, 8)   # edge block overflow
        assert not pix_supported(96, 24, 6, 8, 8)    # width % 16
        assert not pix_supported(12, 12, 6, 8, 8)    # too small

    def test_rollout_pix_mode_matches_xla(self):
        """Unpacked rollout with double_conv_mode='pallas' (pixel-packed
        kernels in interpret mode, XLA fallback at sub-16 widths) follows
        the XLA-mode solve trajectory."""
        import dataclasses

        import jax.numpy as jnp

        from helmnet_tpu.solvers.iterative import IterativeSolver, rollout
        from tests.test_training import tiny_config

        cfg = tiny_config()  # model precision 'default' by default
        pal = cfg.replace(
            model=dataclasses.replace(cfg.model, double_conv_mode="pallas")
        )
        solver = IterativeSolver(cfg)
        rng = np.random.default_rng(0)
        sos = np.ones((2, 32, 32), np.float32)
        sos[:, 10:20, 8:22] = 1.0 + rng.random((2, 10, 14)).astype(np.float32)
        src = jnp.broadcast_to(solver.source, (2, 32, 32, 2))
        ref = rollout(solver.params, solver.op, src, jnp.asarray(sos),
                      cfg=cfg, num_iterations=4, collect=("rmse",))
        got = rollout(solver.params, solver.op, src, jnp.asarray(sos),
                      cfg=pal, num_iterations=4, collect=("rmse",))
        np.testing.assert_allclose(
            np.asarray(got["rmse"]), np.asarray(ref["rmse"]),
            rtol=0.05, atol=1e-8)
