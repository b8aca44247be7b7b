"""Fused Pallas DoubleConv == XLA DoubleConv (bf16 'default' precision
both sides), standalone and through the packed rollout (interpret mode on
CPU; the real kernel runs on TPU via bench.py / tools/r2_tpu_extras.py)."""

import dataclasses

import numpy as np
import pytest

from helmnet_tpu.models.blocks import double_conv, init_double_conv
from helmnet_tpu.ops.pallas_unet import fused_double_conv, fused_supported
from tests.test_training import tiny_config


class TestFusedDoubleConv:
    @pytest.mark.parametrize("cin,cout,h,w", [(10, 8, 16, 16), (6, 8, 24, 16)])
    def test_matches_xla(self, cin, cout, h, w):
        import jax

        p = init_double_conv(jax.random.PRNGKey(0), cin, cout, "prelu")
        p = jax.tree.map(lambda t: t * 50 if t.ndim == 4 else t, p)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, h, w, cin))
        ref = np.asarray(double_conv(p, x, "prelu", "default"))
        got = np.asarray(fused_double_conv(p, x, interpret=True))
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, atol=2e-2 * scale)

    def test_relu_empty_act_params(self):
        import jax

        p = init_double_conv(jax.random.PRNGKey(0), 6, 8, "relu")
        p = jax.tree.map(lambda t: t * 50 if t.ndim == 4 else t, p)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 6))
        ref = np.asarray(double_conv(p, x, "relu", "default"))
        got = np.asarray(fused_double_conv(p, x, interpret=True))
        np.testing.assert_allclose(got, ref, atol=2e-2 * np.abs(ref).max())

    def test_multi_input_concat_fusion(self):
        """conv(concat(xs)) == sum_i conv(x_i, w_rows_i): the fused-away
        concat must be invisible (packed group-major row split)."""
        import jax
        import jax.numpy as jnp

        from helmnet_tpu.models.packed import (_gconcat, _pack_w,
                                               _split_packed_rows)

        g = 4
        p = init_double_conv(jax.random.PRNGKey(0), 10, 8, "prelu")
        p = jax.tree.map(lambda t: t * 50 if t.ndim == 4 else t, p)
        packed = {
            "c1": {"w": _pack_w(p["c1"]["w"], g), "b": jnp.tile(p["c1"]["b"], g)},
            "act": p["act"],
            "c2": {"w": _pack_w(p["c2"]["w"], g), "b": jnp.tile(p["c2"]["b"], g)},
        }
        a = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 8 * g))
        bb = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 2 * g))
        cat = _gconcat(a, bb, g)
        ref = np.asarray(fused_double_conv(packed, cat, interpret=True))
        w1s = _split_packed_rows(packed["c1"]["w"], [8, 2], g)
        fp = {"c1": {"w": w1s, "b": packed["c1"]["b"]},
              "act": packed["act"], "c2": packed["c2"]}
        got = np.asarray(fused_double_conv(fp, (a, bb), interpret=True))
        np.testing.assert_allclose(got, ref, atol=2e-2 * np.abs(ref).max())

    def test_multi_tile_matches_whole_plane(self, monkeypatch):
        """Force the windowed-DMA tiling on a small plane; overlapped
        halo recomputation must be invisible in the result."""
        import jax

        from helmnet_tpu.ops import pallas_unet

        p = init_double_conv(jax.random.PRNGKey(0), 10, 8, "prelu")
        p = jax.tree.map(lambda t: t * 50 if t.ndim == 4 else t, p)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 10))
        ref = np.asarray(double_conv(p, x, "prelu", "default"))
        t, h = pallas_unet._pick_tile(32 * 32, 32, 10, 8, 8)
        assert h == 0  # whole-plane by default at this size
        monkeypatch.setattr(pallas_unet, "_VMEM_BUDGET", 500_000)
        t, h = pallas_unet._pick_tile(32 * 32, 32, 10, 8, 8)
        assert h > 0 and t < 32 * 32  # now tiled with halo windows
        try:
            got = np.asarray(fused_double_conv(p, x, interpret=True))
        finally:
            fused_double_conv.clear_cache()  # budget-dependent trace
        np.testing.assert_allclose(got, ref, atol=2e-2 * np.abs(ref).max())

    def test_supported_bounds(self):
        assert fused_supported(96, 96, 160, 128, 128)
        assert not fused_supported(1024, 1024, 160, 128, 128)

    def test_packed_rollout_pallas_mode(self):
        import jax.numpy as jnp

        from helmnet_tpu.models import packed
        from helmnet_tpu.solvers.iterative import IterativeSolver

        cfg = tiny_config()  # model precision 'default' by default
        pal = cfg.replace(
            model=dataclasses.replace(cfg.model, double_conv_mode="pallas")
        )
        solver = IterativeSolver(cfg)
        rng = np.random.default_rng(0)
        sos = np.ones((4, 32, 32), np.float32)
        sos[:, 10:20, 8:22] = 1.0 + rng.random((4, 10, 14)).astype(np.float32)
        src = jnp.broadcast_to(solver.source, (4, 32, 32, 2))
        ref = packed.rollout_packed(
            solver.params, solver.op, src, jnp.asarray(sos),
            cfg=cfg, g=2, num_iterations=4, collect=("rmse",),
        )
        got = packed.rollout_packed(
            solver.params, solver.op, src, jnp.asarray(sos),
            cfg=pal, g=2, num_iterations=4, collect=("rmse",),
        )
        r0, r1 = np.asarray(ref["rmse"]), np.asarray(got["rmse"])
        # same solve trajectory modulo bf16 tap-order differences
        np.testing.assert_allclose(r1, r0, rtol=0.05, atol=1e-8)
