"""Channel-packed (block-diagonal) network == standard network, exactly.

The packing changes MXU shapes, not math: off-diagonal weight blocks are
exact zeros, so per-problem results must match the unpacked rollout."""

import numpy as np
import pytest

from helmnet_tpu.models import packed
from helmnet_tpu.solvers.iterative import IterativeSolver, rollout
from tests.test_training import tiny_config


class TestPackedModel:
    def test_pack_unpack_roundtrip(self):
        import jax.numpy as jnp

        x = np.random.default_rng(0).standard_normal((8, 16, 16, 6)).astype(
            np.float32
        )
        y = packed.unpack_batch(packed.pack_batch(jnp.asarray(x), 4), 4)
        np.testing.assert_array_equal(np.asarray(y), x)

    def test_block_diagonal_weights(self):
        import jax.numpy as jnp

        w = np.random.default_rng(1).standard_normal((3, 3, 2, 5)).astype(
            np.float32
        )
        pw = np.asarray(packed._pack_w(jnp.asarray(w), 3))
        assert pw.shape == (3, 3, 6, 15)
        for g in range(3):
            np.testing.assert_array_equal(
                pw[:, :, 2 * g : 2 * g + 2, 5 * g : 5 * g + 5], w
            )
        # off-diagonal blocks are exactly zero
        np.testing.assert_array_equal(pw[:, :, 0:2, 5:10], 0.0)

    def test_rollout_pallas_dconv_matches_xla(self):
        """Packed rollout with the fused-Pallas DoubleConv (interpret mode
        on CPU) == packed rollout with XLA convs, bf16 policy."""
        import dataclasses

        import jax.numpy as jnp

        cfg = tiny_config()
        solver = IterativeSolver(cfg)
        rng = np.random.default_rng(0)
        sos = np.ones((4, 32, 32), np.float32)
        sos[:, 10:20, 8:22] = 1.0 + rng.random((4, 10, 14)).astype(np.float32)
        src = jnp.broadcast_to(solver.source, (4, 32, 32, 2))
        ref = packed.rollout_packed(
            solver.params, solver.op, src, jnp.asarray(sos),
            cfg=solver.cfg, g=2, num_iterations=3,
        )
        pcfg = solver.cfg.replace(model=dataclasses.replace(
            solver.cfg.model, double_conv_mode="pallas"))
        got = packed.rollout_packed(
            solver.params, solver.op, src, jnp.asarray(sos),
            cfg=pcfg, g=2, num_iterations=3,
        )
        np.testing.assert_allclose(
            np.asarray(got["rmse"]), np.asarray(ref["rmse"]), rtol=2e-3,
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(got["wavefield"]), np.asarray(ref["wavefield"]),
            rtol=1e-2, atol=5e-5,
        )

    @pytest.mark.parametrize("g", [2, 4])
    def test_rollout_matches_unpacked(self, g):
        cfg = tiny_config().replace(
            model=tiny_config().model.__class__(precision="highest")
        )
        solver = IterativeSolver(cfg)
        rng = np.random.default_rng(0)
        sos = np.ones((8, 32, 32), np.float32)
        sos[:, 10:20, 8:22] = 1.0 + rng.random((8, 10, 14)).astype(np.float32)
        import jax.numpy as jnp

        src = jnp.broadcast_to(solver.source, (8, 32, 32, 2))
        ref = rollout(
            solver.params, solver.op, src, jnp.asarray(sos),
            cfg=solver.cfg, num_iterations=6, collect=("rmse", "best"),
        )
        got = packed.rollout_packed(
            solver.params, solver.op, src, jnp.asarray(sos),
            cfg=solver.cfg, g=g, num_iterations=6, collect=("rmse", "best"),
        )
        np.testing.assert_allclose(
            np.asarray(got["rmse"]), np.asarray(ref["rmse"]), rtol=1e-5,
            atol=1e-7,
        )
        np.testing.assert_allclose(
            np.asarray(got["wavefield"]), np.asarray(ref["wavefield"]),
            rtol=1e-4, atol=1e-6,
        )
