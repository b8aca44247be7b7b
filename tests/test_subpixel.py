"""Sub-pixel transposed conv == input-dilated transposed conv, exactly.

The decomposition (models/blocks.conv_transpose2d_subpixel) re-groups the
same contractions by output phase: 4 k/2-tap convs at input resolution in
place of one k-tap conv over a 3/4-zero dilated input — 4x fewer MXU
K-tile passes (torch ConvTranspose2d semantics, architectures.py:373-385).
"""

import numpy as np
import pytest

from helmnet_tpu.models import hybridnet
from helmnet_tpu.models.blocks import (
    conv_transpose2d,
    conv_transpose2d_subpixel,
    init_conv_transpose,
)
from tests.test_training import tiny_config


class TestSubpixelConvTranspose:
    @pytest.mark.parametrize("cin,cout,h,w", [(8, 8, 12, 12), (8, 8, 24, 48),
                                              (16, 4, 16, 16)])
    def test_matches_dilated(self, cin, cout, h, w):
        import jax
        import jax.numpy as jnp

        p = init_conv_transpose(jax.random.PRNGKey(0), 8, cin, cout)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, h, w, cin))
        y0 = conv_transpose2d(p, x, stride=2, padding=3, precision="highest")
        y1 = conv_transpose2d_subpixel(p, x, stride=2, padding=3,
                                       precision="highest")
        assert y0.shape == y1.shape == (2, 2 * h, 2 * w, cout)
        np.testing.assert_allclose(
            np.asarray(y1), np.asarray(y0), rtol=2e-5, atol=1e-6
        )

    def test_full_network_equal(self):
        import jax
        import jax.numpy as jnp

        cfg0 = tiny_config().model.__class__(precision="highest")
        cfg1 = cfg0.__class__(precision="highest", up_mode="subpixel")
        params = hybridnet.init_params(jax.random.PRNGKey(2), cfg0)
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 6))
        states = hybridnet.init_states(2, 32, cfg0)
        y0, s0 = hybridnet.apply(params, x, states, cfg=cfg0)
        y1, s1 = hybridnet.apply(params, x, states, cfg=cfg1)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=2e-5, atol=1e-6)
        for a, b in zip(s1, s0):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_packed_subpixel_rollout(self):
        import dataclasses

        import jax.numpy as jnp

        from helmnet_tpu.models import packed
        from helmnet_tpu.solvers.iterative import IterativeSolver, rollout

        base = tiny_config()
        cfg = base.replace(
            model=dataclasses.replace(base.model, precision="highest")
        )
        sp = cfg.replace(
            model=dataclasses.replace(cfg.model, up_mode="subpixel")
        )
        solver = IterativeSolver(cfg)
        rng = np.random.default_rng(0)
        sos = np.ones((4, 32, 32), np.float32)
        sos[:, 10:20, 8:22] = 1.0 + rng.random((4, 10, 14)).astype(np.float32)
        src = jnp.broadcast_to(solver.source, (4, 32, 32, 2))
        ref = rollout(
            solver.params, solver.op, src, jnp.asarray(sos),
            cfg=solver.cfg, num_iterations=5, collect=("rmse",),
        )
        got = packed.rollout_packed(
            solver.params, solver.op, src, jnp.asarray(sos),
            cfg=sp, g=2, num_iterations=5, collect=("rmse",),
        )
        np.testing.assert_allclose(
            np.asarray(got["rmse"]), np.asarray(ref["rmse"]),
            rtol=1e-4, atol=1e-7,
        )
