"""3D learned-solver stack: HybridNet3D blocks, transposed-conv lowering
equivalence, rollout/chunking determinism (capability extension — the
reference ucl-bug/helmnet is 2D-only)."""

import jax
import jax.numpy as jnp
import numpy as np

from helmnet_tpu.core.config import Config, GeometryConfig, ModelConfig
from helmnet_tpu.models import hybridnet3d
from helmnet_tpu.models.blocks3d import (
    conv_transpose3d,
    conv_transpose3d_subpixel,
    init_conv_transpose3d,
)
from helmnet_tpu.solvers.iterative3d import (
    IterativeSolver3D,
    residual_rmse3d,
    rollout3d,
)


def cfg3d(domain=16, depth=2, up_mode="dilated"):
    return Config(
        geometry=GeometryConfig(domain_size=domain, pml_size=3),
        model=ModelConfig(
            depth=depth,
            state_depth=depth,
            features=4,
            in_channels=7,
            precision="highest",
            up_mode=up_mode,
        ),
    )


class TestBlocks3D:
    def test_subpixel_matches_dilated_transpose(self):
        """The 8-phase sub-pixel lowering is the same linear map as the
        input-dilated ConvTranspose3d(k=4, s=2, p=1)."""
        key = jax.random.PRNGKey(3)
        params = init_conv_transpose3d(key, 4, 3, 5)
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 6, 4, 8, 3))
        ref = conv_transpose3d(params, x, stride=2, padding=1)
        sub = conv_transpose3d_subpixel(params, x, stride=2, padding=1)
        assert ref.shape == (2, 12, 8, 16, 5)
        np.testing.assert_allclose(
            np.asarray(sub), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


class TestHybridNet3D:
    def test_forward_shapes_states_and_flatten_roundtrip(self):
        cfg = cfg3d().model
        params = hybridnet3d.init_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 16, 7))
        states = hybridnet3d.init_states(2, 16, cfg)
        out, new_states = hybridnet3d.apply(params, x, states, cfg=cfg)
        assert out.shape == (2, 16, 16, 16, 2)
        assert [s.shape for s in new_states] == [
            (2, 16, 16, 16, 2),
            (2, 8, 8, 8, 2),
        ]
        flat = hybridnet3d.flatten_states(new_states)
        assert flat.shape == (2, 2, 16**3 + 8**3)
        rt = hybridnet3d.unflatten_states(flat, 16, cfg)
        for a, b in zip(rt, new_states):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_up_modes_agree(self):
        """Same params, dilated vs subpixel decoder: identical output."""
        cfg_d = cfg3d().model
        cfg_s = cfg3d(up_mode="subpixel").model
        params = hybridnet3d.init_params(jax.random.PRNGKey(0), cfg_d)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 16, 7))
        states = hybridnet3d.init_states(1, 16, cfg_d)
        out_d, _ = hybridnet3d.apply(params, x, states, cfg=cfg_d)
        out_s, _ = hybridnet3d.apply(params, x, states, cfg=cfg_s)
        np.testing.assert_allclose(
            np.asarray(out_s), np.asarray(out_d), rtol=1e-5, atol=1e-6
        )


class TestIterativeSolver3D:
    def test_rollout_executes_and_zero_field_residual_is_source(self):
        solver = IterativeSolver3D(cfg3d())
        sos = jnp.ones((1, 16, 16, 16))
        k_sq, wf = solver.get_initials(sos)
        r0 = solver.get_residual(wf, k_sq)
        np.testing.assert_allclose(
            np.asarray(r0), -np.asarray(solver.source), atol=1e-6
        )
        out = solver.forward(sos, num_iterations=4)
        assert out["wavefield"].shape == (1, 16, 16, 16, 2)
        assert out["rmse"].shape == (4, 1)
        assert np.all(np.isfinite(np.asarray(out["rmse"])))

    def test_chunked_matches_unchunked(self):
        """Host-level warm-restart chunking is exact (same trajectory)."""
        solver = IterativeSolver3D(cfg3d())
        sos = 1.0 + 0.3 * jax.random.uniform(jax.random.PRNGKey(7), (1, 16, 16, 16))
        full = solver.forward(sos, num_iterations=6, best_iterate=False)
        chunked = solver.forward(
            sos, num_iterations=6, chunk_iterations=2, best_iterate=False
        )
        np.testing.assert_allclose(
            np.asarray(chunked["rmse"]), np.asarray(full["rmse"]),
            rtol=1e-5, atol=1e-7,
        )
        np.testing.assert_allclose(
            np.asarray(chunked["wavefield"]), np.asarray(full["wavefield"]),
            rtol=1e-4, atol=1e-6,
        )

    def test_best_iterate_tracks_minimum(self):
        solver = IterativeSolver3D(cfg3d())
        sos = jnp.ones((2, 16, 16, 16))
        out = rollout3d(
            solver.params, solver.op,
            jnp.broadcast_to(solver.source, (2,) + solver.source.shape[1:]),
            sos, cfg=solver.cfg, num_iterations=5, collect=("rmse", "best"),
        )
        np.testing.assert_allclose(
            np.asarray(out["best_rmse"]),
            np.asarray(out["rmse"]).min(axis=0),
            rtol=1e-6,
        )
