"""Model-zoo completeness: ResNet variant, ConvGRU cell, architecture
registry, variable-source rollout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helmnet_tpu.core.config import Config, GeometryConfig, ModelConfig, SourceConfig
from helmnet_tpu.models import convgru, resnet
from helmnet_tpu.models.registry import get_architecture
from helmnet_tpu.ops.source import point_source_map
from helmnet_tpu.ops.spectral import make_operator
from helmnet_tpu.solvers.iterative import rollout, rollout_variable_source


def resnet_config():
    return Config(
        geometry=GeometryConfig(domain_size=32, pml_size=4),
        model=ModelConfig(architecture="resnet", depth=3, features=8),
        source=SourceConfig(location=(26, 16)),
    )


class TestResNet:
    def test_forward_shapes_and_state(self):
        cfg = resnet_config().model
        params = resnet.init_params(jax.random.PRNGKey(0), cfg)
        x = jnp.zeros((2, 32, 32, 6))
        states = resnet.init_states(2, 32, cfg)
        out, new_states = resnet.apply(params, x, states, cfg=cfg)
        assert out.shape == (2, 32, 32, 2)
        assert new_states[0].shape == (2, 32, 32, 2)
        flat = resnet.flatten_states(new_states)
        assert flat.shape == (2, 2, 32 * 32)
        rt = resnet.unflatten_states(flat, 32, cfg)
        np.testing.assert_array_equal(np.asarray(rt[0]), np.asarray(new_states[0]))

    def test_resnet_rollout_via_registry(self):
        cfg = resnet_config()
        arch = get_architecture("resnet")
        params = arch.init_params(jax.random.PRNGKey(0), cfg.model)
        op = make_operator(32, 32, 4, 2.0, 1.0)
        src = jnp.asarray(point_source_map(32, 32, (26, 16), 10.0))[None]
        sos = jnp.ones((1, 32, 32))
        out = rollout(params, op, src, sos, cfg=cfg, num_iterations=5)
        assert np.isfinite(np.asarray(out["rmse"])).all()

    def test_unknown_architecture(self):
        with pytest.raises(NotImplementedError):
            get_architecture("transformer")


class TestConvGRU:
    def test_gru_step_properties(self):
        params = convgru.init_convgru(jax.random.PRNGKey(0), 8, 2)
        x = jnp.zeros((2, 16, 16, 8))
        h = jnp.asarray(np.random.randn(2, 16, 16, 2).astype(np.float32))
        h2 = convgru.convgru(params, x, h)
        assert h2.shape == h.shape
        # gating: new state is a convex-ish blend, bounded by tanh range
        assert np.all(np.abs(np.asarray(h2)) <= np.maximum(np.abs(np.asarray(h)), 1.0) + 1e-5)


class TestVariableSource:
    def test_source_switch(self):
        cfg = Config(
            geometry=GeometryConfig(domain_size=32, pml_size=4),
            source=SourceConfig(location=(26, 16)),
        )
        arch = get_architecture("custom_unet")
        params = arch.init_params(jax.random.PRNGKey(0), cfg.model)
        op = make_operator(32, 32, 4, 2.0, 1.0)
        s1 = point_source_map(32, 32, (26, 16), 10.0)[None]
        s2 = point_source_map(32, 32, (8, 20), 10.0)[None]
        sources = jnp.asarray(np.stack([s1, s2]))  # [2, 1, 32, 32, 2]
        sos = jnp.ones((1, 32, 32))
        out = rollout_variable_source(
            params, op, sources, jnp.array([0, 4]), sos,
            cfg=cfg, num_iterations=8,
        )
        r = np.asarray(out["rmse"])[:, 0]
        assert np.isfinite(r).all()
        # at the switch the residual should jump (different source)
        assert abs(r[4] - r[3]) > 1e-6


class TestResNetTraining:
    def test_resnet_trains_end_to_end(self):
        """The alternate architecture runs through the full training loop."""
        from helmnet_tpu.data.ellipses import make_dataset
        from helmnet_tpu.train.loop import Trainer

        cfg = resnet_config()
        cfg = cfg.replace(
            training=cfg.training.__class__(
                buffer_size=8, train_batch_size=4, unrolling_steps=2,
                learning_rate=1e-3,
            )
        )
        maps = make_dataset(8, 32, seed=0)
        tr = Trainer(cfg)
        tr.fill_buffer(maps)
        stats = tr.training_epoch(maps)
        assert np.isfinite(stats["train_loss_mean"])


class TestInputValidation:
    def test_bad_domain_size_rejected(self):
        from helmnet_tpu.core.config import Config
        from helmnet_tpu.solvers.iterative import IterativeSolver

        solver = IterativeSolver(Config())
        with pytest.raises(ValueError, match="divisible"):
            solver.set_domain_size(100)


class TestRectangularDomains:
    def test_rectangular_rollout(self):
        """Non-square grids through the full solver (beyond the
        square-only reference; code-review finding)."""
        from helmnet_tpu.core.config import Config
        from helmnet_tpu.solvers.iterative import IterativeSolver

        solver = IterativeSolver(Config())
        solver.set_domain_size((32, 64), source_location=(24, 40))
        sos = np.ones((32, 64), np.float32)
        out = solver.forward(sos, num_iterations=4)
        assert out["wavefield"].shape == (1, 32, 64, 2)
        assert np.isfinite(np.asarray(out["rmse"])).all()

    def test_source_out_of_bounds(self):
        from helmnet_tpu.ops.source import point_source_map

        with pytest.raises(ValueError, match="outside"):
            point_source_map(32, 32, (82, 48), 10.0)

    def test_pml_zero_and_overlap(self):
        from helmnet_tpu.ops.pml import sigma_profile

        assert np.all(sigma_profile(32, 0, 2.0) == 0.0)
        with pytest.raises(ValueError, match="overlap"):
            sigma_profile(8, 5, 2.0)
