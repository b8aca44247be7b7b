"""Device-resident replay training == host-side path semantics."""

import numpy as np
import pytest

from helmnet_tpu.data.ellipses import make_dataset
from helmnet_tpu.train.loop import Trainer
from tests.test_training import tiny_config


class TestDeviceBuffer:
    def test_device_epoch_trains(self):
        cfg = tiny_config()
        maps = make_dataset(8, 32, seed=0)
        tr = Trainer(cfg, device_buffer=True)
        tr.fill_buffer(maps)
        hist = [tr.training_epoch(maps) for _ in range(6)]
        losses = [h["train_loss_mean"] for h in hist]
        assert np.isfinite(losses).all()
        assert min(losses[1:]) < losses[0] * 1.01
        # buffer ages evolved on device
        ages = np.asarray(tr._dev_buf["iteration"])
        assert ages.max() >= 1

    def test_matches_host_buffer_first_step(self):
        """Identical RNG draw -> identical loss between paths."""
        import jax.numpy as jnp

        from helmnet_tpu.train.replay import ExperienceBatch

        cfg = tiny_config()
        maps = make_dataset(8, 32, seed=0)
        th = Trainer(cfg)
        th.fill_buffer(maps)
        td = Trainer(cfg, device_buffer=True)
        td.fill_buffer(maps)

        rng = np.random.default_rng(7)
        idx = rng.choice(cfg.training.buffer_size, 4, replace=False)
        batch = ExperienceBatch(
            wavefield=jnp.asarray(th.buffer.wavefield[idx]),
            states=jnp.asarray(th.buffer.states[idx]),
            k_sq=jnp.asarray(th.buffer.k_sq[idx]),
            residual=jnp.asarray(th.buffer.residual[idx]),
            source=jnp.asarray(th.buffer.source[idx]),
            iteration=jnp.asarray(th.buffer.iteration[idx]),
            indices=jnp.asarray(idx),
        )
        _, _, mh, _ = th._train_step(th.params, th.opt_state, th.op, batch, 1)
        _, _, _, md = td._mega_step(
            td.params, td.opt_state, td._dev_buf, td.op, td.src_pool,
            td._sos_pool, jnp.asarray(idx, jnp.int32),
            jnp.zeros(4, jnp.int32), jnp.zeros(4, jnp.int32),
            jnp.asarray(1), jnp.asarray(50),
        )
        assert float(mh["loss"]) == pytest.approx(float(md["loss"]), rel=1e-5)

    def test_random_source_pool(self):
        """p_random_source > 0: restarted slots draw circle sources from the
        pool; buffer write-back stores the fresh source for restarted slots."""
        import dataclasses

        import jax.numpy as jnp

        cfg = tiny_config()
        cfg = cfg.replace(
            training=dataclasses.replace(cfg.training, p_random_source=1.0)
        )
        maps = make_dataset(8, 32, seed=0)
        tr = Trainer(cfg, device_buffer=True)
        tr.fill_buffer(maps)
        assert tr.src_pool.shape[0] > 10  # distinct circle locations
        # with p=1, slot sources differ from the fixed training source
        fixed = np.asarray(tr.source_map)
        srcs = np.asarray(tr._dev_buf["source"])
        diffs = np.abs(srcs - fixed[None]).max(axis=(1, 2, 3))
        assert (diffs > 0).any()
        # sources are valid point maps (single nonzero pixel, amplitude 10)
        assert np.isclose(np.abs(srcs).max(), 10.0)
        for _ in range(3):
            stats = tr.training_epoch(maps)
        assert np.isfinite(stats["train_loss_mean"])
