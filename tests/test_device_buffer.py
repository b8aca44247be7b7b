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
            td.params, td.opt_state, td._dev_buf, td.op, td.source_map,
            td._sos_pool, jnp.asarray(idx, jnp.int32),
            jnp.zeros(4, jnp.int32), jnp.asarray(1), jnp.asarray(50),
        )
        assert float(mh["loss"]) == pytest.approx(float(md["loss"]), rel=1e-5)
