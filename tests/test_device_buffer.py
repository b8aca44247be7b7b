"""Device-resident replay training == host-side path semantics."""

import numpy as np
import pytest

from helmnet_tpu.data.ellipses import make_dataset
from helmnet_tpu.train.loop import Trainer
from tests.test_training import tiny_config


def test_point_source_kernels_identity():
    """Separable-kernel stamp == point_source_map for arbitrary locations,
    smoothed and raw (the identity the sparse source pool rests on)."""
    import jax.numpy as jnp

    from helmnet_tpu.ops.source import (
        point_source_kernels,
        point_source_map,
        point_sources_on_device,
    )

    for smooth in (True, False):
        ky, kx = point_source_kernels(40, 56, smooth)
        locs = jnp.asarray([[0, 0], [17, 33], [39, 55]], jnp.int32)
        got = np.asarray(
            point_sources_on_device(ky, kx, locs, 10.0, 0.25, 2.0, 0.0)
        )
        for i, loc in enumerate([(0, 0), (17, 33), (39, 55)]):
            ref = point_source_map(40, 56, loc, 10.0, 0.25, 2.0, 0.0, smooth)
            assert np.allclose(got[i], ref, atol=3e-6 * np.abs(ref).max())


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

    def test_sparse_source_pool_matches_dense(self):
        """sparse_source_pool=True (locations + separable on-device stamp)
        seeds the same buffer sources and trains to the same first-step
        loss as the dense [K, H, W, 2] pool (the 1024^2 HBM fix)."""
        import dataclasses

        import jax.numpy as jnp

        def trainer(sparse):
            cfg = tiny_config()
            cfg = cfg.replace(
                training=dataclasses.replace(
                    cfg.training, p_random_source=1.0,
                    sparse_source_pool=sparse,
                )
            )
            tr = Trainer(cfg, device_buffer=True)
            tr.fill_buffer(make_dataset(8, 32, seed=0))
            return tr

        ts, td = trainer(True), trainer(False)
        assert ts.src_pool.ndim == 2 and ts.src_pool.shape[1] == 2
        assert ts.src_pool.shape[0] == td.src_pool.shape[0]
        src_s = np.asarray(ts._dev_buf["source"])
        src_d = np.asarray(td._dev_buf["source"])
        amp = np.abs(src_d).max()
        assert np.allclose(src_s, src_d, atol=3e-6 * amp)
        args = (
            jnp.arange(4, dtype=jnp.int32), jnp.zeros(4, jnp.int32),
            jnp.zeros(4, jnp.int32), jnp.asarray(1), jnp.asarray(50),
        )
        _, _, _, ms = ts._mega_step(
            ts.params, ts.opt_state, ts._dev_buf, ts.op, ts.src_pool,
            ts._sos_pool, *args,
        )
        _, _, _, md = td._mega_step(
            td.params, td.opt_state, td._dev_buf, td.op, td.src_pool,
            td._sos_pool, *args,
        )
        assert float(ms["loss"]) == pytest.approx(float(md["loss"]), rel=1e-4)

    def test_sparse_pool_rejects_extended_sources(self):
        import dataclasses

        cfg = tiny_config()
        cfg = cfg.replace(
            training=dataclasses.replace(
                cfg.training, p_extended_source=0.5, sparse_source_pool=True
            )
        )
        with pytest.raises(ValueError, match="dense pool"):
            Trainer(cfg, device_buffer=True)

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
