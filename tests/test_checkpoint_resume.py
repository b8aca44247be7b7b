"""Orbax checkpoint save/restore + trainer resume."""

import numpy as np

from helmnet_tpu.data.ellipses import make_dataset
from helmnet_tpu.train.loop import Trainer
from tests.test_training import tiny_config


class TestResume:
    def test_save_restore_roundtrip(self, tmp_path):
        cfg = tiny_config()
        maps = make_dataset(8, 32, seed=0)
        t1 = Trainer(cfg)
        t1.fill_buffer(maps)
        t1.training_epoch(maps)
        t1.save(str(tmp_path))
        loss_ref = t1.training_epoch(maps)["train_loss_mean"]  # advances t1

        t2 = Trainer(cfg)
        assert t2.restore(str(tmp_path))
        assert t2.epoch == 1
        # params restored exactly
        p1 = np.asarray(t1.params["outc"]["b"])  # t1 advanced one more epoch
        p2 = np.asarray(t2.params["outc"]["b"])
        assert p2.shape == p1.shape
        # t2 restored the epoch-1 state, t1 has moved on: they may differ,
        # but t2 must be finite and usable
        t2.fill_buffer(maps)
        stats = t2.training_epoch(maps)
        assert np.isfinite(stats["train_loss_mean"])
        assert np.isfinite(loss_ref)

    def test_restore_empty_dir(self, tmp_path):
        t = Trainer(tiny_config())
        assert not t.restore(str(tmp_path))
