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

    def test_topk_checkpointing(self, tmp_path):
        """ModelCheckpoint(top_k=2, save_last) semantics: keep the 2 best
        val_loss steps + the latest; prune others; restore(best=True) picks
        the lowest val_loss; scheduler LR state persists in the manifest."""
        import os

        from helmnet_tpu.train.checkpoint import best_step, latest_step

        cfg = tiny_config()
        t = Trainer(cfg)
        directory = str(tmp_path)
        # epochs 1..5 with val losses: best at epoch 3 (0.1), then 2 (0.2)
        for epoch, vl in [(1, 0.5), (2, 0.2), (3, 0.1), (4, 0.9), (5, 0.8)]:
            t.epoch = epoch
            t.scheduler.lr = 1e-3 / epoch
            t.save_topk(directory, vl, k=2)
        kept = sorted(
            int(d.split("_")[1])
            for d in os.listdir(directory)
            if d.startswith("step_")
        )
        assert kept == [2, 3, 5]  # top-2 {3, 2} + last {5}
        assert best_step(directory) == 3
        assert latest_step(directory) == 5

        t2 = Trainer(cfg)
        assert t2.restore(directory, best=True)
        assert t2.epoch == 3
        assert t2.scheduler.lr == 1e-3 / 3  # scheduler state restored

    def test_fit_topk_prunes(self, tmp_path):
        """fit() with val_every + top_k leaves <= k+1 checkpoint dirs."""
        import os

        cfg = tiny_config()
        maps = make_dataset(6, 32, seed=0)
        t = Trainer(cfg, device_buffer=True)
        t.fit(
            maps, val_maps=maps[:2], num_epochs=5, val_every=1,
            val_iterations=5, ckpt_dir=str(tmp_path), top_k=2,
        )
        kept = [d for d in os.listdir(tmp_path) if d.startswith("step_")]
        assert 1 <= len(kept) <= 3


class TestOrbaxSolverLoading:
    def test_from_orbax_checkpoint_best_step(self):
        """The committed round-2 trained checkpoint loads through the
        manifest's best-val step and solves (framework-trained weights
        are first-class in every eval path, next to reference imports)."""
        import os

        import numpy as np

        from helmnet_tpu.solvers.iterative import IterativeSolver

        root = os.path.join(os.path.dirname(__file__), "..")
        ckpt_dir = os.path.join(root, "checkpoints", "tpu_r2a")
        if not os.path.isdir(ckpt_dir):
            import pytest

            pytest.skip("trained checkpoint not present")
        solver = IterativeSolver.from_orbax_checkpoint(ckpt_dir)
        sos = np.ones((1, 96, 96), np.float32)
        sos[:, 20:40, 30:70] = 1.4
        out = solver.forward(sos, num_iterations=60)
        rmse = np.asarray(out["rmse"])[:, 0]
        assert np.isfinite(rmse).all()
        assert rmse[-1] < 0.05 * rmse[0]  # solves, not just runs
