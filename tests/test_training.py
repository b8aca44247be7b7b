"""Training-loop tests: replay semantics, curriculum, plateau scheduler, and
an end-to-end smoke run showing decreasing physics loss on a tiny config."""

import jax
import numpy as np
import pytest

from helmnet_tpu.core.config import (
    Config,
    GeometryConfig,
    ModelConfig,
    SourceConfig,
    TrainingConfig,
)
from helmnet_tpu.data.ellipses import make_dataset
from helmnet_tpu.train.loop import PlateauScheduler, Trainer
from helmnet_tpu.train.replay import ExperienceBatch, ReplayBuffer


def tiny_config():
    return Config(
        max_iterations=50,
        geometry=GeometryConfig(domain_size=32, pml_size=4, sigma_max=2.0),
        model=ModelConfig(features=8, depth=4, state_depth=4, state_channels=2),
        source=SourceConfig(amplitude=10.0, location=(26, 16)),
        training=TrainingConfig(
            buffer_size=16,
            train_batch_size=4,
            unrolling_steps=3,
            learning_rate=3e-3,
            minimum_learning_rate=1e-4,
        ),
    )


class TestReplayBuffer:
    def test_slot_overwrite_and_sample(self):
        buf = ReplayBuffer(8, 16, 16, 2, 340)
        wf = np.random.randn(2, 16, 16, 2).astype(np.float32)
        st = np.random.randn(2, 2, 340).astype(np.float32)
        k = np.ones((2, 16, 16), np.float32)
        buf.append_batch(np.array([3, 5]), wf, st, k, wf, wf, np.array([7, 9]))
        # sample everything, find our slots
        batch = buf.sample(8)
        pos3 = list(batch.indices).index(3)
        np.testing.assert_array_equal(batch.wavefield[pos3], wf[0])
        assert batch.iteration[pos3] == 7
        # overwrite slot 3
        buf.append(3, wf[1], st[1], k[1], wf[1], wf[1], 42)
        batch = buf.sample(8)
        pos3 = list(batch.indices).index(3)
        assert batch.iteration[pos3] == 42
        np.testing.assert_array_equal(batch.wavefield[pos3], wf[1])

    def test_sample_without_replacement(self):
        buf = ReplayBuffer(8, 4, 4, 2, 20)
        batch = buf.sample(8)
        assert len(set(batch.indices.tolist())) == 8


class TestScheduler:
    def test_plateau_reduces_lr(self):
        s = PlateauScheduler(1e-3, 0.5, patience=2, min_lr=1e-4)
        assert s.step(1.0) == 1e-3  # improvement
        for _ in range(2):
            assert s.step(2.0) == 1e-3  # within patience
        assert s.step(2.0) == 5e-4  # exceeded patience -> halved
        for _ in range(10):
            s.step(2.0)
        assert s.lr == 1e-4  # floored at min_lr


class TestEpochCap:
    """resolve_epoch_cap — the tpu_r3d lesson (TRAINING_r3d.md): a warm
    start restores the source tag's epoch counter, so an absolute cap
    silently truncates the new run."""

    def test_fresh_run_uses_absolute_cap(self):
        from helmnet_tpu.train.loop import resolve_epoch_cap

        assert resolve_epoch_cap(0, 1000) == 1000

    def test_resume_keeps_absolute_cap(self):
        from helmnet_tpu.train.loop import resolve_epoch_cap

        assert resolve_epoch_cap(400, 1000) == 1000

    def test_warm_start_gets_full_budget(self):
        from helmnet_tpu.train.loop import resolve_epoch_cap

        # r3d scenario: restored at epoch 950 — a new run must NOT be
        # capped to 50 epochs
        assert resolve_epoch_cap(950, 1000, warm_started=True) == 1950

    def test_explicit_budget_wins(self):
        from helmnet_tpu.train.loop import resolve_epoch_cap

        assert resolve_epoch_cap(950, 1000, epoch_budget=300) == 1250
        assert (
            resolve_epoch_cap(950, 1000, warm_started=True, epoch_budget=300)
            == 1250
        )


class TestDataset:
    def test_ellipse_distribution(self):
        maps = make_dataset(8, imsize=96, seed=0)
        assert maps.shape == (8, 96, 96) and maps.dtype == np.float32
        assert np.all(maps >= 1.0)
        assert np.all(maps <= 2.0 + 1e-6)
        # each map has background and at least some annulus pixels
        for m in maps:
            assert (m == 1.0).mean() > 0.5
            assert (m > 1.4).sum() > 20

    def test_split_and_save(self, tmp_path):
        from helmnet_tpu.data.ellipses import load_maps, split_and_save

        maps = make_dataset(20, imsize=32, seed=1)
        out = split_and_save(maps, str(tmp_path), splits=(12, 4, 4))
        train = load_maps(out["trainset"])
        assert train.shape == (12, 32, 32)
        val = load_maps(out["validation"])
        test = load_maps(out["testset"])
        assert len(val) == 4 and len(test) == 4


class TestTrainerSmoke:
    @pytest.fixture(scope="class")
    def run(self):
        cfg = tiny_config()
        maps = make_dataset(16, imsize=32, seed=0)
        trainer = Trainer(cfg, key=None)
        history = trainer.fit(maps, num_epochs=8)
        return trainer, history

    def test_loss_decreases(self, run):
        trainer, history = run
        losses = [h["train_loss_mean"] for h in history]
        assert np.isfinite(losses).all()
        assert min(losses[1:]) < losses[0], losses

    def test_curriculum_advances(self, run):
        trainer, history = run
        maxiters = [h["maxiter"] for h in history]
        assert maxiters[0] == 1
        assert maxiters[-1] > maxiters[0]

    def test_buffer_ages_evolve(self, run):
        trainer, _ = run
        ages = trainer.buffer.iteration
        assert ages.max() >= 1  # some experiences evolved
        assert np.isfinite(trainer.buffer.wavefield).all()

    def test_validation_runs(self, run):
        trainer, _ = run
        maps = make_dataset(4, imsize=32, seed=3)
        out = trainer.validate(maps, num_iterations=10, batch=4)
        assert np.isfinite(out["val_loss"])
        # the median path: robust metric the sharded-quality tooling keys
        # on (the MEAN is dominated by single diverging long rollouts
        # mid-training — r4 verdict weak #2)
        assert np.isfinite(out["val_median"]) and out["val_median"] > 0


class TestExtendedSourceCurriculum:
    """Line-segment source curriculum (our far-OOD extension; the reference
    trains point sources only — hybridnet.py:145-156)."""

    def test_line_source_map(self):
        from helmnet_tpu.ops.source import line_source_map, point_source_map

        m = line_source_map(32, 32, (8, 6), (8, 25), amplitude=10.0)
        assert m.shape == (32, 32, 2) and m.dtype == np.float32
        # the segment row carries ~uniform amplitude; elsewhere ~0
        assert m[8, 6:26, 0].min() > 5.0
        assert abs(m[20, 16, 0]) < 1e-6
        # a degenerate segment equals the point source
        p = point_source_map(32, 32, (8, 6), amplitude=10.0)
        d = line_source_map(32, 32, (8, 6), (8, 6), amplitude=10.0)
        np.testing.assert_allclose(d, p, atol=1e-6)

    def test_pool_and_sampling(self):
        import dataclasses

        cfg = tiny_config()
        cfg = cfg.replace(
            training=dataclasses.replace(
                cfg.training, p_random_source=0.3, p_extended_source=0.4
            )
        )
        trainer = Trainer(cfg, key=None)
        pool = np.asarray(trainer.src_pool)
        n_pt = trainer._n_point_sources
        assert pool.shape[0] == n_pt + 256
        idx = trainer._sample_src_idx(4000)
        frac_ext = (idx >= n_pt).mean()
        frac_circ = ((idx >= 1) & (idx < n_pt)).mean()
        frac_fixed = (idx == 0).mean()
        assert abs(frac_ext - 0.4) < 0.05
        assert abs(frac_circ - 0.3) < 0.05
        assert abs(frac_fixed - 0.3) < 0.05

    def test_val_sources_extended_frac(self):
        cfg = tiny_config()
        trainer = Trainer(cfg, key=None)
        src = trainer.make_val_sources(8, extended_frac=0.5)
        assert src.shape == (8, 32, 32, 2)
        # extended sources put energy on many more pixels than points
        amp = np.abs(src[..., 0])
        support = (amp > 0.5 * amp.max(axis=(1, 2), keepdims=True)).sum((1, 2))
        assert (support[:4] > 4).all(), support
        assert (support[4:] <= 4).all(), support


class TestGenerateDatasetCLI:
    def test_cli_generates_splits(self, tmp_path):
        from helmnet_tpu.cli.generate_dataset import main

        out = str(tmp_path / "ds")
        main(["--num", "12", "--imsize", "32", "--out", out,
              "--splits", "8", "2", "2"])
        from helmnet_tpu.data.ellipses import load_maps

        assert load_maps(out + "/trainset.npz").shape == (8, 32, 32)
        assert load_maps(out + "/testset.npz").shape == (2, 32, 32)


def test_remat_train_step_matches_unrematerialized():
    """TrainingConfig.remat must be a pure memory/FLOP trade: identical
    losses and updated parameters (2D counterpart of the 3D test)."""
    import dataclasses

    cfg = tiny_config()
    cfg_r = cfg.replace(
        training=dataclasses.replace(cfg.training, remat=True)
    )
    maps = np.ones((4, 32, 32), np.float32)
    t0 = Trainer(cfg)
    t1 = Trainer(cfg_r)
    t0.fill_buffer(maps)
    batch = t0.buffer.sample(cfg.training.train_batch_size)
    import jax.numpy as jnp

    dev = ExperienceBatch(*[jnp.asarray(a) for a in batch])
    p0, _, m0, _ = t0._train_step(t0.params, t0.opt_state, t0.op, dev, 1)
    p1, _, m1, _ = t1._train_step(t1.params, t1.opt_state, t1.op, dev, 1)
    assert float(m1["loss"]) == pytest.approx(float(m0["loss"]), rel=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
