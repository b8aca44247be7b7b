"""Sanitizer layer (core/sanitize.py): checkify instrumentation must
localize injected NaN/inf with a useful error, and stay out of the way
when disabled (SURVEY §5 sanitizers; reference guards are run-level only,
train.py:44-45).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helmnet_tpu import check_finite, checked, solve_helmholtz_checked
from helmnet_tpu.core.config import (
    Config,
    GeometryConfig,
    ModelConfig,
    SourceConfig,
    TrainingConfig,
)
from helmnet_tpu.ops.spectral import make_operator
from helmnet_tpu.train.loop import Trainer


def tiny_config():
    # as small as the architecture allows: checkify's per-primitive
    # instrumentation makes compile cost scale with graph size, so the
    # sanitized train-step tests keep depth/unroll minimal
    return Config(
        max_iterations=50,
        geometry=GeometryConfig(domain_size=16, pml_size=2, sigma_max=2.0),
        model=ModelConfig(features=4, depth=2, state_depth=2, state_channels=2),
        source=SourceConfig(amplitude=10.0, location=(12, 8)),
        training=TrainingConfig(
            buffer_size=4,
            train_batch_size=2,
            unrolling_steps=1,
            learning_rate=3e-3,
            minimum_learning_rate=1e-4,
        ),
    )


def test_checked_raises_on_nan_with_location():
    @checked
    def f(x):
        return jnp.log(x) * 2.0  # log(-1) -> nan

    with pytest.raises(Exception) as ei:
        f(jnp.array([-1.0]))
    assert "nan" in str(ei.value).lower()


def test_checked_passes_clean_values_through():
    @checked
    def f(x):
        return jnp.log(x) * 2.0

    np.testing.assert_allclose(f(jnp.array([1.0])), [0.0])


def test_check_finite_user_invariant():
    def f(tree):
        check_finite(tree, "params")
        return jax.tree_util.tree_map(lambda a: a * 2, tree)

    cf = checked(f, jit=True)
    bad = {"w": jnp.array([1.0, jnp.inf]), "b": jnp.zeros(2)}
    with pytest.raises(Exception) as ei:
        cf(bad)
    assert "params" in str(ei.value)
    good = {"w": jnp.ones(2), "b": jnp.zeros(2)}
    out = cf(good)
    np.testing.assert_allclose(out["w"], [2.0, 2.0])


def test_solve_helmholtz_checked_catches_bad_medium():
    n = 24
    op = make_operator(n, n, pml_size=6, sigma_max=2.0, k0=1.0)
    src = jnp.zeros((n, n, 2), jnp.float32).at[12, 12, 0].set(1.0)
    k_sq = jnp.ones((n, n), jnp.float32)
    # clean solve works through the instrumented path
    res = solve_helmholtz_checked(op, k_sq, src, restart=8, max_restarts=4)
    assert np.all(np.isfinite(np.asarray(res.x)))
    # a NaN medium raises instead of silently filling checkpoints
    bad = k_sq.at[5, 5].set(jnp.nan)
    with pytest.raises(Exception) as ei:
        solve_helmholtz_checked(op, bad, src, restart=8, max_restarts=4)
    assert "nan" in str(ei.value).lower()


def test_trainer_sanitize_flag_raises_on_injected_nan():
    cfg = tiny_config()
    tr = Trainer(cfg, sanitize=True)
    maps = np.ones((4, 16, 16), np.float32)
    tr.fill_buffer(maps)
    batch = tr.buffer.sample(cfg.training.train_batch_size)
    # poison one wavefield entry; the sanitized step must raise at the
    # first NaN-producing primitive, not return a NaN loss
    wf = np.asarray(batch.wavefield).copy()
    wf[0, 8, 8, 0] = np.nan
    batch = batch._replace(wavefield=jnp.asarray(wf))
    with pytest.raises(Exception) as ei:
        tr._train_step(tr.params, tr.opt_state, tr.op, batch, jnp.int32(0))
    assert "nan" in str(ei.value).lower()


def test_trainer_sanitize_clean_step_matches_default():
    cfg = tiny_config()
    tr_a = Trainer(cfg, sanitize=True)
    tr_b = Trainer(cfg, sanitize=False)
    maps = np.ones((4, 16, 16), np.float32)
    tr_a.fill_buffer(maps)
    batch = tr_a.buffer.sample(cfg.training.train_batch_size)
    _, _, m_a, _ = tr_a._train_step(
        tr_a.params, tr_a.opt_state, tr_a.op, batch, jnp.int32(0)
    )
    _, _, m_b, _ = tr_b._train_step(
        tr_b.params, tr_b.opt_state, tr_b.op, batch, jnp.int32(0)
    )
    np.testing.assert_allclose(
        float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5
    )
