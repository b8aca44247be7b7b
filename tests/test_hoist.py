"""Closure-constant hoisting (core/hoist.py): the mechanism that keeps
very-large-grid FGMRES compiles under the tunneled worker's remote-compile
request limit (HTTP 413 at 8192^2 — see helm_8192_twolevel history)."""

import jax
import jax.numpy as jnp
import numpy as np

from helmnet_tpu.core.hoist import LazyHoistedJit, hoisted_jit


class TestHoistedJit:
    def test_matches_plain_jit(self):
        big = jnp.asarray(np.random.default_rng(0).random(
            (64, 64)).astype(np.float32))

        def f(x):
            return (x.reshape(64, 64) * big).sum()

        x = jnp.ones(64 * 64, jnp.float32)
        np.testing.assert_allclose(
            np.asarray(hoisted_jit(f, x)(x)), np.asarray(jax.jit(f)(x)),
            rtol=1e-6,
        )

    def test_constants_leave_the_lowered_module(self):
        """The captured array must NOT be baked into the executable: a
        1024^2 f32 capture is ~8 MB of StableHLO baked, O(1 kB) hoisted."""
        # must be non-splat: MLIR prints splat constants compactly, which
        # would hide the baked bytes this test is about
        big = jnp.asarray(np.random.default_rng(1).random(
            (1024, 1024)).astype(np.float32))

        def f(x):
            return (x * big).sum()

        x = jnp.ones((1024, 1024), jnp.float32)
        from jax.tree_util import tree_flatten

        # reproduce hoisted_jit's internals to lower without executing
        closed = jax.make_jaxpr(f)(x)
        assert closed.consts, "expected the capture to be a jaxpr const"
        from jax.core import eval_jaxpr

        def converted(xx, *cs):
            return eval_jaxpr(closed.jaxpr, cs, xx)

        hoisted_text = jax.jit(converted).lower(x, *closed.consts).as_text()
        baked_text = jax.jit(f).lower(x).as_text()
        assert len(baked_text) > 1_000_000, len(baked_text)
        assert len(hoisted_text) < 50_000, len(hoisted_text)

    def test_multi_output_int_and_complex_captures(self):
        idx = np.arange(10)
        cplx = jax.lax.complex(jnp.ones((4, 4)), 2.0 * jnp.ones((4, 4)))

        def g(a, b):
            return a[idx].sum() + b, (cplx * b).real.sum()

        a = jnp.arange(100, dtype=jnp.float32)
        b = jnp.float32(2.0)
        got = hoisted_jit(g, a, b)(a, b)
        want = jax.jit(g)(a, b)
        for gg, ww in zip(got, want):
            np.testing.assert_allclose(np.asarray(gg), np.asarray(ww),
                                       rtol=1e-6)

    def test_complex_host_capture_enters_as_split_halves(self):
        """A complex NUMPY capture must reach the device without a
        complex host transfer (unimplemented on the axon runtime)."""
        host_c = np.full((8, 8), 1.0 + 2.0j, np.complex64)

        def f(x):
            return (x * host_c).real.sum()

        x = jnp.ones((8, 8), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(hoisted_jit(f, x)(x)), 64.0, rtol=1e-6
        )

    def test_donate_argnums_maps_to_flat_positions_and_matches(self):
        """Donation must target fun's top-level args (never the hoisted
        constants appended after them) and preserve results."""
        scale = jnp.asarray(np.full((16, 16), 2.0, np.float32))

        def f(carry, delta):
            return carry * scale + delta

        c = jnp.ones((16, 16), jnp.float32)
        d = jnp.full((16, 16), 3.0, jnp.float32)
        h = hoisted_jit(f, c, d, donate_argnums=(0,))
        got = h(c, d)
        want = np.ones((16, 16), np.float32) * 2.0 + 3.0
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
        # carry was donated; a second call with fresh buffers still works
        got2 = h(jnp.ones((16, 16), jnp.float32), d)
        np.testing.assert_allclose(np.asarray(got2), want, rtol=1e-6)

    def test_lazy_converts_once_and_rejects_tree_mismatch(self):
        calls = {"n": 0}

        def f(x):
            calls["n"] += 1
            return x * 2.0

        lz = LazyHoistedJit(f)
        x = jnp.ones(4, jnp.float32)
        lz(x)
        n_after_first = calls["n"]  # traced (possibly twice: jaxpr+shape)
        lz(x)
        assert calls["n"] == n_after_first  # no retracing on later calls

        import pytest

        with pytest.raises(TypeError, match="tree"):
            lz((x, x))
