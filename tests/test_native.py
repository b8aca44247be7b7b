"""Native C++ runtime components (built on demand with g++)."""

import numpy as np
import pytest

from helmnet_tpu.core import native


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return native.load()


class TestNative:
    def test_generate_ellipses_distribution(self, lib):
        maps = native.generate_ellipses(32, 96, seed=0)
        assert maps.shape == (32, 96, 96) and maps.dtype == np.float32
        assert np.all(maps >= 1.0) and np.all(maps <= 2.0 + 1e-6)
        for m in maps:
            assert (m == 1.0).mean() > 0.5  # mostly background
            assert (m > 1.4).sum() > 20  # visible annulus

    def test_deterministic_and_thread_invariant(self, lib):
        a = native.generate_ellipses(8, 64, seed=7, num_threads=1)
        b = native.generate_ellipses(8, 64, seed=7, num_threads=4)
        np.testing.assert_array_equal(a, b)

    def test_gather_scatter_roundtrip(self, lib):
        rng = np.random.default_rng(0)
        src = rng.standard_normal((50, 7, 3)).astype(np.float32)
        idx = rng.permutation(50)[:20]
        got = native.gather_rows(src, idx)
        np.testing.assert_array_equal(got, src[idx])
        dst = np.zeros_like(src)
        native.scatter_rows(dst, got, idx)
        np.testing.assert_array_equal(dst[idx], src[idx])
        untouched = np.setdiff1d(np.arange(50), idx)
        assert np.all(dst[untouched] == 0)

    def test_dataset_backend_switch(self, lib):
        from helmnet_tpu.data.ellipses import make_dataset

        m = make_dataset(4, 64, seed=0, backend="native")
        assert m.shape == (4, 64, 64)
