"""Pin bench.py's headline-selection rules.

The driver's end-of-round number is whatever `select_headline` returns;
these tests pin the invariants: matched-workload ratios only, the
batch-128 throughput config takes over only with its own torch baseline
measurement, and a workload mismatch is loud (recorded + ratio None).
"""

import importlib.util
import os

import pytest

_ROOT = os.path.join(os.path.dirname(__file__), "..")


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(_ROOT, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


PRIMARY = {"grid": 96, "batch": 32, "iterations": 500,
           "gridpoints_per_s": 300e6}
B128 = {"grid": 96, "batch": 128, "iterations": 500,
        "gridpoints_per_s": 1.05e9}
BASE = {"config": {"grid": 96, "batch": 32, "iterations": 50},
        "gridpoints_per_s": 2.2e6,
        "gridpoints_per_s_500": 2.4e6,
        "gridpoints_per_s_b128_500": 1.6e6}


def test_no_baseline_means_no_ratio(bench):
    h, vs = bench.select_headline({}, dict(PRIMARY), None)
    assert h is not None and h["batch"] == 32 and vs is None


def test_primary_matched_500_ratio(bench):
    h, vs = bench.select_headline({}, dict(PRIMARY), dict(BASE))
    assert h["batch"] == 32
    assert vs == pytest.approx(300e6 / 2.4e6)


def test_b128_takes_headline_only_with_matched_baseline(bench):
    details = {"primary_b128_500": dict(B128)}
    h, vs = bench.select_headline(details, dict(PRIMARY), dict(BASE))
    assert h["batch"] == 128
    assert vs == pytest.approx(1.05e9 / 1.6e6)

    # same details but the baseline lacks the b128 measurement: the
    # primary keeps the headline (never a cross-workload ratio)
    base = {k: v for k, v in BASE.items()
            if k != "gridpoints_per_s_b128_500"}
    h, vs = bench.select_headline(dict(details), dict(PRIMARY), base)
    assert h["batch"] == 32
    assert vs == pytest.approx(300e6 / 2.4e6)


def test_slower_b128_never_takes_headline(bench):
    slow = dict(B128, gridpoints_per_s=200e6)
    h, vs = bench.select_headline(
        {"primary_b128_500": slow}, dict(PRIMARY), dict(BASE))
    assert h["batch"] == 32


def test_workload_mismatch_is_loud(bench):
    primary = dict(PRIMARY, iterations=50)
    base = {"config": {"grid": 96, "batch": 32, "iterations": 500},
            "gridpoints_per_s": 2.2e6}
    details = {}
    h, vs = bench.select_headline(details, primary, base)
    assert vs is None
    assert "baseline_workload_mismatch" in details
