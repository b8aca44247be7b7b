"""Profiling / tracing hooks (SURVEY.md section 5: first-class observability;
the reference's only timing artifact is an HDF5 attribute scrape,
kwave_solver.m:66-69).

* `trace(dir)` — context manager around jax.profiler for XLA/TPU traces
  viewable in TensorBoard/Perfetto.
* `Timer` — wall-clock section timing with device sync.
* `solver_roofline` — analytic per-iteration FLOP/byte counts for the
  learned step (the gridpoints/s/chip accounting used by bench.py).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock section timer for device work.

    Register the result inside the block so __exit__ blocks until the
    device actually finishes (async dispatch would otherwise measure only
    trace/enqueue time):

        with Timer() as t:
            y = jitted_fn(x)
            t.block(y)
        print(t.seconds)
    """

    def __enter__(self):
        self._tree = None
        self.start = time.perf_counter()
        return self

    def block(self, tree):
        """Register device output(s) to synchronize on at exit."""
        self._tree = tree
        return tree

    def __exit__(self, *exc):
        if self._tree is not None:
            jax.block_until_ready(self._tree)
        self.seconds = time.perf_counter() - self.start
        return False


@dataclass
class Roofline:
    flops_per_iteration: float
    bytes_per_iteration: float
    gridpoints: int

    def gridpoints_per_s(self, seconds_per_iteration: float) -> float:
        return self.gridpoints / seconds_per_iteration


def solver_roofline(batch: int, height: int, width: int, features: int = 8,
                    depth: int = 4) -> Roofline:
    """Analytic cost of one learned iteration (UNet fwd + matmul Laplacian).

    Conv flops: sum over UNet levels of B*(H W/4^d)*(9 Cin Cout)*2 for the
    double convs + down/up k=8 convs; Laplacian: two dense complex matmuls
    = 8*B*H*W*(H+W) real flops (4 real matmuls per axis).
    """
    f = features
    conv_flops = 0.0
    hw = height * width
    for d in range(depth + 1):
        level_hw = hw / (4**d)
        cin = 6 if d == 0 else f
        # double conv (2 convs) at this level on both enc+dec paths
        paths = 2 if d < depth else 1
        conv_flops += paths * batch * level_hw * 2 * 9 * (cin + 2) * f * 2
        if d < depth:
            conv_flops += 2 * batch * level_hw * 64 * f * f * 2 / 4  # down+up
    lap_flops = 8.0 * batch * hw * (height + width)
    # bytes: carry (wf, res, states) + params traffic per iteration
    bytes_per_iter = 4.0 * batch * hw * (2 + 2 + 6) * 3
    return Roofline(
        flops_per_iteration=conv_flops + lap_flops,
        bytes_per_iteration=bytes_per_iter,
        gridpoints=batch * hw,
    )
