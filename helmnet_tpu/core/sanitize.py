"""Opt-in numeric sanitizers: checkify + debug_nans (SURVEY §5).

The reference's only numeric guards are training-time behaviors —
`--terminate_on_nan` (train.py:44-45) and a NaN→inf val-loss workaround
(hybridnet.py:345-346) — which tell you THAT a run went non-finite, never
WHERE. This layer is the sanitizer analog SURVEY §5 calls for: functional
instrumentation that localizes the first NaN/inf-producing primitive (or a
failed user invariant) inside jitted code, with a useful traceback.

Everything here is strictly opt-in: checkify instrumentation adds
per-primitive predicate ops that XLA cannot always fuse away, so the
production train/solve paths stay uninstrumented by default and callers
flip it on to debug a diverging run (Trainer(..., sanitize=True),
gmres_restarted(..., sanitize=True), or the `debug_nans` context manager
for eager-grade localization of any entry point).
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import checkify

# float_checks: instrument every primitive that can produce NaN/inf.
# user_checks: honor explicit `check(...)` invariants placed in the code.
SANITIZE_ERRORS = checkify.float_checks | checkify.user_checks


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Context manager toggling jax_debug_nans: re-runs any jitted
    computation that produced a NaN in op-by-op mode and raises at the
    first offending primitive. Heavier than checkify (recompiles +
    replays) but needs no code changes — the right tool for a one-off
    "where did this diverge" session on any entry point."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checked(fn, errors=SANITIZE_ERRORS, *, jit: bool = False, **jit_kwargs):
    """Wrap `fn` so NaN/inf produced by ANY primitive inside it (and any
    failed `checkify.check`) raises a JaxRuntimeError naming the
    offending operation, instead of silently propagating. checkify
    functionalizes the error state, so with jit=True the instrumented
    function is compiled whole and the error is raised host-side after
    the dispatch — the wrapper must be the OUTERMOST level (a raise
    cannot live inside a trace)."""
    cfn = checkify.checkify(fn, errors=errors)
    if jit:
        cfn = jax.jit(cfn, **jit_kwargs)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)  # raises with primitive location info
        return out

    return wrapper


def check_finite(x, name: str):
    """In-jit invariant: all leaves of `x` finite. Only active inside a
    `checked(...)`-wrapped function (checkify.check must be discharged
    by a checkify transform); calling it elsewhere is an error by
    design — sanitizers should never silently no-op."""
    leaves = jax.tree_util.tree_leaves(x)
    ok = jnp.bool_(True)
    for leaf in leaves:
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.inexact):
            ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(leaf)))
    checkify.check(ok, f"non-finite values in {name}")
