"""Closure-constant hoisting for very-large-grid jits.

Lowering a jitted CLOSURE embeds every captured array in the executable
as a literal constant. On the tunneled TPU runtime the whole lowered
program travels in one remote-compile HTTP request, which rejects large
bodies (observed: HTTP 413 at 8192^2, where a single captured k^2 map is
268 MB — the failure that killed the first 8192^2 two-level attempt;
CLAUDE.md "8192^2 probe FAILED"). The fix is the same discipline
solve_helmholtz already follows — large arrays enter jit as ARGUMENTS —
applied automatically: trace the closure once (jax.make_jaxpr), pull the
captured arrays out as jaxpr constants, and re-express the function with
those constants as trailing jit arguments, so only HLO travels and the
captures stay device-resident. (jax.closure_convert is NOT this: it
hoists only potentially-perturbed tracers, for custom-derivative use.)

Measured: a jit closing over one 1024^2 f32 map lowers to 8.4 MB of
StableHLO; hoisted, 611 bytes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.core import eval_jaxpr
from jax.tree_util import tree_flatten, tree_structure, tree_unflatten


def _to_device(c):
    """Device-put one hoisted constant WITHOUT a complex host transfer
    (complex64 host<->device is unimplemented on the axon runtime):
    complex host arrays enter as two real halves combined on device."""
    if isinstance(c, jax.Array):
        return c
    c = np.asarray(c)
    if np.iscomplexobj(c):
        return jax.lax.complex(
            jnp.asarray(np.ascontiguousarray(c.real)),
            jnp.asarray(np.ascontiguousarray(c.imag)),
        )
    return jnp.asarray(c)


def hoisted_jit(fun, *example_args, donate_argnums=()):
    """jit `fun` with its closed-over arrays passed as arguments instead
    of baked into the executable.

    `example_args` must match the pytree/shapes/dtypes `fun` will be
    called with (tracing is abstract — nothing is materialized). Returns
    a callable with `fun`'s original signature; the hoisted constants
    are device-put once and appended automatically on every call
    (zero-copy for arrays already on device).

    donate_argnums donates the corresponding TOP-LEVEL arguments of
    `fun` (flat-leaf positions are resolved internally; hoisted constants
    are never donated) — essential for multi-GB carries like Krylov
    bases, which would otherwise be double-buffered across the call."""
    flat, in_tree = tree_flatten(example_args)
    n_args = len(flat)

    def flat_fun(*flat_args):
        return fun(*tree_unflatten(in_tree, flat_args))

    closed, out_shape = jax.make_jaxpr(flat_fun, return_shape=True)(*flat)
    out_tree = tree_structure(out_shape)
    consts = [_to_device(c) for c in closed.consts]
    jaxpr = closed.jaxpr

    def converted(*args_and_consts):
        args, cs = args_and_consts[:n_args], args_and_consts[n_args:]
        return tree_unflatten(out_tree, eval_jaxpr(jaxpr, cs, *args))

    if donate_argnums:
        # map top-level arg indices of `fun` to flat leaf positions
        donate_flat = []
        pos = 0
        for i, a in enumerate(example_args):
            leaves = len(tree_flatten(a)[0])
            if i in donate_argnums:
                donate_flat.extend(range(pos, pos + leaves))
            pos += leaves
        jitted = jax.jit(converted, donate_argnums=tuple(donate_flat))
    else:
        jitted = jax.jit(converted)

    def call(*args):
        flat_args, tree2 = tree_flatten(args)
        if tree2 != in_tree:
            raise TypeError(
                f"hoisted_jit call tree {tree2} != example tree {in_tree}"
            )
        return jitted(*flat_args, *consts)

    return call


class LazyHoistedJit:
    """hoisted_jit that defers the trace to the first call, when real
    example arguments exist. One converted executable per instance;
    callers create one instance per (fun, shape) context — exactly the
    lifetime of the closures it wraps."""

    def __init__(self, fun, donate_argnums=()):
        self._fun = fun
        self._donate = tuple(donate_argnums)
        self._call = None

    def __call__(self, *args):
        if self._call is None:
            self._call = hoisted_jit(self._fun, *args,
                                     donate_argnums=self._donate)
        return self._call(*args)
