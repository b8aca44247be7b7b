"""Decompose the learned-solver step time at the bench primary workload.

Times each piece of the per-iteration work as its own lax.scan on the
device, using the DIFFERENCE method: the tunnel's ~25-35 ms dispatch+fetch
round trip is constant per call, so each piece is timed at scan lengths L
and 4L and the per-iteration cost is (t4 - t1) / 3L. (Naive per-call
timing at 96^2 x 32 measures mostly the round trip: a trivial 1x1-conv
scan "costs" the same as the full step.)

Pieces: full rollout step | network-only | residual+rmse-only | per-level
DoubleConvs | down/up convs | outc | noop. Writes R2_STEP_PROFILE.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..")
ITERS = 50


def timeit(build, *args):
    """Per-iteration device seconds via the difference method. `build`
    maps a scan length to a callable."""
    import jax

    def force(r):
        # device-side slice first: full-array fetches cost ~10 ms/MB on
        # the tunnel and would swamp the per-iteration numbers
        leaf = jax.tree.leaves(r)[0]
        return np.asarray(leaf.ravel()[:4])

    def best(fn):
        force(fn(*args))  # compile + force
        ts = []
        for _ in range(3):
            t0 = time.time()
            force(fn(*args))
            ts.append(time.time() - t0)
        return min(ts)

    t1 = best(build(ITERS))
    t4 = best(build(4 * ITERS))
    return (t4 - t1) / (3 * ITERS)


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from helmnet_tpu.models import hybridnet
    from helmnet_tpu.models.blocks import conv2d, conv_transpose2d, double_conv
    from helmnet_tpu.ops.source import point_source_map
    from helmnet_tpu.ops.spectral import helmholtz_residual, make_operator
    from helmnet_tpu.solvers.iterative import get_initials, rollout
    from helmnet_tpu.train.checkpoint import load_reference_checkpoint

    ckpt = "/root/reference/trained_models/jcp_paper_trained_weights.ckpt"
    params, cfg = load_reference_checkpoint(ckpt)
    mcfg = cfg.model
    n, batch = 96, 32
    op = make_operator(n, n, cfg.geometry.pml_size, cfg.geometry.sigma_max,
                       cfg.k0)
    src = jnp.asarray(np.broadcast_to(
        point_source_map(n, n, (n - 14, n // 2), 10.0)[None],
        (batch, n, n, 2)))
    sos = np.ones((batch, n, n), np.float32)
    sos[:, : n // 2, : n // 2] = 1.5
    sos = jnp.asarray(sos)
    k_sq, wf = get_initials(sos, cfg.source.omega)
    dims = hybridnet.states_dimension((n, n), mcfg.depth)
    states = tuple(
        jnp.zeros((batch,) + dims[d] + (mcfg.state_channels,), jnp.float32)
        for d in range(mcfg.state_depth)
    )
    sig = jnp.broadcast_to(
        jnp.transpose(op.sigmas, (1, 2, 0))[None], (batch, n, n, 2))
    x_in = jnp.concatenate([wf, 1e3 * wf, sig], axis=-1)
    act, prec = mcfg.activation_function, mcfg.precision
    f = mcfg.features

    out = {}

    def rec(key, val):
        out[key] = val
        print(f"{key}: {val:.4f}", flush=True)

    def scan_build(body):
        """build(L) -> jitted scan of `body` with length L (carry passed
        as the timed-call argument)."""

        @functools.partial(jax.jit, static_argnums=1)
        def run(x0, L):
            x, _ = jax.lax.scan(body, x0, None, length=L)
            return x

        return lambda L: (lambda x0: run(x0, L))

    # 0. no-op scan: the per-iteration floor of the runtime itself
    rec("noop_ms", timeit(
        scan_build(lambda x, _: (x * 0.999, None)), wf) * 1e3)

    # 1. full step
    rec("full_step_ms", timeit(
        lambda L: lambda: rollout(params, op, src, sos, cfg=cfg,
                                  num_iterations=L)) * 1e3)

    # 2. network only (carry x through to keep the chain sequential)
    def net_body(c, _):
        x, st = c
        d, st = hybridnet.apply(params, x, st, cfg=mcfg)
        x = jnp.concatenate([d, d, sig], axis=-1)
        return (x, st), None

    rec("network_only_ms", timeit(
        scan_build(net_body), (x_in, states)) * 1e3)

    # 3. residual + rmse only
    def res_body(w, _):
        r = helmholtz_residual(op, w, k_sq, src, mode="matmul")
        rmse = jnp.sqrt(jnp.mean(r**2, axis=(1, 2, 3)))
        return w + 1e-6 * r + 1e-9 * rmse[:, None, None, None], None

    rec("residual_rmse_only_ms", timeit(scan_build(res_body), wf) * 1e3)

    # 4. per-level DoubleConv costs
    def dconv_ms(p, shape):
        def body(x, _):
            y = double_conv(p, x, act, prec)
            return x * 0.999 + 1e-9 * jnp.mean(y), None
        return timeit(scan_build(body),
                      jnp.zeros(shape, jnp.float32)) * 1e3

    rec("dconv_96_in6_ms", dconv_ms(params["inc"], (batch, 96, 96, 6)))
    for d, s in enumerate((96, 48, 24, 12)[: mcfg.depth]):
        p = params["enc"][d]["conv_signal"]
        cin = p["c1"]["w"].shape[2]
        rec(f"dconv_enc{d}_{s}_ms", dconv_ms(p, (batch, s, s, cin)))

    # 5. all down convs / all up convs chained
    def downs_body(x, _):
        y = x
        for d in range(mcfg.depth):
            y = conv2d(params["enc"][d]["down"], y, stride=2, padding=3,
                       precision=prec)
        return x * 0.999 + 1e-9 * jnp.mean(y), None

    rec("downs_ms", timeit(scan_build(downs_body),
                           jnp.zeros((batch, 96, 96, f))) * 1e3)

    def ups_body(x, _):
        y = jnp.zeros((batch, 6, 6, f), jnp.float32) + jnp.mean(x) * 1e-9
        for d in range(mcfg.depth - 1, -1, -1):
            y = conv_transpose2d(params["up"][d], y, stride=2, padding=3,
                                 precision=prec)
        return x * 0.999 + 1e-9 * jnp.mean(y), None

    rec("ups_ms", timeit(scan_build(ups_body),
                         jnp.zeros((batch, 96, 96, f))) * 1e3)

    # 6. outc 1x1
    def outc_body(x, _):
        y = conv2d(params["outc"], x, precision=prec)
        return x * 0.999 + 1e-9 * jnp.mean(y), None

    rec("outc_ms", timeit(scan_build(outc_body),
                          jnp.zeros((batch, 96, 96, f))) * 1e3)

    out["accounted_ms"] = out["network_only_ms"] + out["residual_rmse_only_ms"]
    print(json.dumps(out, indent=2), flush=True)
    with open(os.path.join(ROOT, "R2_STEP_PROFILE.json"), "w") as fjson:
        json.dump(out, fjson, indent=2)


if __name__ == "__main__":
    main()
