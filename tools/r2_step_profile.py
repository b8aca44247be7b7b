"""Decompose the learned-solver step time at the bench primary workload.

Times each piece of the per-iteration work as its own 50-long lax.scan on
the device (the only reliable methodology on the tunneled runtime: one
dispatch, tiny host fetch), so we know where the 1.7 ms/iter at 96^2 x 32
actually goes before building kernels for the wrong bottleneck.

Pieces: full rollout step | network-only | residual+rmse-only | per-level
DoubleConvs | down/up convs | outc. Writes R2_STEP_PROFILE.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..")
ITERS = 50


def timeit(fn, *args):
    import jax

    r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0]).ravel()[:4]  # compile + force
    ts = []
    for _ in range(3):
        t0 = time.time()
        r = fn(*args)
        np.asarray(jax.tree.leaves(r)[0]).ravel()[:4]
        ts.append(time.time() - t0)
    return min(ts) / ITERS


def main():
    import jax
    import jax.numpy as jnp

    from helmnet_tpu.models import hybridnet
    from helmnet_tpu.models.blocks import conv2d, conv_transpose2d, double_conv
    from helmnet_tpu.ops.source import point_source_map
    from helmnet_tpu.ops.spectral import make_operator
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

    out = {}

    # 1. full step
    t = timeit(lambda: rollout(params, op, src, sos, cfg=cfg,
                               num_iterations=ITERS))
    out["full_step_ms"] = t * 1e3

    # 2. network only (carry x through to keep the chain sequential)
    @jax.jit
    def net_only(x0, states0):
        def body(c, _):
            x, st = c
            d, st = hybridnet.apply(params, x, st, cfg=mcfg)
            x = jnp.concatenate([d, d, sig], axis=-1)
            return (x, st), None
        c, _ = jax.lax.scan(body, (x0, states0), None, length=ITERS)
        return c[0]

    out["network_only_ms"] = timeit(net_only, x_in, states) * 1e3

    # 3. residual + rmse only
    from helmnet_tpu.ops.spectral import helmholtz_residual

    @jax.jit
    def resid_only(w0):
        def body(w, _):
            r = helmholtz_residual(op, w, k_sq, src, mode="matmul")
            rmse = jnp.sqrt(jnp.mean(r**2, axis=(1, 2, 3)))
            w = w + 1e-6 * r + 1e-9 * rmse[:, None, None, None]
            return w, None
        w, _ = jax.lax.scan(body, w0, None, length=ITERS)
        return w

    out["residual_rmse_only_ms"] = timeit(resid_only, wf) * 1e3

    # 4. per-level DoubleConv costs (inc-shaped at each resolution)
    act, prec = mcfg.activation_function, mcfg.precision

    def dconv_scan(p, shape):
        x0 = jnp.zeros(shape, jnp.float32)

        @jax.jit
        def run(x0):
            def body(x, _):
                y = double_conv(p, x, act, prec)
                return jnp.concatenate(
                    [y, x[..., y.shape[-1]:]], axis=-1) * 0.999, None
            x, _ = jax.lax.scan(body, x0, None, length=ITERS)
            return x
        return timeit(run, x0) * 1e3

    f = mcfg.features
    out["dconv_96_in6_ms"] = dconv_scan(params["inc"], (batch, 96, 96, 6))
    for d, s in enumerate((96, 48, 24, 12)[: mcfg.depth]):
        p = params["enc"][d]["conv_signal"]
        cin = p["c1"]["w"].shape[2]
        out[f"dconv_enc{d}_{s}_ms"] = dconv_scan(p, (batch, s, s, cin))

    # 5. all down convs / all up convs chained
    @jax.jit
    def downs(x0):
        def body(x, _):
            y = x
            for d in range(mcfg.depth):
                y = conv2d(params["enc"][d]["down"], y, stride=2, padding=3,
                           precision=prec)
            return x * 0.999 + 1e-9 * jnp.mean(y), None
        x, _ = jax.lax.scan(body, x0, None, length=ITERS)
        return x

    out["downs_ms"] = timeit(downs, jnp.zeros((batch, 96, 96, f))) * 1e3

    @jax.jit
    def ups(x0):
        def body(x, _):
            y = jnp.zeros((batch, 6, 6, f), jnp.float32) + jnp.mean(x) * 1e-9
            for d in range(mcfg.depth - 1, -1, -1):
                y = conv_transpose2d(params["up"][d], y, stride=2, padding=3,
                                     precision=prec)
            return x * 0.999 + 1e-9 * jnp.mean(y), None
        x, _ = jax.lax.scan(body, x0, None, length=ITERS)
        return x

    out["ups_ms"] = timeit(ups, jnp.zeros((batch, 96, 96, f))) * 1e3

    # 6. outc 1x1
    @jax.jit
    def outc(x0):
        def body(x, _):
            y = conv2d(params["outc"], x, precision=prec)
            return x * 0.999 + 1e-9 * jnp.mean(y), None
        x, _ = jax.lax.scan(body, x0, None, length=ITERS)
        return x

    out["outc_ms"] = timeit(outc, jnp.zeros((batch, 96, 96, f))) * 1e3

    out["accounted_ms"] = out["network_only_ms"] + out["residual_rmse_only_ms"]
    print(json.dumps(out, indent=2), flush=True)
    with open(os.path.join(ROOT, "R2_STEP_PROFILE.json"), "w") as fjson:
        json.dump(out, fjson, indent=2)


if __name__ == "__main__":
    main()
