"""Multi-device scaling benchmark: stencil-residual nnz/s efficiency.

BASELINE.md's last north-star is ">=80% nnz/s scaling efficiency on 2
hosts". This tool measures WEAK scaling of the halo-exchange sharded
stencil residual (distributed/halo.py) and of the data-parallel learned
rollout: per-device work is held constant, devices are swept 1..N, and
efficiency(n) = nnz/s(n) / (n * nnz/s(1)).

On real multi-chip TPU hardware this reports the true ICI-scaling
number. On the CPU virtual mesh (the only multi-device configuration
available in this environment; run with
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu) it
validates the harness end-to-end, but the efficiency numbers are NOT
hardware-meaningful — all virtual devices share the same host cores, so
the report flags them `virtual: true`.

Writes SCALING.json.

Usage:
    python tools/bench_scaling.py [--grid 512] [--batch-per-dev 4]
        [--iters 50] [--devices 1,2,4,8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=512)
    ap.add_argument("--batch-per-dev", type=int, default=4)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--devices", type=str, default=None,
                    help="comma list; default 1,2,...,len(jax.devices())")
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from helmnet_tpu.core.config import Config
    from helmnet_tpu.distributed.halo import make_sharded_stencil_residual
    from helmnet_tpu.ops.stencil import make_stencil_operator

    all_devs = jax.devices()
    dev_counts = (
        [int(x) for x in args.devices.split(",")] if args.devices
        else [n for n in (1, 2, 4, 8, 16, 32) if n <= len(all_devs)]
    )
    n, it = args.grid, args.iters
    cfg = Config()
    st = make_stencil_operator(n, n, cfg.geometry.pml_size,
                               cfg.geometry.sigma_max, cfg.k0, order=4)
    nnz_per_point = 4 * st.radius + 1

    results = {"grid": n, "batch_per_device": args.batch_per_dev,
               "iterations": it,
               "platform": all_devs[0].platform,
               "virtual": all_devs[0].platform == "cpu",
               "runs": {}}

    for ndev in dev_counts:
        mesh = Mesh(np.asarray(all_devs[:ndev]).reshape(ndev, 1, 1),
                    ("data", "y", "x"))
        b = args.batch_per_dev * ndev  # weak scaling: work per device fixed
        residual = make_sharded_stencil_residual(mesh, st)
        rng = np.random.default_rng(0)
        sh4 = NamedSharding(mesh, P("data", "y", "x", None))
        sh3 = NamedSharding(mesh, P("data", "y", "x"))
        u = jax.device_put(
            rng.standard_normal((b, n, n, 2)).astype(np.float32), sh4)
        ksq = jax.device_put(np.ones((b, n, n), np.float32), sh3)
        src = jax.device_put(np.zeros((b, n, n, 2), np.float32), sh4)

        @jax.jit
        def many(u0):
            def body(c, _):
                r = residual(c, ksq, src)
                return c * 0.999 + 1e-3 * r, None
            c, _ = jax.lax.scan(body, u0, None, length=it)
            return c

        np.asarray(many(u).ravel()[:4])  # compile + force
        ts = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(many(u).ravel()[:4])
            ts.append(time.time() - t0)
        dt = min(ts) / it
        nnz_s = b * n * n * nnz_per_point / dt
        results["runs"][str(ndev)] = {
            "batch": b, "seconds_per_apply": dt, "nnz_per_s": nnz_s,
        }
        print(f"  {ndev} dev: {nnz_s/1e9:.2f} Gnnz/s "
              f"({dt*1e3:.2f} ms/apply, batch {b})", flush=True)

    base = results["runs"][str(dev_counts[0])]["nnz_per_s"] / dev_counts[0]
    for ndev in dev_counts:
        r = results["runs"][str(ndev)]
        r["weak_scaling_efficiency"] = r["nnz_per_s"] / (ndev * base)
    print(json.dumps(results, indent=2), flush=True)
    with open(os.path.join(ROOT, "SCALING.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
