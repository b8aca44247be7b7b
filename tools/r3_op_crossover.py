"""Operator-mode crossover measurement: matmul vs fft residual apply.

The dense per-axis matmul operator is O(N^3)/apply; the 1D-FFT mode is
O(N^2 log N). matmul rides the MXU and wins at small N (PERF_NOTES),
but must lose somewhere. This measures the crossover ON THE CHIP so
operator_mode="auto" can pick per size (VERDICT round-2 item 2; perf
analog of /root/reference/helmnet/spectral.py:31-79).

    timeout 2400 python tools/r3_op_crossover.py          # real TPU
    OPX_CPU=1 OPX_SIZES=128,256 python tools/r3_op_crossover.py  # smoke

Each timing uses the scalar-fetch methodology (CLAUDE.md): iterate the
residual inside one scan, fetch one scalar. Dispatch duration is kept
under the ~30 s worker limit by sizing iterations per grid.

Writes opx_* keys into R2_TPU_EXTRAS.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..")


def main():
    import jax

    if os.environ.get("OPX_CPU"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from helmnet_tpu.ops.spectral import helmholtz_residual, make_operator

    sizes = [int(s) for s in os.environ.get(
        "OPX_SIZES", "256,512,1024,2048,4096").split(",")]
    out = {}

    for n in sizes:
        op = make_operator(n, n, pml_size=max(8, n // 64), sigma_max=2.0,
                           k0=1.0)
        sos = np.ones((n, n), np.float32)
        sos[n // 4: n // 2, n // 4: 3 * n // 4] = 1.5
        k_sq = jnp.asarray((1.0 / sos) ** 2)
        src = jnp.zeros((n, n, 2), jnp.float32).at[n // 2, n // 2, 0].set(1.0)
        u0 = jnp.zeros((n, n, 2), jnp.float32)
        # keep each dispatch well under the 30 s worker limit
        iters = max(4, min(50, int(2e9 * 30 / (16 * n**3))))

        row = {}
        for mode in ("matmul", "fft"):
            def many(u, k_sq, src, iters=iters, mode=mode):
                def body(c, _):
                    r = helmholtz_residual(op, c, k_sq, src, mode)
                    return r * jnp.float32(0.02), None

                c, _ = jax.lax.scan(body, u, None, length=iters)
                return jnp.sum(c[..., 0] ** 2)

            fn = jax.jit(many)
            try:
                float(fn(u0, k_sq, src))  # compile + warm
            except Exception as e:  # OOM etc. at the largest sizes
                row[mode] = {"error": str(e)[:200]}
                print(f"n={n} {mode}: ERROR {e}", flush=True)
                continue
            reps = 3
            t0 = time.time()
            for _ in range(reps):
                float(fn(u0, k_sq, src))
            dt = (time.time() - t0) / (reps * iters)
            row[mode] = {
                "ms_per_apply": round(dt * 1e3, 3),
                "gridpoints_per_s_M": round(n * n / dt / 1e6, 1),
            }
            print(f"n={n} {mode}: {row[mode]}", flush=True)
        out[f"opx_{n}"] = row

    path = os.path.join(ROOT, "R2_TPU_EXTRAS.json")
    d = json.load(open(path)) if os.path.exists(path) else {}
    d.update(out)
    json.dump(d, open(path, "w"), indent=2)
    print("merged into R2_TPU_EXTRAS.json", flush=True)


if __name__ == "__main__":
    main()
