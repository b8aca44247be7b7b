"""3D Helmholtz capability measurement on the real TPU chip.

Run after training jobs finish (the tunneled worker is single-tenant):

    timeout 1800 python tools/r3_3d_tpu.py

1. 3D spectral residual throughput at 256^3 (matmul + fft modes),
   gridpoints/s with the scalar-fetch timing methodology (full-array
   fetches over the tunnel corrupt per-iteration numbers).
2. 3D CSLP-GMRES solve at 128^3 heterogeneous (~20 wavelengths/axis):
   relative residual + wall time, host-chunked restart cycles so no
   single dispatch exceeds the ~30 s worker limit.

Writes results into R2_TPU_EXTRAS.json (keys helm3d_*).
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

    if os.environ.get("H3D_CPU"):  # CPU smoke-test escape hatch
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from helmnet_tpu.ops.spectral3d import (
        helmholtz_residual3d,
        make_operator3d,
        point_source_map3d,
    )
    from helmnet_tpu.solvers.helm3d import (
        make_helmholtz_matvec3d,
        make_shifted_laplace_inverse3d,
    )
    from helmnet_tpu.solvers.gmres import gmres_restarted

    out = {}

    # --- 1. residual throughput at 256^3 ---------------------------------
    n = int(os.environ.get("H3D_N", "256"))
    pml, omega = 8, 1.0
    op = make_operator3d(n, n, n, pml, 2.0, omega)
    sos = np.ones((n, n, n), np.float32)
    sos[n // 4 : n // 2, n // 4 : 3 * n // 4, n // 4 : 3 * n // 4] = 1.5
    k_sq = jnp.asarray((omega / sos) ** 2)
    src = jnp.asarray(point_source_map3d(n, n, n, (n - 24, n // 2, n // 2), 10.0))
    u0 = jnp.zeros((n, n, n, 2), jnp.float32)

    for mode in ("matmul", "fft"):
        def many(u, iters=20, mode=mode):
            def body(c, _):
                r = helmholtz_residual3d(op, c, k_sq, src, mode)
                # rescale so iterated residuals neither overflow nor vanish
                return r * jnp.float32(0.02), None

            c, _ = jax.lax.scan(body, u, None, length=iters)
            return jnp.sum(c[..., 0] ** 2)  # scalar fetch forces completion

        fn = jax.jit(many)
        float(fn(u0))  # compile + warm
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            float(fn(u0))
        dt = (time.time() - t0) / (reps * 20)
        out[f"helm3d_residual_{n}cubed_{mode}"] = {
            "ms_per_apply": round(dt * 1e3, 2),
            "gridpoints_per_s": round(n**3 / dt / 1e6, 1),
            "unit": "Mgp/s",
        }
        print(out[f"helm3d_residual_{n}cubed_{mode}"], flush=True)

    # --- 2. CSLP-GMRES at 128^3, host-chunked cycles ----------------------
    m = int(os.environ.get("H3D_SOLVE_N", "128"))
    omega_s = float(os.environ.get("H3D_OMEGA", "1.0"))
    op_s = make_operator3d(m, m, m, pml, 2.0, omega_s)
    sos_s = np.ones((m, m, m), np.float32)
    sos_s[m // 4 : m // 2, m // 4 : 3 * m // 4, m // 4 : 3 * m // 4] = 1.8
    k_sq_s = jnp.asarray((omega_s / sos_s) ** 2)
    src_s = point_source_map3d(m, m, m, (m - 16, m // 2, m // 2), 10.0)
    b = jnp.asarray(src_s[..., 0]) + 0.0  # build complex on device
    bi = jnp.asarray(src_s[..., 1])

    mv = make_helmholtz_matvec3d(op_s, k_sq_s)
    minv = make_shifted_laplace_inverse3d(op_s, k_sq_s)

    @jax.jit
    def cycle(xr, xi, br, bi):
        bc = jax.lax.complex(br, bi)
        x0 = jax.lax.complex(xr, xi)
        res = gmres_restarted(
            lambda v: mv(minv(v)), bc, x0=x0,
            restart=20, max_restarts=2, tol=1e-12,
        )
        return res.x.real, res.x.imag, res.residual_norms[-1]

    bnorm = float(np.linalg.norm(src_s))
    xr = jnp.zeros((m, m, m), jnp.float32)
    xi = jnp.zeros((m, m, m), jnp.float32)
    t0 = time.time()
    traj = []
    cycles = int(os.environ.get("H3D_CYCLES", "15"))
    for i in range(cycles):
        xr, xi, rn = cycle(xr, xi, b, bi)
        rel = float(rn) / bnorm
        traj.append(rel)
        print(f"cycle {i}: rel={rel:.3e} ({time.time()-t0:.0f}s)", flush=True)
        if rel < 1e-5:
            break
    # xr, xi are the PRECONDITIONED variable y; x = M^-1 y
    xc = np.asarray(jax.jit(lambda r, i: jnp.stack([
        minv(jax.lax.complex(r, i)).real, minv(jax.lax.complex(r, i)).imag
    ]))(xr, xi))
    out[f"helm3d_cslp_gmres_{m}cubed"] = {
        "rel_residual": traj[-1],
        "trajectory": traj,
        "inner_iterations": 40 * len(traj),
        "seconds": round(time.time() - t0, 1),
        "omega": omega_s,
        "solution_max": float(np.abs(xc).max()),
    }
    print(out[f"helm3d_cslp_gmres_{m}cubed"], flush=True)

    path = os.path.join(ROOT, "R2_TPU_EXTRAS.json")
    d = json.load(open(path)) if os.path.exists(path) else {}
    d.update(out)
    json.dump(d, open(path, "w"), indent=2)
    print("merged into R2_TPU_EXTRAS.json", flush=True)


if __name__ == "__main__":
    main()
