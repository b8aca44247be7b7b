"""256^3 CSLP-GMRES capability run (host-chunked restart cycles).

Extends the 3D classical-solver capability one octave past the recorded
128^3 run (`helm3d_cslp_gmres_128cubed`): a 16.8M-gridpoint volume
(~41 wavelengths across at omega=1) solved on one chip with the
fft-free per-axis-matmul operator inside the matvec and the 3D
shifted-Laplace preconditioner. One bounded device call per restart
cycle (the tunneled worker crashes past ~30 s dispatches). Writes
`helm3d_cslp_gmres_256cubed` into R2_TPU_EXTRAS.json.

Env: C256_BUDGET_S (default 900), C256_RESTART (default 15),
C256_TOL (default 1e-4).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..")
EXTRAS = os.path.join(ROOT, "R2_TPU_EXTRAS.json")


def main():
    import jax
    import jax.numpy as jnp

    from helmnet_tpu.core.config import Config
    from helmnet_tpu.ops.spectral3d import (
        helmholtz_residual3d,
        make_operator3d,
        point_source_map3d,
    )
    from helmnet_tpu.solvers.helm3d import solve_helmholtz3d

    cfg = Config()
    n, omega = 256, 1.0
    op = make_operator3d(n, n, n, cfg.geometry.pml_size,
                         cfg.geometry.sigma_max, omega)
    k_sq = jnp.full((n, n, n), omega**2)
    src = jnp.asarray(point_source_map3d(n, n, n, (n - 20, n // 2, n // 2),
                                         10.0, 0.0, omega))

    @jax.jit
    def neg_residual(u):
        r = helmholtz_residual3d(op, u[None], k_sq[None], src[None],
                                 mode="matmul")[0]
        return -r, jnp.sqrt(jnp.mean(r**2))

    src_norm = float(np.asarray(jnp.sqrt(jnp.mean(src**2))))
    budget = float(os.environ.get("C256_BUDGET_S", "900"))
    restart = int(os.environ.get("C256_RESTART", "15"))
    tol = float(os.environ.get("C256_TOL", "1e-4"))

    t0 = time.time()
    u = jnp.zeros((n, n, n, 2), jnp.float32)
    hist, cycles = [], 0
    while True:
        b_eff, rnorm = neg_residual(u)
        hist.append(float(np.asarray(rnorm)) / src_norm)
        print(f"  cycle {cycles}: rel {hist[-1]:.3e} "
              f"({time.time() - t0:.0f}s)", flush=True)
        if hist[-1] < tol or time.time() - t0 > budget:
            break
        r = solve_helmholtz3d(op, k_sq, b_eff, restart=restart,
                              max_restarts=1, tol=1e-12,
                              precond="shifted_laplace")
        u = u + r.x
        cycles += 1
        del r

    out = {
        "rel_residual": hist[-1],
        "trajectory": hist,
        "iterations": restart * cycles,
        "restart": restart,
        "seconds": round(time.time() - t0, 1),
        "wavelengths_across": round(n / (2 * np.pi / omega), 1),
    }
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _extras import record
    record("helm3d_cslp_gmres_256cubed", out, path=EXTRAS)


if __name__ == "__main__":
    main()
