"""3D two-level vs CSLP on a heterogeneous 256^3 problem (one chip).

The recorded 256^3 full solve (`helm3d_cslp_gmres_256cubed`) is a
homogeneous medium — CSLP's best case (the constant-coefficient shifted
Laplacian IS the medium there). This tool measures the regime the 3D
two-level solver (solvers/twolevel3d.py) was built for: a strong-contrast
heterogeneous volume (~41 wavelengths across, sos 1 -> up to 2 in an
embedded block), comparing

  * CSLP-GMRES, host-chunked restart cycles (the 3D classical default),
  * two-level FGMRES: CSLP smoother + factor-2 rediscretized spectral
    coarse correction, host-Arnoldi (one bounded dispatch per outer step).

Writes `helm3d_twolevel_256` into R2_TPU_EXTRAS.json with both
trajectories (iterations + seconds to the common tolerance).

Env: TL3D_N (256), TL3D_TOL (1e-4), TL3D_BUDGET_S (900 per method),
TL3D_RESTART (8), TL3D_CSLP_RESTART (15).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..")
EXTRAS = os.path.join(ROOT, "R2_TPU_EXTRAS.json")


def record(key, value):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _extras import record as _record
    _record(key, value, path=EXTRAS)


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
    from helmnet_tpu.solvers.twolevel3d import solve_fgmres_two_level3d

    print("devices:", jax.devices(), flush=True)
    cfg = Config()
    n = int(os.environ.get("TL3D_N", "256"))
    tol = float(os.environ.get("TL3D_TOL", "1e-4"))
    budget = float(os.environ.get("TL3D_BUDGET_S", "900"))
    restart = int(os.environ.get("TL3D_RESTART", "8"))
    cslp_restart = int(os.environ.get("TL3D_CSLP_RESTART", "15"))
    omega = 1.0

    op = make_operator3d(n, n, n, cfg.geometry.pml_size,
                         cfg.geometry.sigma_max, omega)
    rng = np.random.default_rng(11)
    sos = np.ones((n, n, n), np.float32)
    a, b = n // 3, 2 * n // 3
    sos[a:b, a:b, a:b] = 1.0 + rng.random((b - a,) * 3).astype(np.float32)
    k_sq = jnp.asarray((omega / sos) ** 2)
    src = jnp.asarray(point_source_map3d(n, n, n, (n - 20, n // 2, n // 2),
                                         10.0, 0.0, omega))
    src_norm = float(np.asarray(jnp.sqrt(jnp.sum(src ** 2))))

    # --- CSLP, host-chunked restart cycles --------------------------------
    @jax.jit
    def neg_residual(u):
        r = helmholtz_residual3d(op, u[None], k_sq[None], src[None],
                                 "matmul")[0]
        return -r, jnp.sqrt(jnp.sum(r ** 2))

    t0 = time.time()
    u = jnp.zeros(src.shape, jnp.float32)
    hist, its = [], 0
    while True:
        b_eff, rn = neg_residual(u)
        hist.append(float(np.asarray(rn)) / src_norm)
        print(f"  [cslp] it {its}: rel {hist[-1]:.3e} "
              f"({time.time() - t0:.0f}s)", flush=True)
        if hist[-1] < tol or time.time() - t0 > budget:
            break
        r = solve_helmholtz3d(op, k_sq, b_eff, restart=cslp_restart,
                              max_restarts=1, tol=1e-12,
                              precond="shifted_laplace")
        u = u + r.x
        its += cslp_restart
        del r
    cslp_out = {"rel_residual": hist[-1], "iterations": its,
                "seconds": round(time.time() - t0, 1),
                "trajectory": [round(v, 8) for v in hist],
                "restart": cslp_restart}

    # --- two-level FGMRES, host-Arnoldi ----------------------------------
    t0 = time.time()
    traj, outers = [], 0
    x0 = None
    while True:
        res = solve_fgmres_two_level3d(
            op, src, k_sq, k0=omega, pml_size=cfg.geometry.pml_size,
            sigma_max=cfg.geometry.sigma_max, restart=restart,
            max_restarts=4, coarse_restart=16, coarse_max_restarts=2,
            tol=tol, x0=x0, host_arnoldi=True,
        )
        norms = list(np.asarray(res.residual_norms, np.float64))
        traj.extend(norms[1:] if traj else norms)
        outers += int(res.iterations)
        x0 = res.wavefield
        print(f"  [two-level] outer {outers}: rel {traj[-1]:.3e} "
              f"({time.time() - t0:.0f}s)", flush=True)
        if traj[-1] < tol or time.time() - t0 > budget:
            break
    two_out = {"rel_residual": traj[-1], "outer_iterations": outers,
               "seconds": round(time.time() - t0, 1),
               "trajectory_every_cycle": [round(v, 8) for v in traj],
               "restart": restart}

    record("helm3d_twolevel_256", {
        "n": n, "tol": tol,
        "wavelengths_across": round(n / (2 * np.pi / omega), 1),
        "contrast": "embedded block sos 1 -> 2 (k^2 4x)",
        "cslp": cslp_out,
        "two_level": two_out,
    })


if __name__ == "__main__":
    main()
