"""8192^2 two-level FGMRES on one chip: the method the measured plateau
calls for.

R2_TPU_EXTRAS.json `helm_8192_capability` records that restart-4 CSLP-GMRES
flattens at 5.6e-2 at ~1300 wavelengths — the HBM-bounded Krylov space
cannot resolve the near-null cluster. The multilevel analysis (solvers/
twolevel.make_multilevel_preconditioner) shows the depth limit at the JCP
discretization (~6.3 points/wavelength) is TWO levels, so the right tool
here is the two-level cycle: CSLP smoother + factor-2 spectral coarse
correction (4096^2, solved inexactly by CSLP-GMRES) under a host-Arnoldi
flexible outer iteration — one bounded dispatch per outer Krylov step,
V/Z bases device-resident ((2*restart+1) * 0.54 GB; restart<=4 fits
alongside the coarse-level transients).

Writes `helm_8192_twolevel` into R2_TPU_EXTRAS.json.

Env knobs: TL8192_RESTART (4), TL8192_BUDGET_S (3600), TL8192_COARSE_RESTART
(16), TL8192_COARSE_MAXR (2), TL8192_TOL (1e-4).
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
    data = {}
    if os.path.exists(EXTRAS):
        with open(EXTRAS) as f:
            data = json.load(f)
    data[key] = value
    # atomic: a SIGTERM mid-dump must not truncate prior recorded results
    tmp = EXTRAS + ".tmp"
    with open(tmp, "w") as f:
        json.dump(data, f, indent=2)
    os.replace(tmp, EXTRAS)
    print(f"recorded {key}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from helmnet_tpu.core.config import Config
    from helmnet_tpu.ops.source import point_source_map
    from helmnet_tpu.ops.spectral import make_operator
    from helmnet_tpu.solvers.twolevel import solve_fgmres_two_level

    print("devices:", jax.devices(), flush=True)
    cfg = Config()
    n, omega = 8192, 1.0  # ~1300 wavelengths across
    op = make_operator(n, n, cfg.geometry.pml_size, cfg.geometry.sigma_max,
                       omega, dense=False)  # fft-only: no [N,N] tables
    sos = jnp.ones((n, n), jnp.float32)
    src = jnp.asarray(point_source_map(n, n, (n - 40, n // 2), 10.0, 0.0,
                                       omega))

    restart = int(os.environ.get("TL8192_RESTART", "4"))
    budget = float(os.environ.get("TL8192_BUDGET_S", "3600"))
    c_restart = int(os.environ.get("TL8192_COARSE_RESTART", "16"))
    c_maxr = int(os.environ.get("TL8192_COARSE_MAXR", "2"))
    tol = float(os.environ.get("TL8192_TOL", "1e-4"))

    key = os.environ.get("TL8192_KEY", "helm_8192_twolevel")

    t0 = time.time()
    traj, iters = [], 0
    x0 = None
    # budgeted host loop: a few outer cycles per call, warm-started — the
    # jitted cycle/step executables are cache hits after the first call
    while time.time() - t0 < budget:
        res = solve_fgmres_two_level(
            op, src, sos, cfg=cfg, smoother="cslp", restart=restart,
            max_restarts=4, coarse_restart=c_restart,
            coarse_max_restarts=c_maxr, transfer="spectral", tol=tol,
            x0=x0, host_arnoldi=True,
        )
        norms = list(np.asarray(res.residual_norms, np.float64))
        traj.extend(norms[1:] if traj else norms)
        iters += int(res.iterations)
        x0 = res.wavefield
        print(f"  outer {iters}: rel {traj[-1]:.3e} "
              f"({time.time() - t0:.0f}s)", flush=True)
        # record every cycle: a timeout kill must not lose the trajectory
        record(key, {
            "wavelengths_across": round(n / (2 * np.pi / omega), 1),
            "rel_residual": traj[-1],
            "outer_iterations": iters,
            "seconds": round(time.time() - t0, 1),
            "trajectory_every_cycle": [round(v, 8) for v in traj],
            "restart": restart,
            "coarse": {"restart": c_restart, "max_restarts": c_maxr},
            "converged": bool(traj[-1] < tol),
            "note": "two-level CSLP-smoother FGMRES, host-Arnoldi (one "
                    "dispatch per outer step), fft operators both levels, "
                    "spectral transfer; the depth-2 hierarchy is the max "
                    "valid at ~6.3 ppw (see make_multilevel_preconditioner)",
        })
        if traj[-1] < tol:
            break


if __name__ == "__main__":
    main()
