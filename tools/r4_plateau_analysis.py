"""Measured plateau analysis for the depth-2 hierarchy at ~6.3 ppw.

Round-3 verdict item 1's fallback clause: if the 8192^2 solve cannot
reach 1e-3, publish a MEASURED analysis of what limits it. The 8192^2
problem itself costs ~4 s/outer; this runs the controlled experiments at
2048^2 with the SAME discretization density (omega=1 -> ~326 wavelengths
-> 6.28 points/wavelength, identical to 8192^2's 6.3), where a full
sweep fits in minutes:

  A. recycling value: two-level FGMRES restart 3, k in {0, 1, 2, 3},
     fixed coarse effort — does the recycle space fix the
     restart-truncation deceleration, and how does the gain scale in k?
  B. coarse-solve accuracy: k fixed, coarse (restart x max_restarts) in
     {8x1, 16x2, 32x4} — does the convergence floor move with coarse
     accuracy (coarse-solve-limited) or not (hierarchy-limited)?

Writes `plateau_2048` into R2_TPU_EXTRAS.json with per-config
trajectories and fitted per-cycle contraction rates (late-half fit).

Knobs: PA_BUDGET_S per config (240), PA_N (2048).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from _extras import record


def late_rate(traj):
    """Fitted per-cycle contraction factor over the late half."""
    t = np.asarray(traj, float)
    t = t[t > 0]
    h = len(t) // 2
    if len(t) - h < 3:
        return None
    y = np.log(t[h:])
    k = np.arange(len(y))
    slope = np.polyfit(k, y, 1)[0]
    return float(np.exp(slope))


def main():
    import jax

    if os.environ.get("PA_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PA_PLATFORM"])
    import jax.numpy as jnp

    from helmnet_tpu.core.config import Config
    from helmnet_tpu.ops.source import point_source_map
    from helmnet_tpu.ops.spectral import make_operator
    from helmnet_tpu.solvers.twolevel import solve_fgmres_two_level

    print("devices:", jax.devices(), flush=True)
    cfg = Config()
    n = int(os.environ.get("PA_N", "2048"))
    budget = float(os.environ.get("PA_BUDGET_S", "240"))
    omega = 1.0
    op = make_operator(n, n, cfg.geometry.pml_size, cfg.geometry.sigma_max,
                       omega, dense=False)
    sos = jnp.ones((n, n), jnp.float32)
    src = jnp.asarray(point_source_map(n, n, (n - 40, n // 2), 10.0, 0.0,
                                       omega))

    configs = (
        # A: recycling value at fixed coarse effort
        [("k", dict(restart=3, recycle_k=k, coarse_restart=8,
                    coarse_max_restarts=1)) for k in (0, 1, 2)]
        # B: coarse accuracy at fixed k
        + [("coarse", dict(restart=3, recycle_k=1, coarse_restart=cr,
                           coarse_max_restarts=cm))
           for cr, cm in ((16, 2), (32, 4))]
    )
    out = {"n": n, "ppw": round(2 * np.pi / omega, 2),
           "budget_s_per_config": budget, "configs": []}
    for group, kw in configs:
        label = (f"restart{kw['restart']}_k{kw['recycle_k']}_coarse"
                 f"{kw['coarse_restart']}x{kw['coarse_max_restarts']}")
        print(f"--- {label}", flush=True)
        t0 = time.time()
        res = solve_fgmres_two_level(
            op, src, sos, cfg=cfg, smoother="cslp",
            max_restarts=100000, transfer="spectral", tol=1e-5,
            host_arnoldi=True, budget_s=budget, keep_x_complex=True,
            recycle_k=kw["recycle_k"], restart=kw["restart"],
            coarse_restart=kw["coarse_restart"],
            coarse_max_restarts=kw["coarse_max_restarts"],
        )
        traj = [float(v) for v in np.asarray(res.residual_norms)]
        row = {
            "group": group, "label": label, **kw,
            "final_rel": traj[-1],
            "outers": int(res.iterations),
            "seconds": round(time.time() - t0, 1),
            "late_contraction_per_cycle": late_rate(traj),
            "trajectory": [round(v, 8) for v in traj],
        }
        out["configs"].append(row)
        print(f"    rel {traj[-1]:.3e} in {row['outers']} outers "
              f"({row['seconds']}s)  late rate "
              f"{row['late_contraction_per_cycle']}", flush=True)
        record(f"plateau_{n}", out)


if __name__ == "__main__":
    main()
