"""8192^2 two-level FGMRES with Krylov recycling + a coarse-tolerance
schedule — the round-3 verdict's prescription for the 1.34e-2 plateau.

The r3 run (R2_TPU_EXTRAS `helm_8192_twolevel`) showed monotone but
DECELERATING descent under restart-4 FGMRES: every restart truncates the
Krylov space and the near-null cluster must be re-learned. Three levers,
all verdict-prescribed:

1. FGCRO-DR recycling (solvers/fgmres._make_recycled_host_cycle):
   k harmonic-Ritz vectors carried across cycles AND across the budget
   loop's solve calls (recycle_state round-trip). A U^T = C^T depends on
   A alone, so the space stays valid when the preconditioner changes.
2. Coarse-tolerance schedule: loose coarse solves early (cheap cycles
   while the residual is dominated by smooth error), tight late.
   R4_SCHEDULE="c_maxr:frac,..." switches coarse_max_restarts at budget
   fractions; the recycle space survives each switch.
3. Larger outer restart (R4_RESTART=5): donation freed the HBM the r3
   attempt lacked. V+Z+U+C at 8192^2, restart 5, k 2 = 8.1 GB.

Writes `<R4_KEY>` into R2_TPU_EXTRAS.json every solve call (atomic).

Knobs: R4_N (8192), R4_RESTART (5), R4_RECYCLE_K (2), R4_BUDGET_S (9000),
R4_SCHEDULE (1:0,2:0.45,3:0.8), R4_COARSE_RESTART (16), R4_TOL (1e-4),
R4_CYCLES_PER_CALL (2), R4_KEY (helm_8192_recycled).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from _extras import record


def parse_schedule(s):
    out = []
    for part in s.split(","):
        v, frac = part.split(":")
        out.append((int(v), float(frac)))
    out.sort(key=lambda t: t[1])
    return out


def main():
    import jax
    import jax.numpy as jnp

    from helmnet_tpu.core.config import Config
    from helmnet_tpu.ops.source import point_source_map
    from helmnet_tpu.ops.spectral import make_operator
    from helmnet_tpu.solvers.twolevel import solve_fgmres_two_level

    print("devices:", jax.devices(), flush=True)
    cfg = Config()
    n = int(os.environ.get("R4_N", "8192"))
    omega = 1.0
    op = make_operator(n, n, cfg.geometry.pml_size, cfg.geometry.sigma_max,
                       omega, dense=False)
    sos = jnp.ones((n, n), jnp.float32)
    src = jnp.asarray(point_source_map(n, n, (n - 40, n // 2), 10.0, 0.0,
                                       omega))

    restart = int(os.environ.get("R4_RESTART", "5"))
    recycle_k = int(os.environ.get("R4_RECYCLE_K", "2"))
    budget = float(os.environ.get("R4_BUDGET_S", "9000"))
    schedule = parse_schedule(os.environ.get("R4_SCHEDULE", "1:0,2:0.45,3:0.8"))
    c_restart = int(os.environ.get("R4_COARSE_RESTART", "16"))
    tol = float(os.environ.get("R4_TOL", "1e-4"))
    per_call = int(os.environ.get("R4_CYCLES_PER_CALL", "2"))
    key = os.environ.get("R4_KEY", "helm_8192_recycled")

    print(f"n={n} restart={restart} k={recycle_k} schedule={schedule} "
          f"coarse_restart={c_restart} budget={budget}s", flush=True)

    t0 = time.time()
    traj, iters = [], 0
    x0, state = None, None
    phase_log = []

    def snapshot(extra_norms=None):
        cur = list(traj) + (list(extra_norms or [])[1:] if traj
                            else list(extra_norms or []))
        if not cur:
            return
        record(key, {
            "n": n,
            "wavelengths_across": round(n / (2 * np.pi / omega), 1),
            "rel_residual": cur[-1],
            "outer_iterations": (len(cur) - 1) * restart,
            "seconds": round(time.time() - t0, 1),
            "trajectory_every_cycle": [round(v, 8) for v in cur],
            "restart": restart,
            "recycle_k": recycle_k,
            "coarse": {"restart": c_restart, "schedule": phase_log},
            "converged": bool(cur[-1] < tol),
            "note": "two-level CSLP FGMRES + FGCRO-DR recycling + coarse-"
                    "tolerance schedule (r4; see helm_8192_twolevel for "
                    "the r3 baseline trajectory). ONE solve call per "
                    "schedule phase: per-call x-pair round trips cost "
                    "0.5-1.6 GB at 8192^2 and OOMed the 2-calls/cycle "
                    "variant.",
        })
        print(f"  outer {(len(cur) - 1) * restart}: rel {cur[-1]:.3e} "
              f"({time.time() - t0:.0f}s)", flush=True)

    # one solve call per schedule phase — the recycle space and the
    # device-complex solution carry across phases with no pair churn
    for pi, (cmr, frac) in enumerate(schedule):
        start_s = frac * budget
        end_s = (schedule[pi + 1][1] * budget if pi + 1 < len(schedule)
                 else budget)
        now = time.time() - t0
        if now >= end_s or (traj and traj[-1] < tol):
            continue
        phase_log.append({"coarse_max_restarts": cmr,
                          "at_s": round(now, 1),
                          "at_outer": (max(len(traj) - 1, 0)) * restart})
        print(f"  phase: coarse_max_restarts={cmr} "
              f"(budget {end_s - now:.0f}s)", flush=True)
        res = solve_fgmres_two_level(
            op, src, sos, cfg=cfg, smoother="cslp", restart=restart,
            max_restarts=100000, coarse_restart=c_restart,
            coarse_max_restarts=cmr, transfer="spectral", tol=tol,
            x0=x0, host_arnoldi=True, recycle_k=recycle_k,
            recycle_state=state, budget_s=end_s - now,
            on_cycle=snapshot, keep_x_complex=True,
        )
        norms = list(np.asarray(res.residual_norms, np.float64))
        traj.extend(norms[1:] if traj else norms)
        iters = (len(traj) - 1) * restart
        x0 = res.wavefield  # flat device complex (donated into next phase)
        state = res.recycle_state
        snapshot()
        if traj[-1] < tol or not np.isfinite(traj[-1]):
            break


if __name__ == "__main__":
    main()
