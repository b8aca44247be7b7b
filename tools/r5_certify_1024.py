"""Who certifies tol 1e-4 at 1024^2 mild contrast? One-map probe.

The hybrid-handoff experiment (results/hybrid_1024.json) found BOTH
cold and warm-started CSLP flatline short of 1e-4 within 400 cycles
(10k iterations, ~70-130 s): the restarted-CSLP tail RATE is the
bottleneck at this size, not the starting residual. This probes the
two candidate fixes on the hardest map (map 0, cold rel 7.6e-4 at 10k
its): (a) just more cycles — CSLP with max_cycles 1600, (b) two-level
FGMRES with the learned smoother (the contrast>1.45 branch's method,
here tried on mild contrast).

Writes results/certify_1024.json. Chip job:
    timeout 1500 python tools/r5_certify_1024.py
Knobs: CF_BUDGET_S (420 per method), CF_MAP (0).
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
    import jax.numpy as jnp

    from helmnet_tpu.solvers.gmres import solve_helmholtz_chunked
    from helmnet_tpu.solvers.iterative import IterativeSolver
    from helmnet_tpu.solvers.twolevel import solve_fgmres_two_level

    size, tol = 1024, 1e-4
    budget = float(os.environ.get("CF_BUDGET_S", "420"))
    imap = int(os.environ.get("CF_MAP", "0"))

    print("devices:", jax.devices(), flush=True)
    with np.load(os.path.join(ROOT, "datasets", "tpu_r3c1024",
                              "maps.npz")) as f:
        sos = f["val"][imap]

    solver = IterativeSolver.from_orbax_checkpoint(
        os.path.join(ROOT, "checkpoints", "tpu_r2c"), best=True)
    scale = size / solver.cfg.geometry.domain_size
    loc = tuple(int(round(c * scale)) for c in solver.cfg.source.location)
    solver.set_domain_size(size, source_location=loc)
    cfg = solver.cfg
    src_pair = jnp.asarray(np.asarray(solver.source[0]))
    k_sq = (cfg.source.omega / jnp.asarray(sos, jnp.float32)) ** 2

    path = os.path.join(ROOT, "results", "certify_1024.json")
    report = {"size": size, "map": imap, "tol": tol, "complete": False}

    def flush():
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(report, f, indent=2)
        os.replace(tmp, path)

    flush()

    # (a) CSLP, 4x the cycle cap
    t0 = time.time()
    res = solve_helmholtz_chunked(
        solver.op, k_sq, src_pair, mode=cfg.operator_mode,
        restart=25, max_cycles=1600, tol=tol,
        precond="shifted_laplace", budget_s=budget, verbose=False)
    norms = np.asarray(res.residual_norms)
    report["cslp_1600cycles"] = {
        "rel_final": float(norms[-1]),
        "iterations": int(np.asarray(res.iterations)),
        "wall_s": round(time.time() - t0, 1),
        "reached_tol": bool(norms[-1] <= tol * 1.05),
        "trajectory_tail": [float(x) for x in norms[-5:]],
    }
    del res
    print("cslp_1600:", json.dumps(report["cslp_1600cycles"]), flush=True)
    flush()

    # (b) two-level FGMRES, learned smoother (the skull-branch method)
    t0 = time.time()
    tl = solve_fgmres_two_level(
        solver.op, src_pair, jnp.asarray(sos, jnp.float32), cfg=cfg,
        smoother="learned", params=solver.params,
        restart=8, max_restarts=60, tol=tol, transfer="spectral",
        coarse_restart=32, coarse_max_restarts=2, host_arnoldi=True,
        budget_s=budget)
    norms = np.asarray(tl.residual_norms)
    report["two_level"] = {
        "rel_final": float(norms[-1]),
        "outer_iterations": int(len(norms) - 1),
        "wall_s": round(time.time() - t0, 1),
        "reached_tol": bool(norms[-1] <= tol * 1.05),
        "trajectory_tail": [float(x) for x in norms[-5:]],
    }
    print("two_level:", json.dumps(report["two_level"]), flush=True)
    report["complete"] = True
    flush()
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
