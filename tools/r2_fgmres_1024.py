"""Learned-preconditioned FGMRES on the far-OOD 1024^2 problem.

The 1024^2 heterogeneous extended-line-source problem defeats both the
raw learned rollout (recurrent-state divergence) and CSLP-GMRES
(constant-coefficient preconditioner: 0.136 -> 0.072 over 1350
iterations). solvers/fgmres.py runs the network INSIDE the Krylov
iteration — short fresh-state medium-aware inner solves — and is the
designed fix. One restart cycle per host step keeps dispatches bounded.

Writes results into R2_TPU_EXTRAS.json (key fgmres_1024).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..")


def main():
    import jax.numpy as jnp

    from helmnet_tpu.solvers.fgmres import solve_fgmres_learned
    from helmnet_tpu.solvers.iterative import IterativeSolver

    ckpt = os.path.join(ROOT, "checkpoints", os.environ.get(
        "HELMNET_CKPT_TAG", "tpu_r2c"))
    solver = IterativeSolver.from_orbax_checkpoint(ckpt)
    n = 1024
    rng = np.random.default_rng(0)
    sos = np.ones((n, n), np.float32)
    for _ in range(6):
        r0, c0 = rng.integers(n // 8, n - n // 4, 2)
        h, w = rng.integers(n // 16, n // 4, 2)
        sos[r0:r0 + h, c0:c0 + w] = 1.25 + 0.75 * rng.random()
    src = np.zeros((n, n, 2), np.float32)
    src[60, n // 4: 3 * n // 4, 0] = 30.0
    solver.set_domain_size(n, source_map=src[None])

    inner = int(os.environ.get("FG_INNER", "20"))
    restart = int(os.environ.get("FG_RESTART", "8"))
    max_restarts = int(os.environ.get("FG_MAX_RESTARTS", "12"))
    host_arnoldi = os.environ.get("FG_HOST_ARNOLDI", "0") == "1"
    mode = os.environ.get("FG_MODE", "learned")  # learned | twolevel
    smoother = os.environ.get("FG_SMOOTHER", "cslp")
    key = os.environ.get("FG_KEY", "fgmres_1024")
    t0 = time.time()
    if mode == "twolevel":
        from helmnet_tpu.solvers.twolevel import solve_fgmres_two_level

        res = solve_fgmres_two_level(
            solver.op, jnp.asarray(src), jnp.asarray(sos), cfg=solver.cfg,
            smoother=smoother, params=solver.params,
            smoother_iterations=inner,
            coarse_restart=int(os.environ.get("FG_COARSE_RESTART", "32")),
            coarse_max_restarts=int(
                os.environ.get("FG_COARSE_MAX_RESTARTS", "2")),
            restart=restart, max_restarts=max_restarts, tol=1e-4,
            host_arnoldi=host_arnoldi, verbose=True,
        )
    else:
        res = solve_fgmres_learned(
            solver.params, solver.op, jnp.asarray(src), jnp.asarray(sos),
            cfg=solver.cfg, inner_iterations=inner, restart=restart,
            max_restarts=max_restarts, tol=1e-4,
            host_arnoldi=host_arnoldi, verbose=True,
        )
    out = {
        "rel_residual": float(np.asarray(res.residual_norms)[-1]),
        "trajectory": [float(x) for x in np.asarray(res.residual_norms)],
        "outer_iterations": int(res.iterations),
        "inner_iterations": inner,
        "restart": restart,
        "mode": mode,
        "host_arnoldi": host_arnoldi,
        "seconds": round(time.time() - t0, 1),
        "cslp_comparison": "0.136 -> 0.072 over 1350 iterations (stalls)",
    }
    print(json.dumps(out, indent=2), flush=True)
    path = os.path.join(ROOT, "R2_TPU_EXTRAS.json")
    d = json.load(open(path)) if os.path.exists(path) else {}
    d[key] = out
    json.dump(d, open(path, "w"), indent=2)
    print("merged into R2_TPU_EXTRAS.json", flush=True)


if __name__ == "__main__":
    main()
