"""Classical-GMRES wall-clock baseline at large grids (CPU, f64).

VERDICT round-2 item 3: the ">=10x GMRES wall-clock" BASELINE claim is
evidenced at 96^2 (PERF_NOTES "GMRES": 18x single / 121x batched); the
1024^2/2048^2 solver seconds had no classical comparator. This measures
the CPU f64 restarted-GMRES path (the honest stand-in for the MATLAB
reference solver, matlab/spectral_gmres_solver.m:95-115 — same restart
semantics, same spectral operator, f64) on the SAME problems the TPU
solvers were measured on:

  * 1024^2 far-OOD heterogeneous extended-line-source (r2_fgmres_1024.py
    problem, seeded rng(0))
  * 2048^2 high-wavenumber point source (r2_twolevel_2048.py problem)

Budgeted: runs GMRES(restart) cycles until --budget-s wall-clock or the
1e-4 relative target, whichever first; reports sec/iteration and either
time-to-1e-4 or a LOWER BOUND on it. Writes cpu_gmres_* keys into
R2_TPU_EXTRAS.json.

    nohup timeout 5400 python tools/r3_cpu_gmres_large.py &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..")


def run_case(name, n, sos, src_pair, budget_s, restart=100, tol=1e-4):
    import jax
    import jax.numpy as jnp

    from helmnet_tpu.core.config import Config
    from helmnet_tpu.ops.spectral import make_operator
    from helmnet_tpu.solvers.gmres import gmres_restarted, make_helmholtz_matvec

    cfg = Config()
    op = make_operator(n, n, cfg.geometry.pml_size, cfg.geometry.sigma_max,
                       cfg.k0, dtype=jnp.float64)
    k_sq = (cfg.source.omega / jnp.asarray(sos, jnp.float64)) ** 2
    b = jax.lax.complex(
        jnp.asarray(src_pair[..., 0], jnp.float64),
        jnp.asarray(src_pair[..., 1], jnp.float64),
    )
    mv = make_helmholtz_matvec(op, k_sq, cfg.operator_mode)
    bnorm = float(jnp.linalg.norm(b))

    # one restart cycle per host step so the budget check is responsive
    cycle = jax.jit(lambda bb, x0: gmres_restarted(
        mv, bb, x0=x0, restart=restart, max_restarts=1, tol=0.0))
    x = jnp.zeros_like(b)
    t0 = time.time()
    traj, times, iters = [], [], 0
    while True:
        res = cycle(b, x)
        x = res.x
        iters += restart
        rel = float(res.residual_norms[-1]) / bnorm
        traj.append(rel)
        times.append(round(time.time() - t0, 1))
        print(f"{name}: iter {iters} rel={rel:.3e} ({times[-1]}s)", flush=True)
        if rel < tol or time.time() - t0 > budget_s:
            break
    dt = time.time() - t0
    out = {
        "grid": n,
        "restart": restart,
        "iterations": iters,
        "rel_residual": traj[-1],
        "trajectory": traj,
        "cycle_seconds": times,
        "seconds": round(dt, 1),
        "sec_per_iteration": round(dt / iters, 3),
        "reached_1e-4": traj[-1] < tol,
        "dtype": "complex128",
        "platform": "cpu (4 cores)",
    }
    if not out["reached_1e-4"]:
        out["note"] = (
            f"budget-limited: {iters} iterations in {dt:.0f}s reached "
            f"{traj[-1]:.2e}; time-to-1e-4 LOWER BOUND is the budget"
        )
    return out


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    budget = float(os.environ.get("CG_BUDGET_S", "1200"))
    sizes = os.environ.get("CG_CASES", "1024,2048").split(",")
    out = {}

    if "1024" in sizes:
        n = 1024
        rng = np.random.default_rng(0)
        sos = np.ones((n, n), np.float32)
        for _ in range(6):
            r0, c0 = rng.integers(n // 8, n - n // 4, 2)
            h, w = rng.integers(n // 16, n // 4, 2)
            sos[r0:r0 + h, c0:c0 + w] = 1.25 + 0.75 * rng.random()
        src = np.zeros((n, n, 2), np.float32)
        src[60, n // 4: 3 * n // 4, 0] = 30.0
        out["cpu_gmres_1024_farood"] = run_case(
            "1024 far-OOD", n, sos, src, budget)

    if "2048" in sizes:
        from helmnet_tpu.ops.source import point_source_map

        n = 2048
        sos = np.ones((n, n), np.float32)
        src = point_source_map(n, n, (n - 40, n // 2), 10.0, 0.0, 1.0)
        out["cpu_gmres_2048_highk"] = run_case(
            "2048 high-k", n, sos, np.asarray(src), budget)

    path = os.path.join(ROOT, "R2_TPU_EXTRAS.json")
    d = json.load(open(path)) if os.path.exists(path) else {}
    d.update(out)
    json.dump(d, open(path, "w"), indent=2)
    print("merged into R2_TPU_EXTRAS.json", flush=True)


if __name__ == "__main__":
    main()
