"""Hybrid handoff at 1024^2: learned warm start -> host-chunked CSLP.

The r5 1024^2 resize adjudication (results/adjudication_1024_tpu_r2c.json)
found the resized r2c rollout scale-stable in QUALITY (median best rmse
1.18e-5, 8/8, flat 47 s/map) but floored at rel 1.7e-3 — it cannot
certify the default tol 1e-4, so the policy keeps 1024^2 classical.
This measures the obvious composition the framework now supports
(solve_helmholtz_chunked(x0=...), the large-grid analog of
solvers/hybrid.solve_hybrid): hand the learned best-iterate to CSLP as
the initial defect-correction iterate and close 1.7e-3 -> 1e-4, vs the
cold CSLP solve to 1e-4 on the same maps.

Per held-out map (same protocol/maps as the adjudication):
  hybrid:  learned rollout (batched, amortized) + CSLP from x0 to 1e-4
  cold:    CSLP from zero to 1e-4
Decision metric: median total wall/map (hybrid includes its amortized
learned-share) and reached-tol robustness.

Writes results/hybrid_1024.json incrementally (atomic; a timeout can
truncate but never erase). Chip job:
    timeout 2700 python tools/r5_hybrid_1024.py
Knobs: HY_MAPS (8), HY_ITERS (3000), HY_BUDGET_S (per-map classical,
300), HY_TOTAL_BUDGET_S (2100), HY_TOL (1e-4).
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

    size = 1024
    iters = int(os.environ.get("HY_ITERS", "3000"))
    tol = float(os.environ.get("HY_TOL", "1e-4"))
    budget = float(os.environ.get("HY_BUDGET_S", "300"))
    total_budget = float(os.environ.get("HY_TOTAL_BUDGET_S", "2100"))
    t_start = time.time()

    print("devices:", jax.devices(), flush=True)
    with np.load(os.path.join(ROOT, "datasets", "tpu_r3c1024",
                              "maps.npz")) as f:
        val = f["val"]
    cap = int(os.environ.get("HY_MAPS", "8"))
    val = val[:cap]

    solver = IterativeSolver.from_orbax_checkpoint(
        os.path.join(ROOT, "checkpoints", "tpu_r2c"), best=True)
    scale = size / solver.cfg.geometry.domain_size
    loc = tuple(int(round(c * scale)) for c in solver.cfg.source.location)
    solver.set_domain_size(size, source_location=loc)
    cfg = solver.cfg
    src_pair = jnp.asarray(np.asarray(solver.source[0]))

    path = os.path.join(ROOT, "results", "hybrid_1024.json")
    report = {
        "size": size, "checkpoint": "tpu_r2c (resized)", "n_maps": len(val),
        "tol": tol,
        "protocol": "same held-out maps as adjudication_1024_tpu_r2c; "
                    "hybrid = batched learned rollout best-iterate handed "
                    "to host-chunked CSLP as x0 (defect correction), vs "
                    "cold CSLP, both to tol",
        "complete": False,
    }

    def flush():
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(report, f, indent=2)
        os.replace(tmp, path)

    flush()

    # ---- learned stage (batched, amortized across maps) -----------------
    batch = 4
    warm_fields = []  # on-device [H, W, 2] per map
    t0 = time.time()
    rmse_rows = []
    for start in range(0, len(val), batch):
        sos = jnp.asarray(val[start:start + batch], jnp.float32)
        out = solver.forward(sos, num_iterations=iters,
                             collect=("rmse", "best"),
                             chunk_iterations=250)
        for b in range(sos.shape[0]):
            warm_fields.append(out["best_wavefield"][b])
        rmse_rows.extend(float(x) for x in np.asarray(out["best_rmse"]))
        print(f"  learned {start + int(sos.shape[0])}/{len(val)} "
              f"({time.time() - t0:.0f}s)", flush=True)
    learned_wall = time.time() - t0
    learned_share = learned_wall / len(val)
    report["learned"] = {
        "iterations": iters, "wall_s_total": round(learned_wall, 1),
        "wall_s_per_map": round(learned_share, 2),
        "best_rmse_median": float(np.median(rmse_rows)),
    }
    flush()

    # ---- hybrid continuation + cold control, per map --------------------
    rows = []
    for i, m in enumerate(val):
        if time.time() - t_start > total_budget:
            report["skipped_for_budget"] = list(range(i, len(val)))
            print(f"  budget reached, maps {i}.. not run", flush=True)
            break
        k_sq = (cfg.source.omega / jnp.asarray(m, jnp.float32)) ** 2
        row = {"map": i}
        for name, x0 in (("hybrid", warm_fields[i]), ("cold", None)):
            t1 = time.time()
            res = solve_helmholtz_chunked(
                solver.op, k_sq, src_pair, mode=cfg.operator_mode,
                restart=25, max_cycles=400, tol=tol,
                precond="shifted_laplace", budget_s=budget, x0=x0)
            norms = np.asarray(res.residual_norms)
            row[name] = {
                "rel_initial": float(norms[0]),
                "rel_final": float(norms[-1]),
                "iterations": int(np.asarray(res.iterations)),
                "wall_s": round(time.time() - t1, 1),
                "reached_tol": bool(norms[-1] <= tol * 1.05),
            }
            del res
        row["hybrid"]["wall_s_total_incl_learned_share"] = round(
            row["hybrid"]["wall_s"] + learned_share, 1)
        rows.append(row)
        report["per_map"] = rows
        flush()
        print(f"  map {i}: hybrid {row['hybrid']['wall_s']}s"
              f" (+{learned_share:.0f}s learned, from rel "
              f"{row['hybrid']['rel_initial']:.1e}) vs cold "
              f"{row['cold']['wall_s']}s — both to "
              f"{row['hybrid']['rel_final']:.1e}/"
              f"{row['cold']['rel_final']:.1e}", flush=True)

    done = [r for r in rows if r["hybrid"]["reached_tol"]
            and r["cold"]["reached_tol"]]
    if done:
        report["summary"] = {
            "n_both_reached": len(done),
            "hybrid_wall_median_incl_learned": float(np.median(
                [r["hybrid"]["wall_s_total_incl_learned_share"]
                 for r in done])),
            "hybrid_continuation_wall_median": float(np.median(
                [r["hybrid"]["wall_s"] for r in done])),
            "cold_wall_median": float(np.median(
                [r["cold"]["wall_s"] for r in done])),
            "hybrid_iters_median": float(np.median(
                [r["hybrid"]["iterations"] for r in done])),
            "cold_iters_median": float(np.median(
                [r["cold"]["iterations"] for r in done])),
        }
        s = report["summary"]
        s["hybrid_speedup_incl_learned"] = (
            s["cold_wall_median"] / s["hybrid_wall_median_incl_learned"])
        print("summary:", json.dumps(report["summary"]), flush=True)
    report["complete"] = "skipped_for_budget" not in report
    flush()
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
