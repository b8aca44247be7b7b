"""Adjudicate learned vs classical at 512^2 and 1024^2 — terminal quality.

Round-3 verdict item 2: tpu_r3b512 / tpu_r3c1024 were selected under a
100-iteration RANKING budget; the paper's core claim (learned beats
classical) was proven at 96^2 and assumed at the trained scales. This
tool settles it per size:

  learned: terminal-quality chunked rollout (LG_ITERS, default 3000)
    over the held-out val maps of the size's own training dataset,
    best-iterate tracking; per-map best residual RMSE -> relative
    residual, batch wall-clock.
  CSLP-GMRES: host-chunked cycles per map to the learned median
    relative residual (matched accuracy), wall-clock + iterations.
  two-level: same target, on the maps where CSLP stalls (skipped when
    CSLP converges everywhere — it is 3x slower when CSLP works,
    twolevel_2048_highk).

Writes results/adjudication_<size>.json. Knobs: LG_SIZE (512|1024),
LG_ITERS, LG_MAPS (cap), LG_BATCH, LG_CHUNK (rollout chunk), LG_BUDGET_S
(classical per-map budget).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..")


def main():
    import jax
    import jax.numpy as jnp

    from helmnet_tpu.solvers.gmres import solve_helmholtz_chunked
    from helmnet_tpu.solvers.iterative import IterativeSolver
    from helmnet_tpu.solvers.twolevel import solve_fgmres_two_level

    size = int(os.environ.get("LG_SIZE", "512"))
    iters = int(os.environ.get("LG_ITERS", "3000"))
    chunk = int(os.environ.get("LG_CHUNK", "250"))
    budget = float(os.environ.get("LG_BUDGET_S", "600"))
    # global wall budget: the queue runs this under `timeout`; results
    # must be ON DISK before that fires (the r4 lesson) — stages check
    # the clock and record what was not run instead of dying silently
    total_budget = float(os.environ.get("LG_TOTAL_BUDGET_S", "2400"))
    t_start = time.time()
    # LG_TAG overrides the default size->checkpoint mapping (e.g. to
    # re-adjudicate a continued training run); results then go to
    # adjudication_<size>_<tag>.json so the default artifact survives
    tag = os.environ.get("LG_TAG") or \
        {512: "tpu_r3b512", 1024: "tpu_r3c1024"}[size]
    suffix = f"_{tag}" if os.environ.get("LG_TAG") else ""
    # LG_DATA_TAG: evaluate `tag`'s checkpoint on ANOTHER tag's held-out
    # maps (e.g. the 96^2-trained tpu_r2c resized to 512 on tpu_r3b512's
    # val set — resize-at-inference vs natively-trained comparison)
    data_tag = os.environ.get("LG_DATA_TAG", tag)
    batch = int(os.environ.get("LG_BATCH", "8" if size == 512 else "4"))

    print("devices:", jax.devices(), flush=True)
    with np.load(os.path.join(ROOT, "datasets", data_tag, "maps.npz")) as f:
        val = f["val"]
    cap = int(os.environ.get("LG_MAPS", str(len(val))))
    val = val[:cap]
    print(f"{size}^2: {len(val)} held-out maps, ckpt {tag}", flush=True)

    solver = IterativeSolver.from_orbax_checkpoint(
        os.path.join(ROOT, "checkpoints", tag), best=True
    )
    # the training runs scale the reference 96^2 source location with the
    # grid (tools/train_tpu_run.py); from_orbax restores the DEFAULT cfg
    # (96^2 location), so evaluate at the same scaled location
    scale = size / solver.cfg.geometry.domain_size
    loc = tuple(int(round(c * scale)) for c in solver.cfg.source.location)
    solver.set_domain_size(size, source_location=loc)
    cfg = solver.cfg
    src_pair = np.asarray(solver.source[0])
    src_norm = float(np.linalg.norm(src_pair.ravel()))

    # incremental atomic writes: every stage lands on disk as it
    # completes, so a timeout can truncate but never erase the run
    path = os.path.join(ROOT, "results",
                        f"adjudication_{size}{suffix}.json")
    # NOTE: named `report`, NOT `out` — the learned loop below binds
    # `out = solver.forward(...)`; shadowing the status dict with a
    # pytree of device arrays crashed the first 512^2 run at flush()
    report = {
        "size": size, "checkpoint": tag, "n_maps": len(val),
        "protocol": f"held-out val maps of the {size}^2 training dataset, "
                    f"learned {iters}-iteration chunked rollout vs "
                    f"classical at matched accuracy (learned median rel "
                    f"residual as tol)",
        "complete": False,
    }

    def flush():
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(report, f, indent=2)
        os.replace(tmp, path)

    flush()

    # ---- learned: terminal-quality chunked rollout ----------------------
    rows = []
    t0 = time.time()
    for start in range(0, len(val), batch):
        sos = jnp.asarray(val[start:start + batch], jnp.float32)
        out = solver.forward(
            sos, num_iterations=iters, collect=("rmse", "best"),
            chunk_iterations=chunk,
        )
        best = np.asarray(out["best_rmse"])
        rows.extend(float(b) for b in best)
        print(f"  learned {start + len(sos)}/{len(val)}: "
              f"median best rmse {np.median(best):.3e} "
              f"({time.time() - t0:.0f}s)", flush=True)
    learned_wall = time.time() - t0
    rmse = np.asarray(rows)
    # rmse = ||r||/sqrt(2 H W)  ->  rel = ||r||/||s||
    rel = rmse * np.sqrt(2.0 * size * size) / src_norm
    learned = {
        "iterations": iters,
        "best_rmse_median": float(np.median(rmse)),
        "best_rmse_max": float(rmse.max()),
        "rel_residual_median": float(np.median(rel)),
        "rel_residual_max": float(rel.max()),
        "wall_s_total": round(learned_wall, 1),
        "wall_s_per_map": round(learned_wall / len(val), 2),
        "batch": batch,
    }
    print("learned:", json.dumps(learned), flush=True)
    report["learned"] = learned
    flush()

    target = max(float(np.median(rel)), 1e-6)

    # ---- CSLP-GMRES to matched accuracy ---------------------------------
    cslp_rows = []
    skipped_for_budget = []
    for i, m in enumerate(val):
        if time.time() - t_start > total_budget:
            skipped_for_budget = list(range(i, len(val)))
            print(f"  cslp: global budget reached, maps {i}..{len(val)-1}"
                  " not run", flush=True)
            break
        sos = jnp.asarray(m, jnp.float32)
        k_sq = (cfg.source.omega / sos) ** 2
        t1 = time.time()
        res = solve_helmholtz_chunked(
            solver.op, k_sq, jnp.asarray(src_pair), mode=cfg.operator_mode,
            restart=25, max_cycles=400, tol=target,
            precond="shifted_laplace", budget_s=budget,
        )
        norms = np.asarray(res.residual_norms)
        cslp_rows.append({
            "map": i,
            "rel_residual": float(norms[-1]),
            "iterations": int(np.asarray(res.iterations)),
            "wall_s": round(time.time() - t1, 1),
            "reached_target": bool(norms[-1] <= target * 1.05),
        })
        print(f"  cslp {i + 1}/{len(val)}: rel {norms[-1]:.3e} "
              f"({cslp_rows[-1]['iterations']} its, "
              f"{cslp_rows[-1]['wall_s']}s)", flush=True)
        report["cslp_partial"] = cslp_rows
        flush()
    reached = [r for r in cslp_rows if r["reached_target"]]
    cslp = {
        "target_rel": target,
        "reached": len(reached),
        "n": len(cslp_rows),
        "skipped_for_budget": skipped_for_budget,
        "wall_s_per_map_median": float(np.median(
            [r["wall_s"] for r in reached])) if reached else None,
        "iters_median": float(np.median(
            [r["iterations"] for r in reached])) if reached else None,
        "per_map": cslp_rows,
    }
    print("cslp:", json.dumps({k: cslp[k] for k in list(cslp)[:6]}),
          flush=True)
    report["cslp"] = cslp
    report.pop("cslp_partial", None)
    flush()

    # ---- two-level on CSLP stallers only --------------------------------
    twolevel = None
    stallers = [r["map"] for r in cslp_rows if not r["reached_target"]]
    if stallers and time.time() - t_start < total_budget:
        tl_rows = []
        for i in stallers:
            if time.time() - t_start > total_budget:
                print(f"  twolevel: global budget reached at map {i}",
                      flush=True)
                break
            sos = jnp.asarray(val[i], jnp.float32)
            t1 = time.time()
            res = solve_fgmres_two_level(
                solver.op, jnp.asarray(src_pair), sos, cfg=cfg,
                smoother="cslp", restart=8, max_restarts=40,
                coarse_restart=16, coarse_max_restarts=2,
                transfer="spectral", tol=target, host_arnoldi=True,
                budget_s=max(total_budget - (time.time() - t_start), 60),
            )
            norms = np.asarray(res.residual_norms)
            tl_rows.append({
                "map": i, "rel_residual": float(norms[-1]),
                "outer_iterations": int(res.iterations),
                "wall_s": round(time.time() - t1, 1),
            })
            print(f"  twolevel map {i}: rel {norms[-1]:.3e} "
                  f"({tl_rows[-1]['wall_s']}s)", flush=True)
            report["twolevel_on_stallers"] = tl_rows
            flush()
        twolevel = tl_rows

    report["twolevel_on_stallers"] = twolevel
    if reached and learned["wall_s_per_map"] > 0:
        report["cslp_vs_learned_wall_ratio"] = round(
            cslp["wall_s_per_map_median"] / learned["wall_s_per_map"], 2
        )
    report["complete"] = not skipped_for_budget
    flush()
    print(json.dumps({k: v for k, v in report.items()
                      if k not in ("cslp",)}, indent=2, default=str),
          flush=True)


if __name__ == "__main__":
    main()
