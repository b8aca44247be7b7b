"""Classical GMRES sweep over the SAME 1000-map JCP test set as the
learned eval (results/summary.json) — the distribution-wide artifact the
">=10x GMRES wall-clock" BASELINE criterion calls for.

Reference counterpart: matlab/parallel_spectral_gmres_solver.m:30-40
(parpool sweep, restart 100, tol 1e-10, max 1000 iterations, solution +
residual checkpoint every restart -> gmres_results.mat). Here the sweep
is one vmapped TPU dispatch per chunk (solvers/gmres.solve_helmholtz_batch)
instead of 8 MATLAB workers; per-cycle residual norms give the
cycles-to-RMSE-1e-4 distribution at the reference's own checkpoint
granularity (100 iterations).

The comparable learned-side numbers (same maps, same source, same
residual-RMSE metric) live in results/summary.json: median 82 iterations
to 1e-4 at ~1 ms/iteration/batch-of-32 (BENCH_r03: 298.8M gps).

Writes results/gmres_sweep_96.json (and the per-map trajectory npy).

Env knobs: SWEEP_CHUNK (50), SWEEP_RESTART (100), SWEEP_CYCLES (10),
SWEEP_LIMIT (1000), SWEEP_PRECOND (none|shifted_laplace).
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

    from helmnet_tpu.core.config import Config
    from helmnet_tpu.ops.source import point_source_map
    from helmnet_tpu.ops.spectral import make_operator
    from helmnet_tpu.solvers.gmres import _arnoldi_cycle, make_helmholtz_matvec
    from helmnet_tpu.solvers.precond import make_shifted_laplace_inverse

    print("devices:", jax.devices(), flush=True)
    cfg = Config()
    g = cfg.geometry
    n = 96
    chunk = int(os.environ.get("SWEEP_CHUNK", "50"))
    restart = int(os.environ.get("SWEEP_RESTART", "100"))
    cycles = int(os.environ.get("SWEEP_CYCLES", "10"))
    limit = int(os.environ.get("SWEEP_LIMIT", "1000"))
    precond = os.environ.get("SWEEP_PRECOND", "none")

    with np.load(os.path.join(ROOT, "datasets/splitted_96/testset.npz")) as f:
        maps = f["maps"][:limit]
    print(f"maps {maps.shape}  restart {restart} x {cycles} cycles "
          f"precond={precond}", flush=True)

    op = make_operator(n, n, g.pml_size, g.sigma_max, cfg.k0, dense=True)
    s = cfg.source
    src = point_source_map(n, n, tuple(s.location), s.amplitude, s.phase,
                           s.omega, 0.0, s.smoothing)
    src = jnp.asarray(src)

    # one restart cycle per dispatch (bounded duration on the tunneled
    # worker; 10 cycles of restart-100 Arnoldi in one dispatch risks the
    # ~30 s single-dispatch crash) with warm-started x between dispatches.
    def one_cycle(k_sq, b, x):
        mv = make_helmholtz_matvec(op, k_sq, "matmul")
        if precond == "shifted_laplace":
            minv = make_shifted_laplace_inverse(op, k_sq, (1.0, 0.5))
            mvf = lambda v: mv(minv(v.reshape(n, n))).reshape(-1)
        else:
            mvf = lambda v: mv(v.reshape(n, n)).reshape(-1)
        x_new = _arnoldi_cycle(mvf, b, x, restart)
        return x_new, jnp.linalg.norm(b - mvf(x_new))

    cycle_batch = jax.jit(jax.vmap(one_cycle))

    @jax.jit
    def init(k_sq_b, src_pair):
        b = jax.lax.complex(src_pair[..., 0], src_pair[..., 1])
        b = b.reshape(b.shape[0], -1)
        z = jnp.zeros(b.shape, jnp.float32)
        x = jax.lax.complex(z, z)
        return b, x, jnp.linalg.norm(b, axis=-1)

    norms_all, wall = [], []
    for start in range(0, len(maps), chunk):
        sos = jnp.asarray(maps[start:start + chunk], jnp.float32)
        k_sq = (s.omega / sos) ** 2
        srcb = jnp.broadcast_to(src, (len(sos),) + src.shape)
        b, x, n0 = init(k_sq, srcb)
        norms = [np.asarray(n0)]
        cyc_wall = []
        for _ in range(cycles):
            t0 = time.time()
            x, rn = cycle_batch(k_sq, b, x)
            rn = np.asarray(rn)  # fetch forces completion
            cyc_wall.append(time.time() - t0)
            norms.append(rn)
        norms = np.stack(norms, axis=1)  # [B, cycles+1]
        wall.append(cyc_wall)
        norms_all.append(norms)
        print(f"  {start + len(sos)}/{len(maps)}  "
              f"{np.sum(cyc_wall):.1f}s ({np.median(cyc_wall):.2f}s/cycle)  "
              f"median final rel {np.median(norms[:, -1] / norms[:, 0]):.2e}",
              flush=True)

    norms = np.concatenate(norms_all, 0)          # [N, cycles+1] 2-norms
    rmse = norms / np.sqrt(2.0 * n * n)           # residual RMSE metric
    # first checkpoint (100-iteration granularity) reaching RMSE 1e-4;
    # the learned eval counts per-iteration, so GMRES gets the BENEFIT of
    # rounding down to its own checkpoint grid? No: first cycle index k
    # with rmse[k] < tol means <= k*100 iterations. Report k*100 (upper
    # bound resolution 100, same as the reference's own artifact).
    tol_rmse = 1e-4
    reached = rmse < tol_rmse
    cyc_to = np.where(reached.any(1), reached.argmax(1), -1)
    ok = cyc_to >= 0
    iters_to = cyc_to[ok] * restart
    # steady-state per-cycle wall: median over every measured cycle
    # (compile cost shows up only in the first cycle of the first chunk)
    all_cycle_walls = np.concatenate([np.asarray(w) for w in wall])
    per_cycle = float(np.median(all_cycle_walls))
    per_map_per_cycle = per_cycle / chunk
    time_to = cyc_to[ok] * per_map_per_cycle

    out = {
        "protocol": (
            f"GMRES(restart={restart}) x {cycles} cycles, tol 1e-10, "
            f"precond={precond}, f32 TPU, vmapped chunks of {chunk}; same "
            "1000 maps/source/residual-RMSE metric as results/summary.json"
        ),
        "n_maps": int(len(maps)),
        "final_rmse_median": float(np.median(rmse[:, -1])),
        "final_rmse_p90": float(np.quantile(rmse[:, -1], 0.9)),
        "final_relres_median": float(np.median(norms[:, -1] / norms[:, 0])),
        "reached_1e-4_count": int(ok.sum()),
        "iters_to_1e-4_median": float(np.median(iters_to)) if ok.any() else None,
        "iters_to_1e-4_p90": float(np.quantile(iters_to, 0.9)) if ok.any() else None,
        "sweep_wall_s_total": round(float(np.sum(all_cycle_walls)), 1),
        "per_map_per_cycle_s": per_map_per_cycle,
        "time_to_1e-4_median_s": float(np.median(time_to)) if ok.any() else None,
        "time_to_1e-4_p90_s": float(np.quantile(time_to, 0.9)) if ok.any() else None,
        "learned_comparison": {
            "source": "results/summary.json (tpu_r2c) + BENCH_r03.json",
            "iters_to_1e-4_median": 82.0,
            "per_map_per_iter_s": 96 * 96 / 298.8e6,
            "time_to_1e-4_median_s": 82 * 96 * 96 / 298.8e6,
        },
    }
    if out["time_to_1e-4_median_s"]:
        out["learned_speedup_at_1e-4_median"] = (
            out["time_to_1e-4_median_s"]
            / out["learned_comparison"]["time_to_1e-4_median_s"]
        )
    os.makedirs(os.path.join(ROOT, "results"), exist_ok=True)
    np.save(os.path.join(ROOT, "results", f"gmres_sweep_96_{precond}_rmse"),
            rmse)
    path = os.path.join(ROOT, "results", "gmres_sweep_96.json")
    data = json.load(open(path)) if os.path.exists(path) else {}
    data[precond] = out
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(data, f, indent=2)
    os.replace(tmp, path)
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
