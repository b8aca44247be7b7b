"""Skull-CT flagship demo at 512^2 THROUGH the policy entry point.

VERDICT r4 #8: the reference's flagship workflow is CT -> medium ->
transcranial solve -> figure (matlab/skull_example.m, produce_figures.py
skull panel). Every piece exists here (data/skull.py, solve_auto,
chunked rollout, CSLP); this runs the whole chain through
`python -m helmnet_tpu.cli.solve` (the policy UX) and attaches the
learned-vs-classical comparison the reference's protocol pairs with it:

  1. synthetic skull CT (synthetic_skull_ct) -> ct_to_medium -> sos map
     + arc transducer source (make_arc_source) saved as npz,
  2. cli.solve --dry-run: the printed plan (method/rationale/evidence),
  3. cli.solve with the 512^2-trained checkpoint (tpu_r3b512): learned
     rollout, wall-clock + residual trajectory,
  4. CSLP-GMRES on the same problem (the classical comparator,
     host-chunked), wall-clock + true-residual trajectory,
  5. figure: sos | learned Re(u) | trajectories, figures_r5/.

Writes results/skull_auto_512.json. Chip job:
    timeout 2400 python tools/r5_skull_auto.py
Knobs: SK_SIZE (512), SK_ITERS (3000), SK_CSLP_BUDGET_S (600).
"""

import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
ROOT = os.path.join(os.path.dirname(__file__), "..")


def main():
    if os.environ.get("SK_PLATFORM"):  # CPU smoke while the chip is busy
        import jax

        jax.config.update("jax_platforms", os.environ["SK_PLATFORM"])
    import numpy as np

    from helmnet_tpu.data.skull import skull_example_problem

    size = int(os.environ.get("SK_SIZE", "512"))
    iters = int(os.environ.get("SK_ITERS", "3000"))
    cslp_budget = float(os.environ.get("SK_CSLP_BUDGET_S", "600"))

    os.makedirs(os.path.join(ROOT, "results"), exist_ok=True)
    os.makedirs(os.path.join(ROOT, "figures_r5"), exist_ok=True)

    sos, source = skull_example_problem(size)
    sos_npz = os.path.join(ROOT, "results", f"skull_sos_{size}.npz")
    src_npz = os.path.join(ROOT, "results", f"skull_src_{size}.npz")
    np.savez_compressed(sos_npz, maps=sos)
    np.savez_compressed(src_npz, source=source)
    out = {
        "size": size,
        "sos_min": float(sos.min()), "sos_max": float(sos.max()),
        "contrast": float(sos.max() / sos.min()),
    }
    print(f"skull medium: sos [{out['sos_min']:.3f}, {out['sos_max']:.3f}]"
          f"  contrast {out['contrast']:.2f}", flush=True)

    from helmnet_tpu.cli import solve as solve_cli

    # default r2c: the 96^2-trained model resized at inference is the
    # shipped learned path at every 2D size <= 512
    # (results/adjudication_512_tpu_r2c.json); under the r5 policy this
    # problem (contrast 2.0 at 512^2) routes two_level with the learned
    # smoother — the CSLP stall this tool measured (rel 0.158 after
    # 2000 its) is exactly the branch evidence
    ckpt = os.path.join(ROOT, "checkpoints",
                        os.environ.get("SK_CKPT", "tpu_r2c"))
    base_argv = ["--sos", sos_npz, "--source-npz", src_npz,
                 "--checkpoint", ckpt, "--tol", "1e-4"]

    # --- 2) the plan, exactly as the CLI prints it --------------------
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        solve_cli.main(base_argv + ["--dry-run"])
    out["plan_printed"] = buf.getvalue()
    print(out["plan_printed"], flush=True)

    # --- 3) the policy solve (learned path expected at 512^2+ckpt) ---
    learned_npz = os.path.join(ROOT, "results", f"skull_auto_{size}.npz")
    t0 = time.time()
    solve_cli.main(base_argv + ["--out", learned_npz])
    t_learned = time.time() - t0
    with np.load(learned_npz, allow_pickle=True) as f:
        wf_learned = f["wavefield"]
        traj_learned = f["trajectory"]
        method = str(f["method"])
    out["policy"] = {
        "method": method,
        "seconds_total_incl_compile": round(t_learned, 1),
        "final_metric": float(traj_learned[np.isfinite(traj_learned)][-1]),
        "trajectory_head": [float(x) for x in traj_learned[:5]],
        "npz": learned_npz,
    }
    print(f"policy ({method}): {t_learned:.1f} s total", flush=True)

    # --- 3b) steady-state wall-clock (executable warm): re-run -------
    import dataclasses

    import jax.numpy as jnp

    from helmnet_tpu.core.config import Config
    from helmnet_tpu.solvers.iterative import IterativeSolver

    cfg = Config()
    cfg = cfg.replace(geometry=dataclasses.replace(
        cfg.geometry, domain_size=size))
    solver = IterativeSolver.from_orbax_checkpoint(ckpt)
    solver.set_domain_size(size, source_map=source[None])
    chunk = min(500, iters)
    decimate = 50 if chunk % 50 == 0 and iters % chunk == 0 else 1
    t0 = time.time()
    fwd = solver.forward(jnp.asarray(sos)[None], num_iterations=iters,
                         decimate=decimate, chunk_iterations=chunk,
                         collect=("rmse", "best"))
    best = float(np.asarray(fwd["best_rmse"])[0])
    rmse_traj = np.asarray(fwd["rmse"])[:, 0]
    t_warm = time.time() - t0
    out["learned_warm"] = {
        "iterations": iters,
        "seconds": round(t_warm, 1),
        "best_rmse": best,
        "final_rmse": float(rmse_traj[-1]),
        "diverged": bool(not np.isfinite(rmse_traj[-1])),
    }
    print(f"learned warm: best rmse {best:.3e} in {t_warm:.1f} s",
          flush=True)

    # --- 4) classical comparator: CSLP-GMRES, host-chunked -----------
    from helmnet_tpu.ops.spectral import make_operator, resolve_mode
    from helmnet_tpu.solvers.gmres import solve_helmholtz_chunked

    g = cfg.geometry
    dense = resolve_mode(cfg.operator_mode, size, size) != "fft"
    op = make_operator(size, size, g.pml_size, g.sigma_max, cfg.k0,
                       dense=dense)
    k_sq = (cfg.source.omega / jnp.asarray(sos, jnp.float32)) ** 2
    t0 = time.time()
    res = solve_helmholtz_chunked(
        op, k_sq, source, mode=cfg.operator_mode,
        precond="shifted_laplace", restart=20, max_cycles=100,
        tol=1e-4, budget_s=cslp_budget, verbose=True,
    )
    t_cslp = time.time() - t0
    norms = np.asarray(res.residual_norms)
    wf_cslp = np.asarray(res.x if hasattr(res, "x") else res.wavefield)
    out["cslp"] = {
        "seconds": round(t_cslp, 1),
        "rel_residual": float(norms[-1] / max(norms[0], 1e-30)),
        "iterations": int(np.asarray(res.iterations)),
        "converged": bool(norms[-1] / max(norms[0], 1e-30) < 1e-4),
    }
    print(f"CSLP: rel {out['cslp']['rel_residual']:.3e} in "
          f"{t_cslp:.1f} s", flush=True)

    # --- comparable metric: source-normalized PDE residual -----------
    from helmnet_tpu.solvers.gmres import make_helmholtz_matvec

    mv = make_helmholtz_matvec(op, k_sq, cfg.operator_mode)

    import jax

    def rel_residual_of(pair):
        u = jax.lax.complex(jnp.asarray(pair[..., 0]),
                            jnp.asarray(pair[..., 1]))
        bc = jax.lax.complex(jnp.asarray(source[..., 0]),
                             jnp.asarray(source[..., 1]))
        r = mv(u) - bc
        return float(jax.device_get(
            jnp.linalg.norm(jnp.stack([r.real, r.imag]))
            / jnp.linalg.norm(jnp.stack([bc.real, bc.imag]))))

    best_wf = np.asarray(fwd["best_wavefield"])[0]
    out["comparable_rel_residual"] = {
        "learned_best": rel_residual_of(best_wf),
        "cslp": rel_residual_of(wf_cslp),
    }
    print("comparable rel residual:", out["comparable_rel_residual"],
          flush=True)

    # --- 5) figure ----------------------------------------------------
    from helmnet_tpu.eval import plots

    plt = plots._plt()
    fig, axes = plt.subplots(1, 3, figsize=(17, 5))
    im = axes[0].imshow(sos, cmap="viridis")
    axes[0].set_title(f"skull sos (contrast {out['contrast']:.2f})")
    fig.colorbar(im, ax=axes[0], fraction=0.046)
    plots.show_wavefield(best_wf, ax=axes[1],
                         title=f"learned Re(u), rmse {best:.1e}, "
                               f"{t_warm:.0f} s")
    ax = axes[2]
    it_axis = np.arange(len(rmse_traj)) * decimate
    ax.semilogy(it_axis, np.where(np.isfinite(rmse_traj), rmse_traj,
                                  np.nan), label="learned rmse")
    ax.semilogy(np.arange(len(norms)) * 20, norms / max(norms[0], 1e-30),
                label="CSLP rel residual")
    ax.set_xlabel("iteration")
    ax.legend()
    ax.set_title(f"learned {t_warm:.0f} s vs CSLP {t_cslp:.0f} s")
    fig_path = os.path.join(ROOT, "figures_r5", f"skull_auto_{size}.png")
    fig.savefig(fig_path, dpi=140, bbox_inches="tight")
    out["figure"] = fig_path

    path = os.path.join(ROOT, "results", f"skull_auto_{size}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
