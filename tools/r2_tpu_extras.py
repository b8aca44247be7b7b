"""Round-2 TPU validation extras (run on the real chip after training):

1. 2048^2 high-wavenumber GMRES: bare Krylov stall vs shifted-Laplace
   (CSLP) convergence — VERDICT item 4's "done" criterion.
2. 1024^2 far-OOD learned rollout with the forward wrappers (source
   normalization + best-iterate): no divergence over long rollouts —
   VERDICT item 6.
3. 512^2 skull example through plain forward (no hybrid fallback),
   figure regenerated.
4. Packed-vs-unpacked rollout microbench (the conv-lever measurement).

Each step is independent; failures don't block the rest. Results land in
R2_TPU_EXTRAS.json + figures/.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..")
OUT = {}


def step(name):
    def deco(fn):
        def run():
            print(f"=== {name} ===", flush=True)
            t0 = time.time()
            try:
                OUT[name] = fn()
                OUT[name]["seconds"] = round(time.time() - t0, 1)
                print(f"  ok in {OUT[name]['seconds']}s: {OUT[name]}", flush=True)
            except Exception as e:
                OUT[name] = {"error": repr(e)}
                print(f"  FAILED: {e!r}", flush=True)
        run.step_name = name
        return run
    return deco


@step("fused_dconv_96")
def fused_dconv():
    """Standalone fused-Pallas vs XLA DoubleConv at the packed level-0
    96^2 shape, then the full packed rollout with dconv='pallas'."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from helmnet_tpu.models.blocks import double_conv, init_double_conv
    from helmnet_tpu.ops.pallas_unet import fused_double_conv

    p = init_double_conv(jax.random.PRNGKey(0), 160, 128, "prelu")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 96, 96, 160))

    xla = jax.jit(lambda pp, xx: double_conv(pp, xx, "prelu", "default"))

    def timed(fn, *a):
        r = np.asarray(fn(*a)).ravel()[:4]  # force + tiny fetch
        ts = []
        for _ in range(5):
            t0 = time.time()
            for _ in range(20):
                out = fn(*a)
            np.asarray(out).ravel()[:4]
            ts.append((time.time() - t0) / 20)
        return min(ts)

    t_xla = timed(xla, p, x)
    t_pal = timed(lambda pp, xx: fused_double_conv(pp, xx), p, x)
    ref = np.asarray(xla(p, x))
    got = np.asarray(fused_double_conv(p, x))
    rel = float(np.abs(got - ref).max() / (np.abs(ref).max() + 1e-30))
    return {"xla_s": t_xla, "pallas_s": t_pal, "speedup": t_xla / t_pal,
            "rel_err": rel}


@step("pallas_packed_96")
def pallas_packed():
    """Full packed rollout with the fused-Pallas DoubleConv at the bench
    primary workload (96^2 x 32 x 50): the conv-lever combination — packed
    channels give MXU-width K/N, the Pallas kernel avoids XLA's im2col
    materialization for wide-channel convs."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from helmnet_tpu.models.packed import rollout_packed
    from helmnet_tpu.ops.source import point_source_map
    from helmnet_tpu.ops.spectral import make_operator
    from helmnet_tpu.solvers.iterative import IterativeSolver, rollout

    ckpt = "/root/reference/trained_models/jcp_paper_trained_weights.ckpt"
    solver = IterativeSolver.from_reference_checkpoint(ckpt)
    cfg = solver.cfg
    n, batch, iters = 96, 32, 50
    op = make_operator(n, n, cfg.geometry.pml_size, cfg.geometry.sigma_max,
                       cfg.k0)
    src = jnp.asarray(np.broadcast_to(
        point_source_map(n, n, (n - 14, n // 2), 10.0)[None],
        (batch, n, n, 2)))
    sos = np.ones((batch, n, n), np.float32)
    sos[:, : n // 2, : n // 2] = 1.5
    sos = jnp.asarray(sos)

    def timed(fn):
        out = fn()
        r0 = np.asarray(out["rmse"])  # compile + force
        ts = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(fn()["rmse"])
            ts.append(time.time() - t0)
        return min(ts), r0

    base_s, r_base = timed(lambda: rollout(
        solver.params, op, src, sos, cfg=cfg, num_iterations=iters))
    res = {"unpacked_s": base_s, "unpacked_gps": batch * n * n * iters / base_s}
    for g, up in ((16, "dilated"), (16, "subpixel"), (8, "subpixel"),
                  (32, "subpixel")):
        case = cfg.replace(model=dataclasses.replace(
            cfg.model, double_conv_mode="pallas", up_mode=up))
        try:
            t, r = timed(lambda: rollout_packed(
                solver.params, op, src, sos, cfg=case, g=g,
                num_iterations=iters))
        except Exception as e:
            res[f"pallas_g{g}_{up}_error"] = repr(e)[:300]
            continue
        rel = float(np.abs(r[-1] - r_base[-1]).max()
                    / (np.abs(r_base[-1]).max() + 1e-30))
        res[f"pallas_g{g}_{up}"] = {
            "seconds": t, "gps": batch * n * n * iters / t,
            "speedup": base_s / t, "final_rmse_rel_err": rel}
    return res


@step("pixconv_96")
def pixconv_96():
    """Unpacked rollout at the bench primary workload with the
    pixel-packed fused DoubleConv and/or subpixel up-convs. Reports both
    the 50-iteration wall time (the bench metric, includes one ~30 ms
    tunnel round trip) and the true per-iteration device time via the
    difference method (200 vs 50 iterations)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from helmnet_tpu.ops.source import point_source_map
    from helmnet_tpu.ops.spectral import make_operator
    from helmnet_tpu.solvers.iterative import IterativeSolver, rollout

    ckpt = "/root/reference/trained_models/jcp_paper_trained_weights.ckpt"
    solver = IterativeSolver.from_reference_checkpoint(ckpt)
    cfg = solver.cfg
    n, batch = 96, 32
    op = make_operator(n, n, cfg.geometry.pml_size, cfg.geometry.sigma_max,
                       cfg.k0)
    src = jnp.asarray(np.broadcast_to(
        point_source_map(n, n, (n - 14, n // 2), 10.0)[None],
        (batch, n, n, 2)))
    sos = np.ones((batch, n, n), np.float32)
    sos[:, : n // 2, : n // 2] = 1.5
    sos = jnp.asarray(sos)

    def wall(fn):
        np.asarray(fn()["rmse"])  # compile + force
        ts = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(fn()["rmse"])
            ts.append(time.time() - t0)
        return min(ts)

    res = {}
    r_ref = None
    for dconv, up in (("xla", "dilated"), ("xla", "subpixel"),
                      ("pallas", "dilated"), ("pallas", "subpixel")):
        case = cfg.replace(model=dataclasses.replace(
            cfg.model, double_conv_mode=dconv, up_mode=up))
        key = f"{dconv}_{up}"
        try:
            run = lambda L: (lambda: rollout(
                solver.params, op, src, sos, cfg=case, num_iterations=L))
            t50 = wall(run(50))
            t200 = wall(run(200))
            r = np.asarray(rollout(solver.params, op, src, sos, cfg=case,
                                   num_iterations=50)["rmse"])
            if r_ref is None:
                r_ref = r
            rel = float(np.abs(r[-1] - r_ref[-1]).max()
                        / (np.abs(r_ref[-1]).max() + 1e-30))
            res[key] = {
                "wall50_s": t50,
                "gps_50iter": batch * n * n * 50 / t50,
                "per_iter_ms": (t200 - t50) / 150 * 1e3,
                "gps_device": batch * n * n / ((t200 - t50) / 150),
                "final_rmse_rel_err": rel,
            }
            print(f"  {key}: {res[key]}", flush=True)
        except Exception as e:
            res[f"{key}_error"] = repr(e)[:400]
            print(f"  {key} FAILED: {repr(e)[:200]}", flush=True)
    return res


@step("gmres_2048_highk")
def gmres_2048():
    """CSLP-GMRES needs O(k) Krylov iterations (~326 wavelengths across
    this domain). One monolithic device call of that length crashes the
    tunneled worker, so restart cycles are driven from the HOST: each
    cycle solves for the correction e against the current true residual
    (b - A u), which is exactly restarted-GMRES semantics, one ~10 s
    device call at a time."""
    import jax
    import jax.numpy as jnp

    from helmnet_tpu.core.config import Config
    from helmnet_tpu.ops.source import point_source_map
    from helmnet_tpu.ops.spectral import helmholtz_residual, make_operator
    from helmnet_tpu.solvers.gmres import solve_helmholtz

    cfg = Config()
    n, omega = 2048, 1.0  # ~326 wavelengths across: hard for bare Krylov
    op = make_operator(n, n, cfg.geometry.pml_size, cfg.geometry.sigma_max,
                       omega)
    k_sq = jnp.full((n, n), omega**2)
    src = jnp.asarray(
        point_source_map(n, n, (n - 40, n // 2), 10.0, 0.0, omega)
    )

    @jax.jit
    def neg_residual(u):  # b - A u as a channel pair, batched helper
        r = helmholtz_residual(op, u[None], k_sq[None], src[None],
                               mode="matmul")[0]
        return -r, jnp.sqrt(jnp.mean(r**2))

    src_norm = float(np.asarray(jnp.sqrt(jnp.mean(src**2))))
    budget_s = float(os.environ.get("GMRES2048_BUDGET_S", "1500"))

    def chunked(precond, restart, n_cycles, shift=(1.0, 0.3)):
        t0 = time.time()
        u = jnp.zeros((n, n, 2), jnp.float32)
        hist, cycles_run = [], 0
        for _ in range(n_cycles):
            b_eff, rnorm = neg_residual(u)
            hist.append(float(np.asarray(rnorm)) / src_norm)
            if hist[-1] < 1e-6 or time.time() - t0 > budget_s:
                break
            r = solve_helmholtz(op, k_sq, b_eff, restart=restart,
                                max_restarts=1, tol=1e-12, precond=precond,
                                shift=shift)
            u = u + r.x
            cycles_run += 1
            del r
        else:  # loop exhausted without break: record the final residual
            _, rnorm = neg_residual(u)
            hist.append(float(np.asarray(rnorm)) / src_norm)
        print(f"  [{precond}] rel residual trajectory: "
              f"{[round(h, 6) for h in hist]}", flush=True)
        return {"rel_residual": hist[-1], "trajectory": hist,
                "iterations": restart * cycles_run,
                "seconds": round(time.time() - t0, 1)}

    res = {"none": chunked("none", 100, 12),
           "shifted_laplace": chunked("shifted_laplace", 100, 40)}
    res["converges_where_bare_stalls"] = (
        res["shifted_laplace"]["rel_residual"]
        < res["none"]["rel_residual"] / 100
    )
    return res


@step("rollout_1024_ood")
def rollout_1024():
    import jax

    from helmnet_tpu.solvers.iterative import IterativeSolver

    ckpt = "/root/reference/trained_models/jcp_paper_trained_weights.ckpt"
    solver = IterativeSolver.from_reference_checkpoint(ckpt)
    n = 1024
    rng = np.random.default_rng(0)
    sos = np.ones((n, n), np.float32)
    for _ in range(6):
        r0, c0 = rng.integers(n // 8, n - n // 4, 2)
        h, w = rng.integers(n // 16, n // 4, 2)
        sos[r0 : r0 + h, c0 : c0 + w] = 1.25 + 0.75 * rng.random()
    # extended line source at 3x the training amplitude: doubly OOD
    src = np.zeros((n, n, 2), np.float32)
    src[60, n // 4 : 3 * n // 4, 0] = 30.0
    solver.set_domain_size(n, source_map=src[None])
    # chunked: one 3000-iteration dispatch at 1024^2 (~40 s) crashes the
    # tunneled worker; 150-iteration chunks stay well under its limit.
    # This problem is FAR out of distribution (10x grid, extended line
    # source) — the raw rollout diverges, the divergence-restart wrapper
    # contains it (returned wavefield = best iterate), and the hybrid
    # solver actually solves it.
    out = solver.forward(sos, num_iterations=3000, decimate=150,
                         chunk_iterations=150, restart_on_divergence=True)
    rmse = np.asarray(out["rmse"])[:, 0]
    best = float(np.asarray(out["best_rmse"])[0])
    res = {
        "final_rmse": float(rmse[-1]),
        "best_rmse": best,
        "rmse_t0": float(rmse[0]),
        "contained": bool(np.isfinite(best) and best < rmse[0]
                          and np.isfinite(
                              np.asarray(out["wavefield"]).ravel()[:8]).all()),
    }
    print(f"  learned (restart-contained): {res}", flush=True)
    # the robust far-OOD path: learned warm start + GMRES polish
    from helmnet_tpu.solvers.hybrid import solve_hybrid

    import jax.numpy as jnp

    hy = solve_hybrid(
        solver.params, solver.op, jnp.asarray(src[None]),
        jnp.asarray(sos[None]), cfg=solver.cfg, learned_iterations=100,
        restart=50, max_restarts=16, tol=1e-5, precond="shifted_laplace",
        shift=(1.0, 0.3),
    )
    res["hybrid_relres"] = float(np.asarray(hy.final_relres)[0])
    res["hybrid_warm_rmse"] = float(np.asarray(hy.warm_rmse)[0])
    res["hybrid_gmres_iters"] = int(np.asarray(hy.gmres_iterations)[0])
    return res


@step("skull_512_plain_forward")
def skull_512():
    from helmnet_tpu.data.skull import skull_example_problem
    from helmnet_tpu.eval import plots
    from helmnet_tpu.solvers.iterative import IterativeSolver

    ckpt = "/root/reference/trained_models/jcp_paper_trained_weights.ckpt"
    solver = IterativeSolver.from_reference_checkpoint(ckpt)
    sos, source = skull_example_problem(512)
    solver.set_domain_size(512, source_map=source[None])
    out = solver.forward(sos, num_iterations=3000, decimate=100,
                         chunk_iterations=600)
    rmse = np.asarray(out["rmse"])[:, 0]
    best = float(np.asarray(out["best_rmse"])[0])
    wf = np.asarray(out["wavefield"])[0]
    plt = plots._plt()
    fig, axes = plt.subplots(1, 2, figsize=(12, 5))
    axes[0].imshow(sos, cmap="viridis")
    axes[0].set_title("skull sos map")
    plots.show_wavefield(wf, ax=axes[1],
                         title=f"transcranial Re(u), best rmse {best:.1e}")
    path = os.path.join(ROOT, "figures", "skull_example.png")
    fig.savefig(path, dpi=150, bbox_inches="tight")
    return {"best_rmse": best, "final_rmse": float(rmse[-1]),
            "diverged": bool(~np.isfinite(rmse[-1])), "figure": path}


@step("packed_bench")
def packed_bench():
    import jax
    import jax.numpy as jnp

    from helmnet_tpu.models.packed import rollout_packed
    from helmnet_tpu.ops.source import point_source_map
    from helmnet_tpu.ops.spectral import make_operator
    from helmnet_tpu.solvers.iterative import IterativeSolver, rollout

    ckpt = "/root/reference/trained_models/jcp_paper_trained_weights.ckpt"
    solver = IterativeSolver.from_reference_checkpoint(ckpt)
    cfg = solver.cfg
    res = {}
    for n, batch, iters, groups in ((96, 32, 50, (8, 16, 32)),
                                    (512, 16, 20, (8, 16))):
        op = make_operator(n, n, cfg.geometry.pml_size,
                           cfg.geometry.sigma_max, cfg.k0)
        src = jnp.asarray(np.broadcast_to(
            point_source_map(n, n, (n - 14, n // 2), 10.0)[None],
            (batch, n, n, 2)))
        sos = np.ones((batch, n, n), np.float32)
        sos[:, : n // 2, : n // 2] = 1.5
        sos = jnp.asarray(sos)

        def timed(fn):
            np.asarray(fn()["rmse"])  # compile + force
            ts = []
            for _ in range(3):
                t0 = time.time()
                np.asarray(fn()["rmse"])
                ts.append(time.time() - t0)
            return min(ts)

        key = f"{n}x{batch}"
        base = timed(lambda: rollout(solver.params, op, src, sos, cfg=cfg,
                                     num_iterations=iters))
        res[key] = {"unpacked_s": base,
                    "unpacked_gps": batch * n * n * iters / base}
        for g in groups:
            t = timed(lambda: rollout_packed(
                solver.params, op, src, sos, cfg=cfg, g=g,
                num_iterations=iters))
            res[key][f"packed{g}_s"] = t
            res[key][f"packed{g}_speedup"] = base / t
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated step substrings to run")
    args = ap.parse_args()
    import jax

    print("devices:", jax.devices(), flush=True)
    steps = [fused_dconv, pallas_packed, pixconv_96, packed_bench,
             gmres_2048, rollout_1024, skull_512]
    for s in steps:
        if args.only and not any(t in s.step_name for t in
                                 args.only.split(",")):
            continue
        s()
    path = os.path.join(ROOT, "R2_TPU_EXTRAS.json")
    merged = {}
    if os.path.exists(path):  # keep results from earlier partial runs
        with open(path) as f:
            merged = json.load(f)
    merged.update(OUT)
    with open(path, "w") as f:
        json.dump(merged, f, indent=2, default=str)
    print("wrote R2_TPU_EXTRAS.json", flush=True)


if __name__ == "__main__":
    main()
