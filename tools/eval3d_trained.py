"""Evaluate a trained 3D model (Trainer3D checkpoints) on held-out volumes.

VERDICT round-2 item 1 acceptance bar: the learned 3D rollout must beat
its iteration-0 residual by >=100x on held-out 3D media. This scores:

  1. residual-RMSE trajectory over held-out ellipsoid volumes with both
     the FIXED training source and RANDOM point sources (generalization),
     reporting median/p90 terminal RMSE and the iter0/final reduction;
  2. an INDEPENDENT-solver agreement anchor (VERDICT weak #7): the
     learned solution vs CSLP-GMRES (dense-kron cross-checked operator,
     tests/test_spectral3d.py) on one held-out volume — PML-cropped
     relative l_inf.

    timeout 2400 python tools/eval3d_trained.py --tag tpu3d_a

Writes TRAINING3D.md.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", type=str, default="tpu3d_a")
    ap.add_argument("--size", type=int, default=48)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--features", type=int, default=16)
    ap.add_argument("--iterations", type=int, default=400)
    ap.add_argument("--n-val", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--md-name", type=str, default="TRAINING3D.md")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp

    from helmnet_tpu.core.config import Config
    from helmnet_tpu.ops.spectral3d import (
        make_operator3d,
        point_source_map3d,
    )
    from helmnet_tpu.solvers.helm3d import solve_helmholtz3d
    from helmnet_tpu.solvers.iterative3d import rollout3d
    from helmnet_tpu.train.loop3d import Trainer3D, _with_3d_channels

    cfg = Config()
    cfg = cfg.replace(
        geometry=dataclasses.replace(cfg.geometry, domain_size=args.size),
        model=dataclasses.replace(
            cfg.model, depth=args.depth, state_depth=args.depth,
            features=args.features, in_channels=7,
        ),
    )

    ckpt_dir = os.path.join(ROOT, "checkpoints", args.tag)
    data = np.load(os.path.join(ROOT, "datasets", args.tag, "maps3d.npz"))
    val_maps = data["val"][: args.n_val]
    n = args.size

    manifest = json.load(open(os.path.join(ckpt_dir, "manifest3d.json")))
    rows = []
    trainer = Trainer3D(cfg)
    op = trainer.op

    # fixed training source + seeded random val sources
    s = cfg.source
    scale = n / 96.0
    fixed_loc = tuple(
        max(4, min(n - 4, int(round(c * scale)))) for c in (s.location[0],
                                                            s.location[1], 48)
    )
    fixed = jnp.asarray(np.broadcast_to(
        point_source_map3d(n, n, n, fixed_loc, s.amplitude)[None],
        (len(val_maps), n, n, n, 2)).copy())
    rng = np.random.default_rng(99)
    margin = cfg.geometry.pml_size + 2
    rand_srcs = jnp.asarray(np.stack([
        point_source_map3d(
            n, n, n,
            tuple(int(v) for v in rng.integers(margin, n - margin, 3)),
            s.amplitude)
        for _ in range(len(val_maps))
    ]))

    maps_dev = jnp.asarray(val_maps)
    for entry in manifest["top"]:
        ep = entry["epoch"]
        path = os.path.join(ckpt_dir, f"params3d_ep{ep}.npz")
        if not os.path.exists(path):
            continue
        from helmnet_tpu.train.loop3d import load_params3d_npz

        params = load_params3d_npz(path, cfg)
        out_f = rollout3d(params, op, fixed, maps_dev, cfg=cfg,
                          num_iterations=args.iterations,
                          collect=("rmse", "best"))
        out_r = rollout3d(params, op, rand_srcs, maps_dev, cfg=cfg,
                          num_iterations=args.iterations,
                          collect=("rmse", "best"))
        rmse_f = np.asarray(out_f["rmse"])  # [iters, B]
        rmse_r = np.asarray(out_r["rmse"])
        best_f = np.asarray(out_f["best_rmse"])
        best_r = np.asarray(out_r["best_rmse"])
        # TRUE iteration-0 residual: r = L*0 + k^2*0 - s = -s, so the
        # baseline is the per-sample RMSE of the source map itself
        # (rmse_f[0] is AFTER the first learned step and understates
        # the reduction)
        rmse0_f = np.sqrt(np.mean(np.asarray(fixed) ** 2, axis=(1, 2, 3, 4)))
        rmse0_r = np.sqrt(
            np.mean(np.asarray(rand_srcs) ** 2, axis=(1, 2, 3, 4)))
        row = {
            "epoch": ep,
            "fixed_median": float(np.median(best_f)),
            "fixed_p90": float(np.quantile(best_f, 0.9)),
            "rand_median": float(np.median(best_r)),
            "rand_p90": float(np.quantile(best_r, 0.9)),
            "fixed_reduction_x": float(np.median(rmse0_f / best_f)),
            "rand_reduction_x": float(np.median(rmse0_r / best_r)),
        }
        rows.append(row)
        print(row, flush=True)

    best = min(rows, key=lambda r: r["rand_median"])

    # independent-solver agreement on one held-out volume (random source)
    from helmnet_tpu.train.loop3d import load_params3d_npz

    params = load_params3d_npz(
        os.path.join(ckpt_dir, f"params3d_ep{best['epoch']}.npz"), cfg)
    sos0 = maps_dev[:1]
    src0 = rand_srcs[:1]
    out = rollout3d(params, op, src0, sos0, cfg=cfg,
                    num_iterations=args.iterations, collect=("rmse", "best"))
    k_sq0 = (cfg.source.omega / sos0[0]) ** 2
    ref = solve_helmholtz3d(
        op, k_sq0, src0[0], restart=20, max_restarts=40, tol=1e-7,
        precond="shifted_laplace",
    )
    p = cfg.geometry.pml_size + 2
    crop = (slice(p, n - p),) * 3
    uf = np.asarray(out["wavefield"])[0]  # terminal field (always returned)
    ur = np.asarray(ref.x)
    num = np.abs(uf[crop] - ur[crop]).max()
    den = np.abs(ur[crop]).max()
    agreement = float(num / den)
    gmres_rel = float(ref.residual_norms[-1] /
                      max(ref.residual_norms[0], 1e-30))

    with open(os.path.join(ROOT, args.md_name), "w") as f:
        f.write(f"# 3D training run `{args.tag}` (TPU v5e)\n\n")
        f.write(
            f"HybridNet3D ({args.size}^3 volumes, depth {args.depth}, "
            f"features {args.features}), ellipsoidal-shell phantoms, "
            "device-resident 3D buffer, random-source curriculum — the 2D "
            "recipe (TRAINING.md) carried to 3D. The reference is 2D-only "
            "(/root/reference/helmnet/hybridnet.py:19-755).\n\n"
        )
        f.write(f"Validation: {args.n_val} held-out volumes, best residual "
                f"RMSE within {args.iterations} iterations; 'fixed' = "
                "training source, 'random' = unseen point sources; "
                "'reduction' = iteration-0 residual RMSE / best (the "
                ">=100x acceptance bar).\n\n")
        f.write("| epoch | fixed median | fixed p90 | random median | "
                "random p90 | fixed reduction | random reduction |\n")
        f.write("|---|---|---|---|---|---|---|\n")
        for r in rows:
            f.write(
                f"| {r['epoch']} | {r['fixed_median']:.2e} | "
                f"{r['fixed_p90']:.2e} | {r['rand_median']:.2e} | "
                f"{r['rand_p90']:.2e} | {r['fixed_reduction_x']:.0f}x | "
                f"{r['rand_reduction_x']:.0f}x |\n"
            )
        f.write(
            f"\nIndependent-solver anchor: learned terminal field vs "
            f"CSLP-GMRES (rel residual {gmres_rel:.1e}) on a held-out "
            f"volume, PML-cropped relative l_inf = {agreement:.3f}.\n"
        )
    print(f"\nBEST: {best}")
    print(f"agreement l_inf vs GMRES: {agreement:.4f}")
    print(f"wrote {args.md_name}", flush=True)


if __name__ == "__main__":
    main()
