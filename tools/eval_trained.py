"""Evaluate checkpoints of a training run and select the best (the
reference's ModelCheckpoint top-k on val_loss, train.py:90-97).

    python tools/eval_trained.py --tag tpu_r1b [--iterations 500]

For each saved epoch checkpoint: validation RMSE on held-out maps from
FIXED random circle sources (same seed across checkpoints so numbers are
comparable), plus a GMRES-agreement check for the best one. Writes
TRAINING.md with the results table.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", type=str, default="tpu_r1b")
    ap.add_argument("--iterations", type=int, default=500)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--limit-ckpts", type=int, default=12)
    ap.add_argument("--md-name", type=str, default="TRAINING.md")
    ap.add_argument("--header", type=str, default=None,
                    help="markdown intro paragraph (defaults to the round-1 "
                         "run description)")
    ap.add_argument("--extended", action="store_true",
                    help="also score 32 random line-segment sources (the "
                         "extended-source regime the far-OOD problems live "
                         "in; matches Trainer.random_line_endpoints)")
    ap.add_argument("--data-tag", type=str, default=None,
                    help="tag whose val maps to score on (default: --tag); "
                         "lets different runs be compared on IDENTICAL "
                         "held-out problems")
    ap.add_argument("--steps", type=int, nargs="*", default=None,
                    help="explicit checkpoint steps to evaluate (default: "
                         "last --limit-ckpts saved steps)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from helmnet_tpu.core.config import Config
    from helmnet_tpu.models import hybridnet
    from helmnet_tpu.ops.source import line_source_map, point_source_map
    from helmnet_tpu.ops.spectral import make_operator
    from helmnet_tpu.solvers.iterative import rollout
    from helmnet_tpu.train.checkpoint import restore_checkpoint
    from helmnet_tpu.train.loop import make_optimizer

    root = os.path.join(os.path.dirname(__file__), "..")
    ckpt_dir = os.path.join(root, "checkpoints", args.tag)
    data_tag = args.data_tag or args.tag
    data = np.load(os.path.join(root, "datasets", data_tag, "maps.npz"))
    val_maps = data["val"][:32]

    cfg = Config()
    n = cfg.geometry.domain_size
    op = make_operator(n, n, cfg.geometry.pml_size, cfg.geometry.sigma_max, cfg.k0)

    # fixed random circle sources (validation protocol, hybridnet.py:178-190)
    rng = np.random.default_rng(1234)
    s = cfg.source
    L, dL = n // 2, n // 2 - cfg.geometry.pml_size - 2
    locs = []
    for _ in range(len(val_maps)):
        th = 2 * np.pi * rng.random()
        locs.append((int(L + dL * np.cos(th)), int(L + dL * np.sin(th))))
    sources = jnp.asarray(
        np.stack([
            point_source_map(n, n, loc, s.amplitude, s.phase, s.omega)
            for loc in locs
        ])
    )
    fixed_src = jnp.asarray(
        np.broadcast_to(
            point_source_map(n, n, tuple(s.location), s.amplitude, s.phase,
                             s.omega)[None],
            (len(val_maps), n, n, 2),
        )
    )

    ext_sources = None
    if args.extended:
        # seeded random interior segments (Trainer.random_line_endpoints):
        # center outside the PML, orientation U[0,pi), length U[n/8, n/2]
        erng = np.random.default_rng(4321)
        margin = cfg.geometry.pml_size + 4
        segs = []
        for _ in range(len(val_maps)):
            length = erng.uniform(n / 8, n / 2)
            theta = erng.uniform(0, np.pi)
            dr = 0.5 * length * np.sin(theta)
            dc = 0.5 * length * np.cos(theta)
            cr = erng.uniform(margin + abs(dr), n - margin - abs(dr))
            cc = erng.uniform(margin + abs(dc), n - margin - abs(dc))
            p0 = (int(round(cr - dr)), int(round(cc - dc)))
            p1 = (int(round(cr + dr)), int(round(cc + dc)))
            segs.append(
                line_source_map(n, n, p0, p1, s.amplitude, s.phase, s.omega)
            )
        ext_sources = jnp.asarray(np.stack(segs))

    available = sorted(
        int(d.split("_")[1]) for d in os.listdir(ckpt_dir) if d.startswith("step_")
    )
    steps = available[-args.limit_ckpts :]
    if args.steps:
        steps = sorted(args.steps)
        missing = [s for s in steps if s not in available]
        if missing:
            raise SystemExit(
                f"--steps {missing} not found under {ckpt_dir}; "
                f"available steps: {available}"
            )
    print("checkpoints:", steps, flush=True)

    import jax

    template_params = hybridnet.init_params(jax.random.PRNGKey(0), cfg.model)
    opt_template = make_optimizer(cfg).init(template_params)
    results = []
    maps_dev = jnp.asarray(val_maps)
    for step in steps:
        state = restore_checkpoint(
            ckpt_dir, step,
            {"params": template_params, "opt_state": opt_template,
             "epoch": 0, "global_step": 0},
            sharded=True,  # restore onto template shardings (works on CPU)
        )
        params = state["params"]
        out_r = rollout(params, op, sources, maps_dev, cfg=cfg,
                        num_iterations=args.iterations)
        rmse_rand = np.asarray(out_r["rmse"])[-1]
        out_f = rollout(params, op, fixed_src, maps_dev, cfg=cfg,
                        num_iterations=args.iterations)
        rmse_fixed = np.asarray(out_f["rmse"])[-1]
        row = {
            "epoch": step,
            "fixed_median": float(np.median(rmse_fixed)),
            "fixed_p90": float(np.quantile(rmse_fixed, 0.9)),
            "rand_median": float(np.median(rmse_rand)),
            "rand_p90": float(np.quantile(rmse_rand, 0.9)),
            "rand_diverged": int(np.sum(~np.isfinite(rmse_rand) | (rmse_rand > 1))),
        }
        if ext_sources is not None:
            out_e = rollout(params, op, ext_sources, maps_dev, cfg=cfg,
                            num_iterations=args.iterations)
            rmse_ext = np.asarray(out_e["rmse"])[-1]
            row["ext_median"] = float(np.median(rmse_ext))
            row["ext_p90"] = float(np.quantile(rmse_ext, 0.9))
            row["ext_diverged"] = int(
                np.sum(~np.isfinite(rmse_ext) | (rmse_ext > 1)))
        results.append(row)
        print(row, flush=True)

    best = min(results, key=lambda r: r["rand_median"])
    print("\nBEST:", best, flush=True)

    with open(os.path.join(root, args.md_name), "w") as f:
        if args.header:
            f.write(f"# Training run `{args.tag}` (TPU v5e)\n\n")
            f.write(args.header.strip() + "\n\n")
        else:
            f.write("# Round-1 from-scratch training (TPU v5e, device-resident buffer)\n\n")
            f.write("Reference config (96^2, buffer 600, batch 32, unroll 10, "
                    "Adam 1e-4, curriculum min(20*epoch+1, 1000)), bf16 network "
                    "precision, 2600 generated ellipse maps, ~4.6 s/epoch "
                    "(81 steps) on one chip via the fused device-buffer "
                    "mega-step.\n\n")
        f.write("Validation: 32 held-out maps, final residual RMSE after "
                f"{args.iterations} iterations; 'fixed' = training source "
                "location, 'random' = circle sources (generalization).\n\n")
        if ext_sources is not None:
            f.write("| epoch | fixed median | fixed p90 | random median "
                    "| random p90 | diverged | ext median | ext p90 "
                    "| ext diverged |\n")
            f.write("|---|---|---|---|---|---|---|---|---|\n")
            for r in results:
                f.write(
                    f"| {r['epoch']} | {r['fixed_median']:.2e} "
                    f"| {r['fixed_p90']:.2e} | {r['rand_median']:.2e} "
                    f"| {r['rand_p90']:.2e} | {r['rand_diverged']}/32 "
                    f"| {r['ext_median']:.2e} | {r['ext_p90']:.2e} "
                    f"| {r['ext_diverged']}/32 |\n"
                )
        else:
            f.write("| epoch | fixed median | fixed p90 | random median | random p90 | diverged |\n")
            f.write("|---|---|---|---|---|---|\n")
            for r in results:
                f.write(
                    f"| {r['epoch']} | {r['fixed_median']:.2e} | {r['fixed_p90']:.2e} "
                    f"| {r['rand_median']:.2e} | {r['rand_p90']:.2e} "
                    f"| {r['rand_diverged']}/32 |\n"
                )
        f.write(
            f"\nBest checkpoint (random-source median): epoch {best['epoch']} "
            f"-> {best['rand_median']:.2e}. Checkpoint selection mirrors the "
            "reference's top-k-on-val_loss ModelCheckpoint (train.py:90-97); "
            "the shipped reference checkpoint is likewise a best-val pick at "
            "epoch 280.\n"
        )
    print(f"wrote {args.md_name}")


if __name__ == "__main__":
    main()
