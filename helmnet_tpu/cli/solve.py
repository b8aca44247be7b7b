"""Solve one Helmholtz problem with the measured-policy solver.

The reference's UX is one MATLAB script per solver
(matlab/solve_with_gmres.m:1-13, kwave_solver.m) and the user must know
which to run; this CLI routes through solvers/auto.solve_auto, which
picks the measured winner (learned / CSLP / two-level / recycled
two-level, 2D or 3D) from the problem's grid size, wavelengths-across
and heterogeneity — and says why.

    python -m helmnet_tpu.cli.solve --sos maps.npz --index 0 \
        --checkpoint checkpoints/tpu_r2c --tol 1e-4 --out solution.npz

With --dry-run it prints the plan (method, rationale, evidence) without
solving.
"""

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sos", type=str, required=True,
                   help="npz with 'maps' (or a single 2D/3D array)")
    p.add_argument("--index", type=int, default=0)
    p.add_argument("--checkpoint", type=str, default=None,
                   help="orbax dir (enables the learned family)")
    p.add_argument("--source-location", type=int, nargs="+", default=None)
    p.add_argument("--source-npz", type=str, default=None,
                   help="npz with a [H, W, 2] (or [D, H, W, 2]) source "
                        "map (e.g. an arc transducer from "
                        "data.skull.make_arc_source) — overrides "
                        "--source-location")
    p.add_argument("--amplitude", type=float, default=10.0)
    p.add_argument("--omega", type=float, default=1.0)
    p.add_argument("--tol", type=float, default=1e-4)
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--dry-run", action="store_true",
                   help="print the solver plan and exit")
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import dataclasses

    from ..core.config import Config
    from ..solvers.auto import choose_solver, solve_auto

    with np.load(args.sos) as f:
        maps = f["maps"] if "maps" in f else f[f.files[0]]
    # [H,W] / [D,H,W] cube = single problem; [N,H,W] / [N,D,H,W] = batch
    if maps.ndim == 2 or (maps.ndim == 3 and
                          maps.shape[0] == maps.shape[1] == maps.shape[2]):
        sos = maps
    else:
        sos = maps[args.index]
    sos = np.asarray(sos, np.float32)
    is_3d = sos.ndim == 3

    cfg = Config()
    cfg = cfg.replace(
        geometry=dataclasses.replace(cfg.geometry,
                                     domain_size=max(sos.shape)),
        source=dataclasses.replace(cfg.source, amplitude=args.amplitude,
                                   omega=args.omega),
    )

    params = None
    if args.checkpoint and os.path.isdir(args.checkpoint):
        from ..solvers.iterative import IterativeSolver

        params = IterativeSolver.from_orbax_checkpoint(
            args.checkpoint
        ).params

    plan = choose_solver(sos, cfg=cfg, params=params, tol=args.tol)
    print(f"plan: {plan.method}")
    print(f"  rationale: {plan.rationale}")
    print(f"  evidence:  {plan.evidence}")
    print(f"  kwargs:    {plan.kwargs}")
    if args.dry_run:
        return 0

    if args.source_npz:
        with np.load(args.source_npz) as f:
            src = f[f.files[0]]
        if src.shape[:-1] != sos.shape or src.shape[-1] != 2:
            raise SystemExit(
                f"--source-npz shape {src.shape} does not match sos "
                f"{sos.shape} + channel pair")
        src = np.asarray(src, np.float32)
    else:
        if args.source_location:
            loc = tuple(args.source_location)
        else:
            loc = tuple(int(c * max(sos.shape) / 96) for c in
                        Config().source.location)
            loc = loc if not is_3d else (loc[0], loc[1], sos.shape[2] // 2)
        if is_3d:
            from ..ops.source3d import point_source_map3d

            src = point_source_map3d(*sos.shape, loc, args.amplitude, 0.0,
                                     args.omega)
        else:
            from ..ops.source import point_source_map

            src = point_source_map(*sos.shape, loc, args.amplitude, 0.0,
                                   args.omega)

    import time

    t0 = time.time()
    res, plan = solve_auto(np.asarray(src), sos, cfg=cfg, params=params,
                           tol=args.tol, verbose=True)
    if isinstance(res, dict):  # learned rollout output
        field = np.asarray(res["best_wavefield"][0])
        final = float(np.asarray(res["best_rmse"][0]))
        traj = np.asarray(res["rmse"])[:, 0]
        print(f"learned rollout: best residual RMSE {final:.3e} "
              f"({time.time() - t0:.1f} s)")
    else:
        field = np.asarray(res.wavefield if hasattr(res, "wavefield")
                           else res.x)
        traj = np.asarray(res.residual_norms)
        print(f"{plan.method}: rel residual "
              f"{traj[-1] / max(traj[0], 1e-30):.3e} "
              f"({int(np.asarray(res.iterations))} iterations, "
              f"{time.time() - t0:.1f} s)")
    if args.out:
        np.savez_compressed(args.out, wavefield=field, trajectory=traj,
                            method=plan.method,
                            seconds=time.time() - t0)
        print(f"saved {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
