"""3D resize-at-inference: the 48^3-trained model applied to 96^3/128^3.

The 2D flagship story includes resize-at-inference 96 -> 256 -> 512 (the
fully-convolutional net + grid-matched spectral operator generalize
across domain sizes; README "large grids"). This measures the same
property for the 3D model trained at 48^3 (checkpoints/tpu3d_a,
TRAINING3D.md): held-out ellipsoidal-shell phantoms at 96^3 and 128^3,
chunked learned rollouts with best-iterate tracking, reduction measured
against the true iteration-0 residual (= source RMSE), plus a CSLP-GMRES
field-agreement anchor at 96^3.

The reference is 2D-only and fixed-size-only at train time
(/root/reference/helmnet/hybridnet.py:19-755; its own resize story is
the 2D fig_size_generalization). Writes `helm3d_resize_*` keys into
R2_TPU_EXTRAS.json.

Env: R3D_SIZES (comma list, default "96,128"), R3D_ITERS (default 600),
R3D_NVAL (default 4).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..")
EXTRAS = os.path.join(ROOT, "R2_TPU_EXTRAS.json")


def record(key, value):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _extras import record as _record
    _record(key, value, path=EXTRAS)


def main():
    import dataclasses

    import jax.numpy as jnp

    from helmnet_tpu.core.config import Config
    from helmnet_tpu.data.ellipsoids3d import make_dataset3d
    from helmnet_tpu.ops.spectral3d import point_source_map3d
    from helmnet_tpu.solvers.helm3d import solve_helmholtz3d
    from helmnet_tpu.solvers.iterative3d import IterativeSolver3D
    from helmnet_tpu.train.loop3d import load_params3d_npz

    sizes = [int(s) for s in os.environ.get("R3D_SIZES", "96,128").split(",")]
    iters = int(os.environ.get("R3D_ITERS", "600"))
    n_val = int(os.environ.get("R3D_NVAL", "4"))
    epoch = int(os.environ.get("R3D_EPOCH", "80"))

    cfg = Config()
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, depth=3, state_depth=3, features=16, in_channels=7,
        ),
    )
    params = load_params3d_npz(
        os.path.join(ROOT, "checkpoints", "tpu3d_a",
                     f"params3d_ep{epoch}.npz"), cfg)

    for n in sizes:
        cfg_n = cfg.replace(
            geometry=dataclasses.replace(cfg.geometry, domain_size=n)
        )
        solver = IterativeSolver3D(cfg_n, params=params)
        # held-out phantoms: a seed disjoint from training (42) and the
        # 48^3 eval; same generative family, scaled feature sizes
        maps = make_dataset3d(n_val, n, seed=777)
        rng = np.random.default_rng(101)
        margin = cfg.geometry.pml_size + 4
        locs = [tuple(int(v) for v in rng.integers(margin, n - margin, 3))
                for _ in range(n_val)]
        src = np.stack([
            point_source_map3d(n, n, n, loc, cfg.source.amplitude)
            for loc in locs
        ])
        solver.set_source_maps(src)
        t0 = time.time()
        out = solver.forward(
            maps, num_iterations=iters, best_iterate=True,
            chunk_iterations=min(100, iters),
        )
        dt = time.time() - t0
        best = np.asarray(out["best_rmse"])
        rmse0 = np.sqrt(np.mean(src**2, axis=(1, 2, 3, 4)))
        red = rmse0 / best
        entry = {
            "size": n,
            "iterations": iters,
            "n_val": n_val,
            "best_rmse_median": float(np.median(best)),
            "best_rmse_max": float(best.max()),
            "reduction_median_x": float(np.median(red)),
            "reduction_min_x": float(red.min()),
            "seconds": round(dt, 1),
            "trained_at": 48,
            "epoch": epoch,
        }
        print(entry, flush=True)

        if n == 96:
            # independent-solver anchor at the first resize octave
            k_sq0 = (cfg.source.omega / jnp.asarray(maps[0])) ** 2
            ref = solve_helmholtz3d(
                solver.op, k_sq0, jnp.asarray(src[0]), restart=20,
                max_restarts=60, tol=1e-6, precond="shifted_laplace",
            )
            p = cfg.geometry.pml_size + 2
            crop = (slice(p, n - p),) * 3
            uf = np.asarray(out["best_wavefield"])[0]
            ur = np.asarray(ref.x)
            entry["gmres_agreement_linf"] = float(
                np.abs(uf[crop] - ur[crop]).max() / np.abs(ur[crop]).max()
            )
            entry["gmres_rel_residual"] = float(
                ref.residual_norms[-1] / max(ref.residual_norms[0], 1e-30)
            )
            print("anchor:", entry["gmres_agreement_linf"], flush=True)
        record(f"helm3d_resize_{n}cubed", entry)


if __name__ == "__main__":
    main()
