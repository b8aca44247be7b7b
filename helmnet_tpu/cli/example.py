"""Minimal inference example (reference examples/simple_scattering.py):
256^2 slab, line source given as a spatial map, 100 iterations, plot the
real part of the wavefield.

    python -m helmnet_tpu.cli.example --checkpoint <ckpt> --out wavefield.png
"""

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--checkpoint",
        type=str,
        default="/root/reference/trained_models/jcp_paper_trained_weights.ckpt",
    )
    p.add_argument("--iterations", type=int, default=100)
    p.add_argument("--out", type=str, default="wavefield.png")
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from ..solvers.iterative import IterativeSolver

    solver = IterativeSolver.from_reference_checkpoint(args.checkpoint)

    sos_map = np.ones((256, 256), np.float32)
    sos_map[100:170, 30:240] = 1.5

    source_map = np.zeros((2, 256, 256), np.float32)
    source_map[0, 30, 120:130] = 1.0

    solver.set_domain_size(256, source_map=source_map[None])
    out = solver.forward(sos_map, num_iterations=args.iterations)

    p_real = np.asarray(out["wavefield"])[0, :, :, 0]
    rmse = np.asarray(out["rmse"])[:, 0]
    print(f"residual RMSE: start {rmse[0]:.3e} -> final {rmse[-1]:.3e}")

    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    plt.figure(figsize=(8, 6))
    plt.imshow(p_real, vmin=-0.5, vmax=0.5, cmap="seismic")
    plt.colorbar()
    plt.title(f"Re(u) after {args.iterations} iterations")
    plt.savefig(args.out, dpi=120, bbox_inches="tight")
    print(f"saved {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
