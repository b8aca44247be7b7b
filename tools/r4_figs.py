"""Round-4 evidence figures.

1. figures_r4/helm8192_trajectories.png — 8192^2 relative residual vs
   wall-clock: r3 two-level baseline, the failed r3 coarse-restart-8
   retune, and the r4 recycled + coarse-tolerance-schedule run.
2. figures_r4/gmres_sweep_96.png — the 1000-map classical sweep: per-map
   iterations-to-RMSE-1e-4 distributions for bare GMRES (the reference's
   method) and CSLP-GMRES, with the learned solver's median marked.

Reads R2_TPU_EXTRAS.json / results/gmres_sweep_96*. CPU-only.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..")
OUT = os.path.join(ROOT, "figures_r4")


def fig_8192():
    d = json.load(open(os.path.join(ROOT, "R2_TPU_EXTRAS.json")))
    fig, ax = plt.subplots(figsize=(7, 4.5))
    for key, label, color in (
        ("helm_8192_twolevel", "r3 two-level (restart 3, coarse 16x2)",
         "#888888"),
        ("helm_8192_twolevel_r3c8", "r3 retune (coarse 8, worse/s)",
         "#bbbbbb"),
        ("helm_8192_recycled",
         "r4 recycled k=1 + coarse schedule", "#d62728"),
    ):
        if key not in d:
            continue
        tr = np.asarray(d[key]["trajectory_every_cycle"], float)
        secs = d[key]["seconds"]
        t = np.linspace(0, secs, len(tr))
        ax.semilogy(t, tr, label=label, color=color, lw=1.8)
    ax.set_xlabel("wall-clock (s, one TPU v5e chip)")
    ax.set_ylabel("true relative residual")
    ax.set_title("8192$^2$ Helmholtz (~1304 wavelengths), 67M unknowns")
    ax.grid(alpha=0.3, which="both")
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(os.path.join(OUT, "helm8192_trajectories.png"), dpi=130)
    print("wrote helm8192_trajectories.png")


def fig_sweep():
    path = os.path.join(ROOT, "results", "gmres_sweep_96.json")
    if not os.path.exists(path):
        return
    d = json.load(open(path))
    fig, ax = plt.subplots(figsize=(7, 4.5))
    colors = {"none": "#888888", "shifted_laplace": "#1f77b4"}
    labels = {"none": "bare GMRES (reference method)",
              "shifted_laplace": "CSLP-GMRES"}
    for pre in ("none", "shifted_laplace"):
        f = os.path.join(ROOT, "results", f"gmres_sweep_96_{pre}_rmse.npy")
        if not os.path.exists(f):
            continue
        rmse = np.load(f)  # [N, cycles+1]
        reached = rmse < 1e-4
        cyc = np.where(reached.any(1), reached.argmax(1), rmse.shape[1])
        iters = cyc * 100
        n_fail = int((cyc == rmse.shape[1]).sum())
        ax.hist(iters, bins=np.arange(0, 1101, 100) - 0.5, alpha=0.6,
                color=colors[pre],
                label=f"{labels[pre]} ({n_fail}/1000 never reach 1e-4; "
                      "shown at 1000+)")
    ax.axvline(82, color="#d62728", lw=2,
               label="learned solver median (82 iterations)")
    ax.set_xlabel("iterations to residual RMSE 1e-4 "
                  "(100-iteration checkpoints)")
    ax.set_ylabel("test-set maps")
    ax.set_title("1000-map JCP test set: iterations to 1e-4")
    ax.legend(fontsize=8)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(os.path.join(OUT, "gmres_sweep_96.png"), dpi=130)
    print("wrote gmres_sweep_96.png")


def main():
    os.makedirs(OUT, exist_ok=True)
    fig_8192()
    fig_sweep()


if __name__ == "__main__":
    main()
