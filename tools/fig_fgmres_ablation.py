"""Convergence-ablation figure for the 1024^2 far-OOD preconditioning
campaign (data: R2_TPU_EXTRAS.json fgmres_1024* trajectories).

One log-scale line chart, relative true residual vs outer Krylov
iteration, five FGMRES variants + the CSLP-polish stall level as a
reference line. Categorical palette = the dataviz reference instance
(fixed slot order, validated set); marks 2px, recessive grid, direct
labels on the decisive series, text in neutral ink.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

ROOT = os.path.join(os.path.dirname(__file__), "..")

# dataviz reference categorical palette, fixed slot order
PALETTE = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100", "#e87ba4"]
INK, INK2 = "#0b0b0b", "#52514e"

SERIES = [
    # key, restart (outers per trajectory step), label
    ("fgmres_1024_twolevel_learned_spectral", 10,
     "two-level, learned smoother, spectral transfer"),
    ("fgmres_1024_twolevel_learned", 10,
     "two-level, learned smoother, bilinear transfer"),
    ("fgmres_1024", 8, "learned preconditioner (inner=20)"),
    ("fgmres_1024_deep", 16, "learned preconditioner (inner=100)"),
    ("fgmres_1024_twolevel_cslp", 10, "two-level, CSLP smoother"),
]


def main(out=os.path.join(ROOT, "figures", "fgmres_1024_ablation.png")):
    data = json.load(open(os.path.join(ROOT, "R2_TPU_EXTRAS.json")))
    fig, ax = plt.subplots(figsize=(7.2, 4.6), dpi=150)
    for (key, restart, label), color in zip(SERIES, PALETTE):
        traj = data[key]["trajectory"]
        xs = [i * restart for i in range(len(traj))]
        ax.semilogy(xs, traj, color=color, lw=2, label=label)
    # CSLP defect-correction polish stall level (1350 iterations, restart
    # 150 — off this x-scale; shown as the level it stalls at)
    stall = data["rollout_1024_ood"]["hybrid_relres"]
    ax.axhline(stall, color=INK2, lw=1, ls="--")
    ax.annotate("CSLP polish stall (0.072 after 1350 its)",
                xy=(4, stall * 1.25), fontsize=8, color=INK2)
    best = data["fgmres_1024_twolevel_learned_spectral"]
    ax.annotate(
        f"{best['rel_residual']:.1e} @ {best['outer_iterations']} outers",
        xy=(best["outer_iterations"],
            best["trajectory"][-1]),
        xytext=(-128, -4), textcoords="offset points",
        fontsize=8, color=INK,
    )
    ax.set_xlabel("outer Krylov iteration", color=INK)
    ax.set_ylabel("relative true residual", color=INK)
    ax.set_title(
        "1024$^2$ far-OOD Helmholtz (extended line source, strong "
        "heterogeneity):\npreconditioner ablation on one TPU v5e chip",
        fontsize=10, color=INK,
    )
    ax.grid(True, which="major", color="#e6e5e0", lw=0.6)
    ax.tick_params(colors=INK2, labelsize=8)
    for s in ax.spines.values():
        s.set_color("#d8d7d2")
    ax.legend(fontsize=8, frameon=False, loc="lower left")
    fig.tight_layout()
    os.makedirs(os.path.dirname(out), exist_ok=True)
    fig.savefig(out)
    print("wrote", out)


if __name__ == "__main__":
    main()
