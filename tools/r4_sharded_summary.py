"""Summarize the sharded-to-quality training runs into TRAINING_SHARDED.md.

Reads TRAIN_SHARDED_QUALITY.json (tags sharded_quality_dyx and
sharded_quality_none — the same-seed single-device comparison) and writes
the round-3 verdict item 3 artifact: loss curve summary, val trajectory,
reduction vs epoch 0, and the sharded-vs-single comparison.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..")


def main():
    data = json.load(open(os.path.join(ROOT, "TRAIN_SHARDED_QUALITY.json")))
    sh = data.get("sharded_quality_dyx")
    sg = data.get("sharded_quality_none")

    def losses(d):
        return [e["loss"] for e in d["epochs"]]

    with open(os.path.join(ROOT, "TRAINING_SHARDED.md"), "w") as f:
        f.write("# Domain-partitioned training to quality "
                "(round 4, virtual 8-device mesh)\n\n")
        f.write(
            "Round-3 verdict item 3: the r3 artifact "
            "(TRAIN_SHARDED_256.json) proved sharded-epoch MECHANICS but "
            "showed only a rising 48-step transient. This run trains 96² "
            "on the (data=2, y=2, x=2) mesh (train/loop.shard_experience "
            "— spatially partitioned fields, data-parallel batch) to "
            "quality, with per-25-epoch validation (300-iteration "
            "rollouts, fixed seeded sources) and a same-seed "
            "single-device comparison.\n\n"
            "Found and fixed on the way: the config-default lr 1e-4 plus "
            "plateau decay on the flat early-curriculum loss reaches the "
            "1e-5 floor before the model learns anything; the r2b "
            "recipe's lr 1e-3 is required (now a tool default).\n\n"
        )
        for name, d in (("sharded (data=2,y=2,x=2)", sh),
                        ("single-device same-seed", sg)):
            if d is None:
                continue
            ls = losses(d)
            vals = d["vals"]
            f.write(f"## {name}\n\n")
            f.write(f"- config: buffer {d['buffer']}, batch {d['batch']}, "
                    f"unroll {d['unroll']}, {d['steps_per_epoch']} "
                    f"steps/epoch, {len(ls)} epochs\n")
            if ls:
                w = max(len(ls) // 10, 1)
                f.write(f"- loss: first-{w}-epoch mean "
                        f"{np.mean(ls[:w]):.3e} -> last-{w}-epoch mean "
                        f"{np.mean(ls[-w:]):.3e} "
                        f"(decreased: {np.mean(ls[-w:]) < np.mean(ls[:w])})\n")
            f.write("- validation (mean final residual RMSE, "
                    f"{d['val_iters']}-iteration rollouts):\n\n")
            f.write("| epoch | val | reduction vs epoch 0 |\n|---|---|---|\n")
            v0 = vals[0]["val_loss"]
            for v in vals:
                f.write(f"| {v['epoch']} | {v['val_loss']:.3e} | "
                        f"{v0 / v['val_loss']:.1f}x |\n")
            f.write("\n")
        if sh and sg:
            f.write("## Comparison\n\n")
            n = min(len(losses(sh)), len(losses(sg)))
            a = np.asarray(losses(sh)[:n])
            b = np.asarray(losses(sg)[:n])
            # identical seeds track exactly for the first epochs, then
            # decorrelate (chaotic BPTT amplifies f32 reduction-order
            # differences) — report the early lockstep + end state
            k = 5
            f.write(
                f"- first {k} epochs, sharded vs single losses: "
                + ", ".join(f"{x:.4g}/{y:.4g}" for x, y in
                            zip(a[:k], b[:k]))
                + "\n"
            )
            f.write(
                f"- mean |rel diff| over first {k} epochs: "
                f"{np.mean(np.abs(a[:k] - b[:k]) / np.abs(b[:k])):.2e} "
                "(same seeds -> same batches; exact-equality at the "
                "step level is pinned by tests/test_sharded_training.py)\n"
            )
    print("wrote TRAINING_SHARDED.md")


if __name__ == "__main__":
    main()
