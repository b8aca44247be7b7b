"""Domain-partitioned training TO QUALITY on the virtual 8-device mesh.

Round-3 verdict item 3: TRAIN_SHARDED_256.json showed mechanics (full
sharded epochs, bounded memory) but a RISING 48-step loss transient and
no validation. This run is the quality half: train 96^2 on the
(data=2, y=2, x=2) mesh long enough for (a) a decreasing loss, (b) a
>=100x validation residual reduction vs the epoch-0 model, and (c) a
same-seed single-device comparison (TS_MESH=none) whose metrics the
sharded run must track.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        timeout 28800 python tools/r4_train_sharded_quality.py

Writes TRAIN_SHARDED_QUALITY.json (atomic, every val) with the loss
curve, val trajectory, and config. Knobs: TS_MESH (dyx|none), TS_EPOCHS
(400), TS_HOURS (6), TS_MAPS (64), TS_BUFFER (64), TS_BATCH (8),
TS_UNROLL (10), TS_VAL_EVERY (20), TS_VAL_ITERS (300), TS_TAG.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ROOT = os.path.join(os.path.dirname(__file__), "..")


def main():
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import numpy as np

    from _extras import record
    from helmnet_tpu.core.config import Config, ParallelConfig
    from helmnet_tpu.core.meshes import make_mesh
    from helmnet_tpu.data.ellipses import make_dataset
    from helmnet_tpu.train.loop import Trainer

    mesh_kind = os.environ.get("TS_MESH", "dyx")
    epochs = int(os.environ.get("TS_EPOCHS", "400"))
    hours = float(os.environ.get("TS_HOURS", "6"))
    n_maps = int(os.environ.get("TS_MAPS", "64"))
    buffer = int(os.environ.get("TS_BUFFER", "64"))
    batch = int(os.environ.get("TS_BATCH", "8"))
    unroll = int(os.environ.get("TS_UNROLL", "10"))
    val_every = int(os.environ.get("TS_VAL_EVERY", "20"))
    val_iters = int(os.environ.get("TS_VAL_ITERS", "300"))
    lr = float(os.environ.get("TS_LR", "1e-3"))
    min_lr = float(os.environ.get("TS_MIN_LR", "1e-4"))
    tag = os.environ.get("TS_TAG", f"sharded_quality_{mesh_kind}")

    cfg = Config()
    cfg = cfg.replace(
        parallel=(ParallelConfig(data=2, y=2, x=2) if mesh_kind == "dyx"
                  else ParallelConfig()),
        training=dataclasses.replace(
            cfg.training,
            buffer_size=buffer,
            train_batch_size=batch,
            unrolling_steps=unroll,
            # the r2b TPU recipe's lr; the config default (1e-4) plus the
            # plateau scheduler decaying on the flat early-curriculum loss
            # reaches the 1e-5 floor before the model has learned anything
            # (the r4 first-attempt failure mode)
            learning_rate=lr,
            minimum_learning_rate=min_lr,
        ),
    )
    mesh = make_mesh(cfg.parallel) if mesh_kind == "dyx" else None
    if mesh is not None:
        assert len(jax.devices()) == 8, jax.devices()
    print("mesh:", mesh, flush=True)

    maps = make_dataset(n_maps + 16, 96, seed=7)
    train_maps, val_maps = maps[:n_maps], maps[n_maps:]

    tr = Trainer(cfg, mesh=mesh)
    tr.fill_buffer(train_maps)
    val_sources = tr.make_val_sources(len(val_maps))

    def validate():
        # (mean, median): mid-training the MEAN is dominated by one or
        # two diverging long rollouts (r4 verdict: 0.096 -> inf while
        # the loss fell 54 -> 1.5); every decision below keys on the
        # MEDIAN, the mean is recorded for continuity
        v = tr.validate(val_maps, num_iterations=val_iters, batch=8,
                        sources=val_sources)
        return float(v["val_loss"]), float(v["val_median"])

    out = {
        "size": 96, "mesh": str(mesh), "buffer": buffer, "batch": batch,
        "unroll": unroll, "maps": n_maps,
        "steps_per_epoch": max(n_maps // batch, 1),
        "val_iters": val_iters, "epochs": [], "vals": [],
    }
    path = os.path.join(ROOT, "TRAIN_SHARDED_QUALITY.json")

    v0, m0 = validate()
    out["vals"].append({"epoch": 0, "val_loss": v0, "val_median": m0})
    print(f"val@0: mean {v0:.4e}  median {m0:.4e}", flush=True)
    record(tag, out, path=path)

    deadline = time.time() + hours * 3600
    while tr.epoch < epochs and time.time() < deadline:
        stats = tr.training_epoch(train_maps)
        out["epochs"].append({
            "epoch": stats["epoch"],
            "loss": round(stats["train_loss_mean"], 6),
            "lr": stats["lr"],
            "seconds": round(stats["epoch_time_s"], 1),
        })
        print(f"epoch {stats['epoch']:4d}  loss "
              f"{stats['train_loss_mean']:.4e}  "
              f"{stats['epoch_time_s']:.1f}s", flush=True)
        if tr.epoch % val_every == 0:
            v, m = validate()
            out["vals"].append({"epoch": tr.epoch, "val_loss": v,
                                "val_median": m})
            out["val_reduction_vs_epoch0"] = v0 / v
            out["median_reduction_vs_epoch0"] = m0 / m
            print(f"  val@{tr.epoch}: mean {v:.4e}  median {m:.4e}  "
                  f"(median x{m0 / m:.1f} vs epoch 0)", flush=True)
            record(tag, out, path=path)
            # top-k keyed on the MEDIAN (the r4 run keyed on the mean and
            # kept a 1.1e11-scored checkpoint)
            tr.save_topk(os.path.join(ROOT, "checkpoints", tag),
                         m, k=2)
    v, m = validate()
    out["vals"].append({"epoch": tr.epoch, "val_loss": v, "val_median": m})
    out["val_reduction_vs_epoch0"] = v0 / v
    out["median_reduction_vs_epoch0"] = m0 / m
    losses = [e["loss"] for e in out["epochs"]]
    w = max(len(losses) // 10, 1)
    out["loss_decreased"] = (len(losses) > 2 * w and
                             float(np.mean(losses[-w:]))
                             < float(np.mean(losses[:w])))
    record(tag, out, path=path)
    print(f"done: epochs {tr.epoch}  final val mean {v:.4e} median {m:.4e}"
          f"  median reduction x{m0 / m:.1f}  "
          f"loss_decreased={out['loss_decreased']}", flush=True)


if __name__ == "__main__":
    main()
