"""3D TPU training run (Trainer3D, train/loop3d.py), bounded by wall-clock,
with in-run top-k validation checkpointing.

Capability extension: the reference trains 2D-only. Default configuration
is a 48^3 volume (divisible by 2^depth for depth<=4), ellipsoidal-shell
phantoms, bf16 network precision, random-source curriculum — the recipe
that beat the reference checkpoint in 2D (TRAINING.md), carried to 3D.

    nohup timeout 7200 python tools/train3d_tpu_run.py --hours 1.5 \
        --tag tpu3d_a --p-random-source 0.5 > logs/tpu3d_a.log 2>&1 &
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hours", type=float, default=1.0)
    ap.add_argument("--size", type=int, default=48)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--features", type=int, default=16)
    ap.add_argument("--train-maps", type=int, default=400)
    ap.add_argument("--val-maps", type=int, default=16)
    ap.add_argument("--buffer", type=int, default=96)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--unroll", type=int, default=10)
    ap.add_argument("--precision", type=str, default="default")
    ap.add_argument("--tag", type=str, default="tpu3d")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--p-random-source", type=float, default=0.5)
    ap.add_argument("--top-k", type=int, default=3)
    ap.add_argument("--val-every", type=int, default=10)
    ap.add_argument("--val-iters", type=int, default=200)
    ap.add_argument("--batches-per-epoch", type=int, default=None)
    ap.add_argument("--interior-heterogeneity", type=float, default=0.0,
                    help="fill the shell interior with a smooth random sos "
                         "field up to this contrast (heterogeneous-3D "
                         "training regime, round-4)")
    ap.add_argument("--no-remat", action="store_true",
                    help="disable BPTT-step rematerialization (needs ~35x "
                         "the HBM at the default config)")
    args = ap.parse_args()

    import jax

    from helmnet_tpu.core.config import Config
    from helmnet_tpu.data.ellipsoids3d import make_dataset3d
    from helmnet_tpu.train.loop3d import Trainer3D

    print("devices:", jax.devices(), flush=True)

    cfg = Config()
    cfg = cfg.replace(
        geometry=dataclasses.replace(cfg.geometry, domain_size=args.size),
        model=dataclasses.replace(
            cfg.model,
            depth=args.depth,
            state_depth=args.depth,
            features=args.features,
            precision=args.precision,
            in_channels=7,
        ),
        training=dataclasses.replace(
            cfg.training,
            buffer_size=args.buffer,
            train_batch_size=args.batch,
            unrolling_steps=args.unroll,
            learning_rate=args.lr,
            p_random_source=args.p_random_source,
            remat=not args.no_remat,
        ),
    )

    data_dir = os.path.join(
        os.path.dirname(__file__), "..", "datasets", args.tag
    )
    os.makedirs(data_dir, exist_ok=True)
    cache = os.path.join(data_dir, "maps3d.npz")
    if os.path.exists(cache):
        with np.load(cache) as f:
            train_maps, val_maps = f["train"], f["val"]
    else:
        print("generating 3D dataset ...", flush=True)
        maps = make_dataset3d(
            args.train_maps + args.val_maps, args.size, seed=42,
            interior_heterogeneity=args.interior_heterogeneity,
        )
        train_maps = maps[: args.train_maps]
        val_maps = maps[args.train_maps :]
        np.savez_compressed(cache, train=train_maps, val=val_maps)
    print(f"train {train_maps.shape}  val {val_maps.shape}", flush=True)

    log_dir = os.path.join(os.path.dirname(__file__), "..", "runs", args.tag)
    ckpt_dir = os.path.join(
        os.path.dirname(__file__), "..", "checkpoints", args.tag
    )
    trainer = Trainer3D(cfg, log_dir=log_dir)
    if trainer.restore(ckpt_dir):
        print(f"resumed at epoch {trainer.epoch}  "
              f"lr {trainer.scheduler.lr:.2e}", flush=True)
    trainer.fill_buffer(train_maps)

    deadline = time.time() + args.hours * 3600
    while time.time() < deadline and trainer.epoch < cfg.training.max_epochs:
        stats = trainer.training_epoch(args.batches_per_epoch)
        print(
            f"epoch {stats['epoch']:4d}  loss {stats['train_loss_mean']:.4e}  "
            f"maxiter {stats['maxiter']:4d}  new_sos {stats['new_sos']:3d}  "
            f"lr {stats['lr']:.1e}  {stats['epoch_time_s']:.1f}s",
            flush=True,
        )
        if trainer.epoch % args.val_every == 0:
            v = trainer.validate(val_maps, num_iterations=args.val_iters)
            print(f"  val_median {v['val_median']:.4e}  "
                  f"val_p90 {v['val_p90']:.4e}", flush=True)
            trainer.save_topk(ckpt_dir, v["val_median"], k=args.top_k)
            trainer.save_state(ckpt_dir)
    v = trainer.validate(val_maps, num_iterations=args.val_iters)
    trainer.save_topk(ckpt_dir, v["val_median"], k=args.top_k)
    trainer.save_state(ckpt_dir)
    print(f"done at epoch {trainer.epoch}  final val_median "
          f"{v['val_median']:.4e}", flush=True)


if __name__ == "__main__":
    main()
