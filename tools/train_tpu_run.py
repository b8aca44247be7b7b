"""Round-1 TPU training run: from-scratch unsupervised training at the
reference configuration (96^2, buffer 600, batch 32, unroll 10), bounded by
wall-clock. Artifacts: runs/tpu_r1/ (JSONL log), checkpoints/tpu_r1/.

    python tools/train_tpu_run.py --hours 2.0
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hours", type=float, default=2.0)
    ap.add_argument("--train-maps", type=int, default=2600)
    ap.add_argument("--val-maps", type=int, default=64)
    ap.add_argument("--precision", type=str, default="default")
    ap.add_argument("--tag", type=str, default="tpu_r1")
    ap.add_argument("--lr", type=float, default=None)
    args = ap.parse_args()

    import dataclasses

    import jax

    from helmnet_tpu.core.config import Config
    from helmnet_tpu.data.ellipses import make_dataset
    from helmnet_tpu.train.loop import Trainer

    print("devices:", jax.devices(), flush=True)

    cfg = Config()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, precision=args.precision)
    )
    if args.lr:
        cfg = cfg.replace(
            training=dataclasses.replace(cfg.training, learning_rate=args.lr)
        )

    data_dir = os.path.join(os.path.dirname(__file__), "..", "datasets", args.tag)
    os.makedirs(data_dir, exist_ok=True)
    cache = os.path.join(data_dir, "maps.npz")
    if os.path.exists(cache):
        with np.load(cache) as f:
            train_maps, val_maps = f["train"], f["val"]
    else:
        print("generating dataset ...", flush=True)
        maps = make_dataset(args.train_maps + args.val_maps, 96, seed=42)
        train_maps, val_maps = maps[: args.train_maps], maps[args.train_maps :]
        np.savez_compressed(cache, train=train_maps, val=val_maps)

    log_dir = os.path.join(os.path.dirname(__file__), "..", "runs", args.tag)
    ckpt_dir = os.path.join(
        os.path.dirname(__file__), "..", "checkpoints", args.tag
    )
    trainer = Trainer(cfg, log_dir=log_dir, device_buffer=True)
    if trainer.restore(ckpt_dir):
        print(f"resumed at epoch {trainer.epoch}", flush=True)
    trainer.fill_buffer(train_maps)

    deadline = time.time() + args.hours * 3600
    while time.time() < deadline and trainer.epoch < cfg.training.max_epochs:
        stats = trainer.training_epoch(train_maps)
        print(
            f"epoch {stats['epoch']:4d}  loss {stats['train_loss_mean']:.4e}  "
            f"maxiter {stats['maxiter']:4d}  new_sos {stats['new_sos']:3d}  "
            f"{stats['epoch_time_s']:.1f}s",
            flush=True,
        )
        if trainer.epoch % 10 == 0:
            v = trainer.validate(val_maps, num_iterations=300, batch=32)
            print(f"  val_loss {v['val_loss']:.4e}", flush=True)
            trainer.save(ckpt_dir)
    trainer.save(ckpt_dir)
    print("done at epoch", trainer.epoch, flush=True)


if __name__ == "__main__":
    main()
