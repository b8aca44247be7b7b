"""TPU training run at the reference configuration (96^2, buffer 600,
batch 32, unroll 10), bounded by wall-clock, with in-run top-k validation
checkpointing (ModelCheckpoint semantics, reference train.py:90-97).

Round-2 recipe (VERDICT.md item 1): bf16 network precision, full 9000-map
dataset, lr 1e-3 with plateau decay, random-source curriculum
(--p-random-source) so training directly optimizes the random-circle
generalization the validation protocol measures.

    python tools/train_tpu_run.py --hours 5 --tag tpu_r2a \
        --train-maps 9000 --lr 1e-3 --p-random-source 0.5
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
    ap.add_argument("--train-maps", type=int, default=9000)
    ap.add_argument("--val-maps", type=int, default=64)
    ap.add_argument("--precision", type=str, default="default")
    ap.add_argument("--tag", type=str, default="tpu_r2")
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--p-random-source", type=float, default=0.0)
    ap.add_argument("--p-extended-source", type=float, default=0.0,
                    help="fraction of restarted slots drawing a random line-"
                         "segment source (far-OOD curriculum)")
    ap.add_argument("--val-extended-frac", type=float, default=0.0,
                    help="fraction of the fixed validation set using line-"
                         "segment sources (scores the extended regime in-run)")
    ap.add_argument("--top-k", type=int, default=3)
    ap.add_argument("--val-every", type=int, default=10)
    ap.add_argument("--val-iters", type=int, default=500)
    ap.add_argument("--max-epochs", type=int, default=None)
    ap.add_argument("--epoch-budget", type=int, default=None,
                    help="cap on epochs trained THIS RUN (absolute cap = "
                         "restored epoch + budget); required when resuming "
                         "a warm-started tag whose counter is near "
                         "max_epochs (see TRAINING_r3d.md)")
    ap.add_argument("--init-from", type=str, default=None,
                    help="tag whose BEST checkpoint warm-starts params/opt "
                         "state when this tag has no checkpoint yet")
    ap.add_argument("--size", type=int, default=96,
                    help="training grid size (round-3: BASELINE config #5 "
                         "calls for large-grid training; one chip fits 256 "
                         "with the default buffer, 512 with --buffer <=128)")
    ap.add_argument("--buffer", type=int, default=None,
                    help="replay buffer slots (HBM ~ buffer * size^2 * "
                         "(7 + state_ch*4/3) * 4 B on the device path)")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--unroll", type=int, default=None)
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize each BPTT step (required for "
                         "1024^2 on one chip; see TrainingConfig.remat)")
    args = ap.parse_args()

    import dataclasses

    import jax

    from helmnet_tpu.core.config import Config
    from helmnet_tpu.data.ellipses import make_dataset
    from helmnet_tpu.train.loop import Trainer, resolve_epoch_cap

    print("devices:", jax.devices(), flush=True)

    cfg = Config()
    # source location scales with the grid (reference base.json location is
    # for 96^2); geometry/PML stay at the reference proportions
    scale = args.size / cfg.geometry.domain_size
    loc = tuple(int(round(c * scale)) for c in cfg.source.location)
    cfg = cfg.replace(
        geometry=dataclasses.replace(cfg.geometry, domain_size=args.size),
        source=dataclasses.replace(cfg.source, location=loc),
        model=dataclasses.replace(cfg.model, precision=args.precision),
        training=dataclasses.replace(
            cfg.training,
            p_random_source=args.p_random_source,
            p_extended_source=args.p_extended_source,
            **({"learning_rate": args.lr} if args.lr else {}),
            **({"max_epochs": args.max_epochs} if args.max_epochs else {}),
            **({"buffer_size": args.buffer} if args.buffer else {}),
            **({"train_batch_size": args.batch} if args.batch else {}),
            **({"unrolling_steps": args.unroll} if args.unroll else {}),
            **({"remat": True} if args.remat else {}),
        ),
    )

    data_dir = os.path.join(os.path.dirname(__file__), "..", "datasets", args.tag)
    os.makedirs(data_dir, exist_ok=True)
    cache = os.path.join(data_dir, "maps.npz")
    if os.path.exists(cache):
        with np.load(cache) as f:
            train_maps, val_maps = f["train"], f["val"]
    else:
        print("generating dataset ...", flush=True)
        maps = make_dataset(args.train_maps + args.val_maps, args.size, seed=42)
        train_maps, val_maps = maps[: args.train_maps], maps[args.train_maps :]
        np.savez_compressed(cache, train=train_maps, val=val_maps)
    print(f"train maps {len(train_maps)}  val maps {len(val_maps)}", flush=True)

    log_dir = os.path.join(os.path.dirname(__file__), "..", "runs", args.tag)
    ckpt_dir = os.path.join(
        os.path.dirname(__file__), "..", "checkpoints", args.tag
    )
    trainer = Trainer(cfg, log_dir=log_dir, device_buffer=True)
    warm_started = False
    if trainer.restore(ckpt_dir):
        print(f"resumed at epoch {trainer.epoch}  lr {trainer.scheduler.lr:.2e}",
              flush=True)
    elif args.init_from:
        src = os.path.join(
            os.path.dirname(__file__), "..", "checkpoints", args.init_from
        )
        if not trainer.restore(src, best=True):
            raise SystemExit(f"--init-from {args.init_from}: no checkpoint")
        if args.lr:  # explicit lr overrides the restored scheduler state
            trainer.scheduler.lr = args.lr
        # a warm start is a NEW run (often on a shifted source/data
        # distribution): the restored plateau best would mark every epoch
        # of the adaptation transient as "bad" and halve the lr to the
        # floor within tens of epochs — reset the plateau state
        trainer.scheduler.best = float("inf")
        trainer.scheduler.bad_epochs = 0
        warm_started = True
        print(f"warm start from {args.init_from} best (epoch {trainer.epoch}) "
              f"lr {trainer.scheduler.lr:.2e}", flush=True)
    trainer.fill_buffer(train_maps)
    val_sources = trainer.make_val_sources(
        len(val_maps), extended_frac=args.val_extended_frac
    )

    epoch_cap = resolve_epoch_cap(
        trainer.epoch, cfg.training.max_epochs,
        warm_started=warm_started, epoch_budget=args.epoch_budget,
    )
    print(f"epoch cap {epoch_cap} (start {trainer.epoch})", flush=True)
    if epoch_cap <= trainer.epoch:
        # a resumed warm-started tag restores epoch >= max_epochs with
        # warm_started=False; without this guard the run silently trains
        # zero epochs (ADVICE r3) — demand an explicit budget instead
        raise SystemExit(
            f"epoch cap {epoch_cap} <= restored epoch {trainer.epoch}: this "
            f"run would train ZERO epochs. Pass --epoch-budget N to extend "
            f"a resumed warm-started tag (absolute cap = restored + N)."
        )
    deadline = time.time() + args.hours * 3600
    while time.time() < deadline and trainer.epoch < epoch_cap:
        stats = trainer.training_epoch(train_maps)
        print(
            f"epoch {stats['epoch']:4d}  loss {stats['train_loss_mean']:.4e}  "
            f"maxiter {stats['maxiter']:4d}  new_sos {stats['new_sos']:3d}  "
            f"lr {stats['lr']:.1e}  {stats['epoch_time_s']:.1f}s",
            flush=True,
        )
        if trainer.epoch % args.val_every == 0:
            v = trainer.validate(
                val_maps, num_iterations=args.val_iters, batch=32,
                sources=val_sources,
            )
            print(f"  val_loss {v['val_loss']:.4e}", flush=True)
            trainer.save_topk(ckpt_dir, v["val_loss"], k=args.top_k)
    # final save (save_last; never the best unless it also validates best)
    v = trainer.validate(
        val_maps, num_iterations=args.val_iters, batch=32, sources=val_sources
    )
    trainer.save_topk(ckpt_dir, v["val_loss"], k=args.top_k)
    print(f"done at epoch {trainer.epoch}  final val_loss {v['val_loss']:.4e}",
          flush=True)


if __name__ == "__main__":
    main()
