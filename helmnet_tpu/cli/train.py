"""Training CLI (reference train.py).

    python -m helmnet_tpu.cli.train --parameters experiments/base.json \
        --epochs 1000 --data-parallel 4

--smoke runs a tiny CPU-friendly end-to-end training (generated data,
32^2 grid, a few epochs) for verification.
"""

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--parameters", type=str, default=None,
                   help="experiment JSON (reference-compatible sections)")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--data-parallel", type=int, default=1,
                   help="devices on the mesh 'data' axis")
    p.add_argument("--log-dir", type=str, default="logs")
    p.add_argument("--ckpt-dir", type=str, default="checkpoints")
    p.add_argument("--val-every", type=int, default=2)
    p.add_argument("--val-iterations", type=int, default=None)
    p.add_argument("--platform", type=str, default=None,
                   help="force jax platform (e.g. cpu)")
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--multihost", action="store_true",
                   help="multi-process run: jax.distributed.initialize "
                        "(auto-detect on TPU pods, or pass --coordinator/"
                        "--num-processes/--process-id)")
    p.add_argument("--coordinator", type=str, default=None,
                   help="host:port of process 0 (multihost)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    args = p.parse_args(argv)

    if args.smoke and args.platform is None:
        # --smoke is the CPU verification path; without this, an ambient
        # remote-TPU platform (JAX_PLATFORMS=axon) hangs the smoke check
        # whenever the tunneled worker is down. --platform default
        # restores device-targeting smoke runs.
        args.platform = "cpu"
    if args.platform and args.platform != "default":
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.multihost:
        from ..distributed import multihost

        multihost.initialize(
            args.coordinator, args.num_processes, args.process_id
        )
    import jax

    from ..core.config import Config, ParallelConfig
    from ..core.meshes import make_mesh
    from ..data.ellipses import load_maps, make_dataset
    from ..train.loop import Trainer

    if args.smoke:
        from ..core.config import (
            GeometryConfig,
            ModelConfig,
            SourceConfig,
            TrainingConfig,
        )

        cfg = Config(
            max_iterations=50,
            geometry=GeometryConfig(domain_size=32, pml_size=4),
            model=ModelConfig(),
            source=SourceConfig(location=(26, 16)),
            training=TrainingConfig(
                buffer_size=16, train_batch_size=4, unrolling_steps=3,
                learning_rate=3e-3,
            ),
        )
        train_maps = make_dataset(16, 32, seed=0)
        val_maps = make_dataset(4, 32, seed=1)
        epochs = args.epochs or 8
        val_iters = args.val_iterations or 10
    else:
        cfg = (
            Config.from_json_file(args.parameters)
            if args.parameters
            else Config()
        )
        train_maps = load_maps(cfg.medium.train_set)
        val_maps = load_maps(cfg.medium.validation_set)
        epochs = args.epochs or cfg.training.max_epochs
        val_iters = args.val_iterations

    mesh = None
    if args.data_parallel > 1:
        cfg = cfg.replace(parallel=ParallelConfig(data=args.data_parallel))
        mesh = make_mesh(cfg.parallel)
        print(f"mesh: {mesh}")

    print(f"devices: {jax.devices()}")
    trainer = Trainer(cfg, mesh=mesh, log_dir=args.log_dir)
    history = trainer.fit(
        train_maps,
        val_maps,
        num_epochs=epochs,
        val_every=args.val_every,
        val_iterations=val_iters,
        ckpt_dir=None if args.smoke else args.ckpt_dir,
    )
    for h in history:
        print(
            f"epoch {h['epoch']:4d}  loss {h['train_loss_mean']:.4e}  "
            f"maxiter {h['maxiter']:4d}  new_sos {h['new_sos']:3d}  "
            f"lr {h['lr']:.1e}  {h['epoch_time_s']:.1f}s"
            + (f"  val {h['val_loss']:.4e}" if "val_loss" in h else "")
        )
    if args.smoke:
        losses = [h["train_loss_mean"] for h in history]
        ok = min(losses[1:]) < losses[0] and np.isfinite(losses).all()
        print("SMOKE", "PASS" if ok else "FAIL", losses)
        return 0 if ok else 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
