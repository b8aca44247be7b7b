"""Post-hoc quality evaluation of the sharded-trained checkpoints.

The in-run val metric is the MEAN of final residual RMSE over 300-
iteration rollouts, which mid-training is dominated by one or two
diverging samples (2.3e10 while the train loss falls monotonically).
This scores the saved checkpoints robustly after the fact:

  - latest + best checkpoints of checkpoints/sharded_quality_dyx
  - vs the epoch-0 (fresh-init, same seed) model
  - median AND mean of final residual RMSE, 100- and 300-iteration
    rollouts, plus best-iterate median, on the same held-out maps and
    seeded sources as the run

and appends a `posthoc` block to the run's entry in
TRAIN_SHARDED_QUALITY.json. CPU (virtual mesh not needed — inference is
single-device).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ROOT = os.path.join(os.path.dirname(__file__), "..")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from _extras import record
    from helmnet_tpu.core.config import Config
    from helmnet_tpu.data.ellipses import make_dataset
    from helmnet_tpu.solvers.iterative import rollout
    from helmnet_tpu.train.loop import Trainer

    tag = os.environ.get("PH_TAG", "sharded_quality_dyx")
    unroll = int(os.environ.get("PH_UNROLL", "5"))

    cfg = Config()
    cfg = cfg.replace(training=dataclasses.replace(
        cfg.training, buffer_size=64, train_batch_size=8,
        unrolling_steps=unroll, learning_rate=1e-3,
        minimum_learning_rate=1e-4,
    ))
    maps = make_dataset(64 + 16, 96, seed=7)
    val_maps = maps[64:]

    tr = Trainer(cfg)
    val_sources = tr.make_val_sources(len(val_maps))

    def score(params, iters):
        out = rollout(
            params, tr.op, jnp.asarray(val_sources),
            jnp.asarray(val_maps), cfg=cfg, num_iterations=iters,
            collect=("rmse", "best"),
        )
        rm = np.asarray(out["rmse"])
        finals = np.where(np.isnan(rm[-1]), np.inf, rm[-1])
        best = np.asarray(out["best_rmse"])
        iter0 = float(np.median(rm[0]))
        return {
            "final_median": float(np.median(finals)),
            "final_mean": float(np.mean(finals)),
            "best_median": float(np.median(best)),
            "iter0_median": iter0,
            # the verdict's metric: reduction of the rollout's own
            # iteration-0 residual (TRAINING3D 'reduction' convention)
            "best_reduction_vs_iter0": iter0 / max(float(np.median(best)),
                                                   1e-30),
            "diverged": int(np.sum(~np.isfinite(finals))),
        }

    results = {"epoch0": {}, "best": {}, "last": {}}
    for iters in (100, 300):
        results["epoch0"][str(iters)] = score(tr.params, iters)
        print(f"epoch0 @{iters}: {results['epoch0'][str(iters)]}",
              flush=True)

    ckpt = os.path.join(ROOT, "checkpoints", tag)
    for which, best in (("best", True), ("last", False)):
        t2 = Trainer(cfg)
        if not t2.restore(ckpt, best=best):
            print(f"no {which} checkpoint", flush=True)
            continue
        results[which]["epoch"] = t2.epoch
        for iters in (100, 300):
            results[which][str(iters)] = score(t2.params, iters)
            print(f"{which} (ep {t2.epoch}) @{iters}: "
                  f"{results[which][str(iters)]}", flush=True)

    for which in ("best", "last"):
        if "100" in results[which]:
            for iters in ("100", "300"):
                e0 = results["epoch0"][iters]["final_median"]
                w = results[which][iters]["final_median"]
                results[which][iters]["median_reduction_vs_epoch0"] = (
                    e0 / w if w > 0 else float("inf")
                )

    path = os.path.join(ROOT, "TRAIN_SHARDED_QUALITY.json")
    data = json.load(open(path)) if os.path.exists(path) else {}
    entry = data.get(tag, {})
    entry["posthoc"] = results
    record(tag, entry, path=path)
    print(json.dumps(results, indent=2), flush=True)


if __name__ == "__main__":
    main()
