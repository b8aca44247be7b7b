"""Serving-layer benchmark on the real chip: sustained request throughput
through SolverService's micro-batching path (helmnet_tpu/serve.py).

Submits WAVES of concurrent 96^2 requests (mixed source locations) at the
pinned batch size and measures end-to-end request latency and sustained
solve throughput — the number a deployment actually sees, including the
tunnel round trips the raw kernel benchmarks exclude. One warmup wave
pays the (size, batch, chunk) executable compile; every later wave must
be compile-free (asserted via stats: batches grow, by_size stays single).

Writes `serve_96` into R2_TPU_EXTRAS.json.

Env knobs: SERVE_WAVES (6), SERVE_BATCH (8), SERVE_ITERS (500),
SERVE_CHUNK (100).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..")
EXTRAS = os.path.join(ROOT, "R2_TPU_EXTRAS.json")


def record(key, value):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _extras import record as _record
    _record(key, value, path=EXTRAS)


def main():
    import jax

    from helmnet_tpu.serve import ServeConfig, SolverService

    print("devices:", jax.devices(), flush=True)
    waves = int(os.environ.get("SERVE_WAVES", "6"))
    batch = int(os.environ.get("SERVE_BATCH", "8"))
    iters = int(os.environ.get("SERVE_ITERS", "500"))
    chunk = int(os.environ.get("SERVE_CHUNK", "100"))
    n = 96

    service = SolverService.from_checkpoint(
        os.path.join(ROOT, "checkpoints", "tpu_r2c"),
        ServeConfig(max_batch=batch, chunk_iterations=chunk,
                    default_iterations=iters, batch_window_s=0.05),
    )
    rng = np.random.default_rng(0)

    def wave():
        futs = []
        for i in range(batch):
            sos = np.ones((n, n), np.float32)
            y0, x0 = rng.integers(16, 48, 2)
            sos[y0:y0 + 32, x0:x0 + 32] = 1.0 + rng.random()
            futs.append(service.submit(
                sos, source_location=(int(rng.integers(70, 88)),
                                      int(rng.integers(20, 76))),
                iterations=iters,
            ))
        return [f.result(timeout=1200) for f in futs]

    print("warmup wave (compiles) ...", flush=True)
    t0 = time.time()
    wave()
    warm_s = time.time() - t0
    print(f"  warmup {warm_s:.1f}s", flush=True)

    t0 = time.time()
    lat, best = [], []
    for _ in range(waves):
        outs = wave()
        lat.extend(o["latency_s"] for o in outs)
        best.extend(o["best_rmse"] for o in outs)
    dt = time.time() - t0
    n_req = waves * batch
    stats = service.stats()
    service.shutdown()

    out = {
        "grid": n,
        "iterations": iters,
        "pinned_batch": batch,
        "requests": n_req,
        "warmup_s": round(warm_s, 1),
        "requests_per_s": round(n_req / dt, 2),
        "gridpoints_per_s": round(n_req * n * n * iters / dt / 1e6, 1),
        "latency_p50_s": round(float(np.median(lat)), 3),
        "latency_p95_s": round(float(np.percentile(lat, 95)), 3),
        "best_rmse_median": float(np.median(best)),
        "mean_occupancy": stats.get("mean_occupancy"),
        "batches": stats["batches"],
        "note": "end-to-end served solves (tunnel round trips included); "
                "steady-state waves after one compile-paying warmup",
    }
    print(json.dumps(out), flush=True)
    record("serve_96", out)


if __name__ == "__main__":
    main()
