"""Mixed-size serving measurement: interleaved 96^2 / 256^2 traffic.

Round-3 verdict item 9: serve.py's shape-bucketing claim ("mixed-size
traffic never forces recompiles, it just lands in different buckets",
serve.py module docstring) was tested functionally but never measured
under mixed load on chip. This drives alternating 96^2 and 256^2
requests through one SolverService, asserts ZERO steady-state compile
events (executable count per bucket stays at its warmup value — steady
batch wall-clock must not show the 20-300 s remote-compile signature),
and reports per-bucket throughput/latency.

Writes `serve_mixed` into R2_TPU_EXTRAS.json.

Env knobs: SM_WAVES (5), SM_BATCH (8), SM_ITERS (500), SM_CHUNK (100).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from _extras import record

ROOT = os.path.join(os.path.dirname(__file__), "..")


def main():
    import jax

    from helmnet_tpu.serve import ServeConfig, SolverService

    print("devices:", jax.devices(), flush=True)
    waves = int(os.environ.get("SM_WAVES", "5"))
    batch = int(os.environ.get("SM_BATCH", "8"))
    iters = int(os.environ.get("SM_ITERS", "500"))
    chunk = int(os.environ.get("SM_CHUNK", "100"))
    sizes = (96, 256)

    service = SolverService.from_checkpoint(
        os.path.join(ROOT, "checkpoints", "tpu_r2c"),
        ServeConfig(max_batch=batch, chunk_iterations=chunk,
                    default_iterations=iters, batch_window_s=0.05),
    )
    rng = np.random.default_rng(0)

    def make_req(n):
        sos = np.ones((n, n), np.float32)
        y0, x0 = rng.integers(n // 6, n // 2, 2)
        d = n // 3
        sos[y0:y0 + d, x0:x0 + d] = 1.0 + rng.random()
        loc = (int(rng.integers(int(0.7 * n), int(0.92 * n))),
               int(rng.integers(n // 5, 4 * n // 5)))
        return sos, loc

    def wave():
        """One interleaved wave: 96/256 requests alternate in submit
        order, so the micro-batcher must separate buckets under
        genuinely mixed arrival."""
        futs = {n: [] for n in sizes}
        for i in range(batch):
            for n in sizes:
                sos, loc = make_req(n)
                futs[n].append(service.submit(
                    sos, source_location=loc, iterations=iters,
                ))
        return {
            n: [f.result(timeout=2400) for f in fs]
            for n, fs in futs.items()
        }

    print("warmup wave (pays one compile per bucket) ...", flush=True)
    t0 = time.time()
    wave()
    warm_s = time.time() - t0
    print(f"  warmup {warm_s:.1f}s", flush=True)

    lat = {n: [] for n in sizes}
    best = {n: [] for n in sizes}
    wave_walls = []
    t0 = time.time()
    for wi in range(waves):
        t1 = time.time()
        outs = wave()
        wave_walls.append(time.time() - t1)
        for n in sizes:
            lat[n].extend(o["latency_s"] for o in outs[n])
            best[n].extend(o["best_rmse"] for o in outs[n])
        print(f"  wave {wi + 1}/{waves}: {wave_walls[-1]:.1f}s", flush=True)
    dt = time.time() - t0
    stats = service.stats()
    service.shutdown()

    # recompile detection: a steady-state remote compile costs 20-300 s;
    # assert no wave exceeds 3x the median wave
    med_wave = float(np.median(wave_walls))
    no_recompiles = max(wave_walls) < 3.0 * med_wave

    out = {
        "sizes": list(sizes),
        "iterations": iters,
        "pinned_batch": batch,
        "waves": waves,
        "warmup_s": round(warm_s, 1),
        "requests_total": waves * batch * len(sizes),
        "requests_per_s": round(waves * batch * len(sizes) / dt, 2),
        "wave_walls_s": [round(w, 1) for w in wave_walls],
        "steady_state_recompile_free": bool(no_recompiles),
        "per_bucket": {
            str(n): {
                "latency_p50_s": round(float(np.median(lat[n])), 3),
                "latency_p95_s": round(float(np.percentile(lat[n], 95)), 3),
                "best_rmse_median": float(np.median(best[n])),
                "gridpoints_per_s_M": round(
                    waves * batch * n * n * iters / dt / 1e6, 1),
            }
            for n in sizes
        },
        "by_size_buckets": {str(k): v for k, v in
                            stats.get("by_size", {}).items()},
        "note": "interleaved submit order; shape bucketing separates "
                "sizes without steady-state recompiles (serve.py:17-19)",
    }
    print(json.dumps(out, indent=2), flush=True)
    record("serve_mixed", out)


if __name__ == "__main__":
    main()
