"""Measured roofline decomposition of the bench primary (VERDICT r4 #6).

Is 298.7M gridpoints/s at 96^2 x batch 32 x 500 iterations a wall, or
headroom? This measures, on the real chip:

  - XLA's optimized-HLO cost model for the EXACT bench executable
    (compiled.cost_analysis(): flops + bytes accessed), giving
    arithmetic intensity and the compute/bandwidth bound times,
  - wall-clock per iteration (warm executable, small-fetch timing),
  - achieved fraction of v5e peak (bf16 MXU 197 TFLOP/s, HBM 819 GB/s
    — public chip specs), per batch size,
  - batch scaling (RF_BATCHES, default 32,64,128): if per-sample time
    falls with batch, batch 32 is launch/occupancy-bound, not a wall.

Writes R5_ROOFLINE.json. The bench primary workload itself stays
batch 32 (the baseline-comparable config, bench_baseline.json); any
larger-batch throughput goes in as `throughput_best` context.

Run on the chip: timeout 2400 python tools/r5_roofline.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
ROOT = os.path.join(os.path.dirname(__file__), "..")

V5E_BF16_FLOPS = 197e12  # peak MXU, bf16 multiply / f32 accumulate
V5E_HBM_BPS = 819e9


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from helmnet_tpu.ops.source import point_source_map
    from helmnet_tpu.ops.spectral import make_operator
    from helmnet_tpu.solvers.iterative import rollout
    from helmnet_tpu.train.checkpoint import load_reference_checkpoint

    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    ckpt = "/root/reference/trained_models/jcp_paper_trained_weights.ckpt"
    params, cfg = load_reference_checkpoint(ckpt)
    import dataclasses

    cfg = cfg.replace(model=dataclasses.replace(cfg.model,
                                                up_mode="subpixel"))

    n, iters = 96, 500
    op = make_operator(n, n, cfg.geometry.pml_size, cfg.geometry.sigma_max,
                       cfg.k0)
    s = cfg.source
    src1 = point_source_map(n, n, s.location, s.amplitude, s.phase, s.omega)

    batches = [int(b) for b in
               os.environ.get("RF_BATCHES", "32,64,128").split(",")]
    out = {"device": str(dev), "grid": n, "iterations": iters,
           "peak_bf16_flops": V5E_BF16_FLOPS, "peak_hbm_Bps": V5E_HBM_BPS,
           "cases": {}}

    for batch in batches:
        source = jnp.asarray(np.broadcast_to(src1[None], (batch, n, n, 2)))
        sos = np.ones((batch, n, n), np.float32)
        sos[:, : n // 2, : n // 2] = 1.5
        sos = jnp.asarray(sos)

        kw = dict(cfg=cfg, num_iterations=iters, collect=("rmse",))
        t0 = time.time()
        lowered = rollout.lower(params, op, source, sos, **kw)
        compiled = lowered.compile()
        compile_s = time.time() - t0
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0))
        nbytes = float(ca.get("bytes accessed", 0.0))

        def run():
            r = np.asarray(compiled(params, op, source, sos)["rmse"])
            assert np.all(np.isfinite(r))

        run()
        times = []
        for _ in range(3):
            t1 = time.time()
            run()
            times.append(time.time() - t1)
        dt = min(times)

        t_flops = flops / V5E_BF16_FLOPS
        t_bytes = nbytes / V5E_HBM_BPS
        case = {
            "batch": batch,
            "seconds": dt,
            "compile_seconds": round(compile_s, 1),
            "gridpoints_per_s": batch * n * n * iters / dt,
            "us_per_iteration": dt / iters * 1e6,
            "us_per_iteration_per_sample": dt / iters / batch * 1e6,
            "hlo_gflops_total": flops / 1e9,
            "hlo_gbytes_total": nbytes / 1e9,
            "arithmetic_intensity_flops_per_byte":
                flops / nbytes if nbytes else None,
            "achieved_tflops": flops / dt / 1e12,
            "pct_of_bf16_peak": 100 * flops / dt / V5E_BF16_FLOPS,
            "achieved_GBps": nbytes / dt / 1e9,
            "pct_of_hbm_bw": 100 * nbytes / dt / V5E_HBM_BPS,
            "compute_bound_floor_s": t_flops,
            "bandwidth_bound_floor_s": t_bytes,
            "roofline_floor_s": max(t_flops, t_bytes),
            "headroom_x_vs_roofline": dt / max(t_flops, t_bytes)
            if max(t_flops, t_bytes) > 0 else None,
        }
        out["cases"][str(batch)] = case
        print(json.dumps(case, indent=1), flush=True)

    b0 = out["cases"].get("32")
    best = max(out["cases"].values(), key=lambda c: c["gridpoints_per_s"])
    out["throughput_best"] = {"batch": best["batch"],
                              "gridpoints_per_s": best["gridpoints_per_s"]}
    if b0:
        bound = ("bandwidth" if b0["bandwidth_bound_floor_s"]
                 > b0["compute_bound_floor_s"] else "compute")
        out["verdict"] = {
            "binding_roofline_at_batch32": bound,
            "headroom_x": b0["headroom_x_vs_roofline"],
            "note": ("headroom_x ~ 1 => at the roofline for the HLO's "
                     "flops/bytes; >> 1 => launch/occupancy-bound at "
                     "this size (see batch scaling of "
                     "us_per_iteration_per_sample)"),
        }
    path = os.path.join(ROOT, "R5_ROOFLINE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
