"""Benchmark: learned Helmholtz solver throughput on the current device.

Prints ONE JSON line:
  {"metric": "solver_gridpoints_per_s_per_chip", "value": N, "unit": "...",
   "vs_baseline": R}

Workload matches bench_baseline.json (the reference torch implementation
measured on this host's CPU — no reference-capable GPU exists here): 96^2
grid, batch 32, 500 learned iterations (the reference's own test-set solve
length), pretrained-checkpoint weights. vs_baseline = ours / reference on
the same workload. Extra workloads are written to BENCH_DETAILS.json.
"""

import json
import os
import time

import numpy as np

# The driver runs `timeout 1200 python bench.py`; remote TPU compiles cost
# 20-300 s per new executable (CLAUDE.md), so an unbounded workload sweep
# can be killed before the JSON line prints. Guard every optional workload
# behind a wall-clock budget and always emit the primary result.
T_START = time.time()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1050"))


def time_left() -> float:
    return BUDGET_S - (time.time() - T_START)


def _tpu_reachable(timeout_s: float = 240.0) -> bool:
    """Probe the tunneled TPU in a SUBPROCESS with a timeout: when the
    axon worker is down, jax.devices() blocks forever in-process and the
    driver would record no bench line at all."""
    import subprocess

    try:
        r = subprocess.run(
            [os.sys.executable, "-c",
             "import jax; jax.devices(); print('ok')"],
            timeout=timeout_s, capture_output=True, text=True,
        )
        return r.returncode == 0 and "ok" in r.stdout
    except Exception:
        return False


def select_headline(details: dict, primary: dict, base: dict | None):
    """Pick the headline workload and its vs-baseline ratio.

    Rules (pinned by tests/test_bench_headline.py):
    - the primary (96^2 x batch 32 x 500) is the default headline;
    - its ratio uses the baseline's matched-iteration field, never a
      cross-workload comparison (mismatch is recorded, ratio = None);
    - the batch-128 throughput configuration takes the headline ONLY
      when it is faster AND the torch baseline was measured on the same
      batch-128 workload (`gridpoints_per_s_b128_500`).
    Mutates `details` only to record a workload mismatch.
    """
    headline, vs = primary, None
    if base is None:
        return headline, vs
    if primary["iterations"] == 500 and "gridpoints_per_s_500" in base:
        base_gps = base["gridpoints_per_s_500"]
    elif primary["iterations"] == base["config"]["iterations"]:
        base_gps = base["gridpoints_per_s"]
    else:  # never compare across different workloads silently
        base_gps = None
        details["baseline_workload_mismatch"] = (
            f"primary iters {primary['iterations']} vs baseline "
            f"{base['config']['iterations']}; re-run "
            "tools/bench_torch_baseline.py")
    vs = primary["gridpoints_per_s"] / base_gps if base_gps else None
    # the throughput configuration becomes the headline ONLY with a
    # matched-workload baseline (torch batch 128 x 500 on the same
    # host) — never a cross-workload ratio
    b128 = details.get("primary_b128_500")
    if (b128 and "gridpoints_per_s_b128_500" in base
            and b128["gridpoints_per_s"] > headline["gridpoints_per_s"]):
        headline = b128
        vs = (b128["gridpoints_per_s"]
              / base["gridpoints_per_s_b128_500"])
    return headline, vs


def main():
    import jax

    # The ambient axon setup pre-imports jax pinned to the TPU tunnel;
    # BENCH_PLATFORM=cpu forces a local-CPU run (used to exercise this
    # harness while the chip is busy — shell env alone is ineffective).
    tpu_unreachable = False
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    elif not _tpu_reachable():
        # worker outage: fall back to CPU so the ONE JSON line still
        # prints; the result is flagged and not TPU-comparable
        jax.config.update("jax_platforms", "cpu")
        tpu_unreachable = True
    import jax.numpy as jnp

    from helmnet_tpu.core.config import Config
    from helmnet_tpu.models import hybridnet
    from helmnet_tpu.ops.source import point_source_map
    from helmnet_tpu.ops.spectral import make_operator
    from helmnet_tpu.solvers.iterative import rollout

    dev = jax.devices()[0]
    platform = dev.platform

    cfg = Config()
    ckpt = "/root/reference/trained_models/jcp_paper_trained_weights.ckpt"
    if os.path.exists(ckpt):
        from helmnet_tpu.train.checkpoint import load_reference_checkpoint

        params, cfg = load_reference_checkpoint(ckpt)
    else:
        params = hybridnet.init_params(jax.random.PRNGKey(0), cfg.model)

    from helmnet_tpu.models.packed import rollout_packed

    def bench_case(n, batch, iters, repeats=3, group=1, up_mode="dilated",
                   dconv="xla"):
        """group > 1: channel-packed network (block-diagonal MXU packing,
        models/packed.py) — identical math, full-width matmuls.
        up_mode='subpixel': 4-phase transposed-conv decomposition.
        dconv='pallas': fused VMEM-resident DoubleConv kernel."""
        import dataclasses

        case_cfg = cfg
        if up_mode != cfg.model.up_mode or dconv != cfg.model.double_conv_mode:
            case_cfg = cfg.replace(
                model=dataclasses.replace(cfg.model, up_mode=up_mode,
                                          double_conv_mode=dconv)
            )
        op = make_operator(n, n, cfg.geometry.pml_size, cfg.geometry.sigma_max, cfg.k0)
        s = cfg.source
        loc = (min(s.location[0], n - 10), min(s.location[1], n - 10))
        source = jnp.asarray(
            np.broadcast_to(
                point_source_map(n, n, loc, s.amplitude, s.phase, s.omega)[None],
                (batch, n, n, 2),
            )
        )
        sos = np.ones((batch, n, n), np.float32)
        sos[:, : n // 2, : n // 2] = 1.5
        sos = jnp.asarray(sos)

        def run():
            if group > 1:
                out = rollout_packed(
                    params, op, source, sos, cfg=case_cfg, g=group,
                    num_iterations=iters, collect=("rmse",),
                )
            else:
                out = rollout(
                    params, op, source, sos, cfg=case_cfg, num_iterations=iters,
                    collect=("rmse",),
                )
            # host fetch forces completion even on async remote runtimes
            r = np.asarray(out["rmse"])
            assert np.all(np.isfinite(r)), "non-finite rollout rmse"
            return out

        t0 = time.time()
        run()
        compile_s = time.time() - t0
        times = []
        for _ in range(repeats):
            t0 = time.time()
            run()
            times.append(time.time() - t0)
        dt = min(times)
        return {
            "grid": n,
            "batch": batch,
            "iterations": iters,
            "group": group,
            "up_mode": up_mode,
            "dconv": dconv,
            "seconds": dt,
            "compile_seconds": compile_s,
            "iterations_per_s": iters / dt,
            "gridpoints_per_s": batch * n * n * iters / dt,
        }

    # primary: 96^2 x batch 32 x 500 learned iterations — the solve
    # length the reference uses on its test set
    # (/root/reference/evaluate_on_testset.py), measured for the torch
    # implementation in bench_baseline.json's *_500 fields. 500
    # iterations also amortizes this runtime's ~30 ms per-dispatch
    # tunnel round trip, so the number reflects device throughput
    # (R2_STEP_PROFILE.json decomposition). Fastest of the subpixel and
    # dilated up-conv paths — identical math (tests/test_subpixel.py).
    primary = bench_case(96, 32, 500, up_mode="subpixel")
    details = {"platform": platform, "device": str(dev),
               "primary_subpixel_500": primary}
    if tpu_unreachable:
        details["tpu_unreachable_cpu_fallback"] = True
    if time_left() > 150:
        try:
            dil = bench_case(96, 32, 500)
            details["primary_dilated_500"] = dil
            if dil["gridpoints_per_s"] > primary["gridpoints_per_s"]:
                primary = dil
        except Exception as e:
            details["dilated_500_error"] = repr(e)
    details["primary"] = primary
    # throughput configuration: batch 128 at the same 500-iteration
    # solve length. R5_ROOFLINE.json measured batch scaling nearly free
    # (0.99 -> 1.105 ms/iter for 4x the samples: batch 32 is
    # occupancy-bound at the 8-channel conv shapes, not a wall) — 1.07G
    # gridpoints/s. Becomes the HEADLINE when bench_baseline.json
    # carries the matched torch batch-128 measurement; the batch-32
    # primary is always recorded for cross-round comparability.
    if time_left() > 150:
        try:
            details["primary_b128_500"] = bench_case(96, 128, 500,
                                                     up_mode="subpixel")
        except Exception as e:
            details["primary_b128_500_error"] = repr(e)
    # 50-iteration workload of BENCH_r01.json, for cross-round
    # comparability (includes one tunnel round trip in the numerator)
    if time_left() > 150:
        try:
            details["legacy_50iter"] = bench_case(96, 32, 50,
                                                  up_mode="subpixel")
        except Exception as e:
            details["legacy_50iter_error"] = repr(e)
    extras = (
        ("large_batch_96", (96, 256, 50), 1),
        ("grid_256", (256, 16, 50), 1),
        ("grid_256_packed", (256, 16, 50), 16),
        ("grid_512", (512, 4, 50), 1),
        ("grid_512_packed", (512, 4, 50), 4),
    )
    for name, (n, b, it), g in extras:
        if time_left() < 150:
            details.setdefault("skipped_for_budget", []).append(name)
            continue
        try:
            details[name] = bench_case(n, b, it, group=g)
        except Exception as e:  # keep the primary result even if extras fail
            details[f"{name}_error"] = repr(e)

    # sparse stencil-residual kernel (the BASELINE.json SpMV metric)
    try:
        if time_left() < 150:
            raise TimeoutError("skipped for bench budget")
        import jax.numpy as jnp

        from helmnet_tpu.ops.pallas_stencil import residual_planes_tiled
        from helmnet_tpu.ops.stencil import make_stencil_operator

        n, b, L = 512, 8, 100
        st = make_stencil_operator(n, n, cfg.geometry.pml_size,
                                   cfg.geometry.sigma_max, cfg.k0, order=4)
        rng = np.random.default_rng(0)
        ur = jnp.asarray(rng.standard_normal((b, n, n)).astype(np.float32))
        ui = jnp.asarray(rng.standard_normal((b, n, n)).astype(np.float32))
        ksq = jnp.asarray(np.ones((b, n, n), np.float32))

        @jax.jit
        def many(a0):
            def body(c, _):
                rr, _ri = residual_planes_tiled(st, c, ui, ksq, c, ui,
                                                tile_h=128)
                return c * 0.999 + rr * 1e-3, None
            c, _ = jax.lax.scan(body, a0, None, length=L)
            return c

        np.asarray(many(ur))
        ts = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(many(ur))
            ts.append(time.time() - t0)
        dt = min(ts) / L
        nnz = b * n * n * (4 * st.radius + 1)
        details["stencil_spmv_512"] = {
            "grid": n, "batch": b, "seconds_per_apply": dt,
            "gridpoints_per_s": b * n * n / dt,
            "nnz_per_s": nnz / dt,
        }
    except TimeoutError:
        # an out-of-budget skip is not an error — record it as skipped
        # (the r4 details file conflated the two)
        details.setdefault("skipped_for_budget", []).append(
            "stencil_spmv_512")
    except Exception as e:
        details["stencil_error"] = repr(e)

    # measured roofline context (VERDICT r4 #6): produced on chip by
    # tools/r5_roofline.py from the EXACT primary executable's XLA cost
    # analysis; embedded so BENCH_DETAILS carries the bound/headroom
    # verdict alongside the number it explains
    roofline_path = os.path.join(os.path.dirname(__file__),
                                 "R5_ROOFLINE.json")
    if os.path.exists(roofline_path):
        try:
            with open(roofline_path) as f:
                rf = json.load(f)
            details["roofline"] = {
                "batch32": rf.get("cases", {}).get("32"),
                "verdict": rf.get("verdict"),
                "throughput_best": rf.get("throughput_best"),
                "source": "R5_ROOFLINE.json (tools/r5_roofline.py)",
            }
        except Exception as e:
            details["roofline_error"] = repr(e)

    baseline_path = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    base = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        details["baseline"] = base
    headline, vs = select_headline(details, primary, base)
    details["headline"] = headline

    with open(os.path.join(os.path.dirname(__file__), "BENCH_DETAILS.json"), "w") as f:
        json.dump(details, f, indent=2)

    print(
        json.dumps(
            {
                "metric": "solver_gridpoints_per_s_per_chip",
                "value": headline["gridpoints_per_s"],
                "unit": (f"gridpoints/s (96^2 x batch{headline['batch']} "
                         f"x {headline['iterations']} learned iterations"
                         "; torch baseline measured on the same "
                         "workload)"),
                "vs_baseline": vs,
            }
        )
    )


if __name__ == "__main__":
    main()
