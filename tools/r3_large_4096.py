"""Large-grid capability extension: 4096^2 CSLP-GMRES solve + 8192^2 probe.

Round-2/3 established the solver story through 2048^2 (~326 wavelengths:
CSLP 1e-4 in ~77 s where bare Krylov and CPU f64 GMRES stall). This tool
pushes the capability table up two more octaves on one chip:

  * 4096^2 (~652 wavelengths): host-chunked CSLP-GMRES restart cycles
    (the tunneled worker crashes on dispatches past ~30 s, so each cycle
    is one bounded device call; restart-cycle semantics are exact GMRES
    restarts). Bare-Krylov contrast cycles included.
  * 8192^2 (~1300 wavelengths, 0.5 GB per complex field): fft-mode
    residual apply throughput + a few CSLP cycles to demonstrate the
    solve RUNS and descends on one 16 GB chip (converging at this k
    needs O(k) iterations — hours, out of scope; capability is the claim).

The reference's MATLAB solver tops out at 96^2-512^2 grids
(/root/reference/matlab/spectral_gmres_solver.m). Writes
`gmres_4096_highk` / `helm_8192_capability` into R2_TPU_EXTRAS.json.

Env knobs: G4096_BUDGET_S, G4096_RESTART, G4096_CYCLES, G8192_CYCLES,
SKIP_8192.
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


def chunked_gmres(op, k_sq, src, *, mode, precond, restart, n_cycles,
                  budget_s, shift=(1.0, 0.3), tol=1e-6):
    """Host-driven restart cycles: one bounded device call per cycle."""
    import jax
    import jax.numpy as jnp

    from helmnet_tpu.ops.spectral import helmholtz_residual
    from helmnet_tpu.solvers.gmres import solve_helmholtz

    # op/k_sq/src enter as ARGUMENTS (not closure constants): closed-over
    # arrays are baked into the compile request, which the remote-compile
    # endpoint rejects at very large grids (HTTP 413 at 8192^2).
    @jax.jit
    def _neg_residual(op_, k_sq_, src_, u):
        r = helmholtz_residual(op_, u[None], k_sq_[None], src_[None],
                               mode=mode)[0]
        return -r, jnp.sqrt(jnp.mean(r**2))

    def neg_residual(u):
        return _neg_residual(op, k_sq, src, u)

    src_norm = float(np.asarray(jnp.sqrt(jnp.mean(src**2))))
    t0 = time.time()
    u = jnp.zeros(src.shape, jnp.float32)
    hist, cycles_run = [], 0
    for _ in range(n_cycles):
        b_eff, rnorm = neg_residual(u)
        hist.append(float(np.asarray(rnorm)) / src_norm)
        print(f"  [{precond}] cycle {cycles_run}: rel {hist[-1]:.3e} "
              f"({time.time() - t0:.0f}s)", flush=True)
        if hist[-1] < tol or time.time() - t0 > budget_s:
            break
        r = solve_helmholtz(op, k_sq, b_eff, mode=mode, restart=restart,
                            max_restarts=1, tol=1e-12, precond=precond,
                            shift=shift)
        u = u + r.x
        cycles_run += 1
        del r
    else:
        _, rnorm = neg_residual(u)
        hist.append(float(np.asarray(rnorm)) / src_norm)
    return {"rel_residual": hist[-1], "trajectory": hist,
            "iterations": restart * cycles_run,
            "seconds": round(time.time() - t0, 1)}


def solve_4096():
    import jax.numpy as jnp

    from helmnet_tpu.core.config import Config
    from helmnet_tpu.ops.source import point_source_map
    from helmnet_tpu.ops.spectral import make_operator

    cfg = Config()
    n, omega = 4096, 1.0  # ~652 wavelengths across
    op = make_operator(n, n, cfg.geometry.pml_size, cfg.geometry.sigma_max,
                       omega)
    k_sq = jnp.full((n, n), omega**2)
    src = jnp.asarray(point_source_map(n, n, (n - 40, n // 2), 10.0, 0.0,
                                       omega))
    budget = float(os.environ.get("G4096_BUDGET_S", "1100"))
    restart = int(os.environ.get("G4096_RESTART", "25"))
    cycles = int(os.environ.get("G4096_CYCLES", "400"))
    out = {
        "wavelengths_across": round(n / (2 * np.pi / omega), 1),
        "shifted_laplace": chunked_gmres(
            op, k_sq, src, mode="fft", precond="shifted_laplace",
            restart=restart, n_cycles=cycles, budget_s=budget, tol=1e-4,
        ),
        "none": chunked_gmres(
            op, k_sq, src, mode="fft", precond="none",
            restart=restart, n_cycles=8, budget_s=240,
        ),
        "restart": restart,
        "note": "host-chunked cycles; fft operator mode (auto choice "
                ">=1024^2); tol target 1e-4 for CSLP, bare is contrast",
    }
    record("gmres_4096_highk", out)


def probe_8192():
    import jax
    import jax.numpy as jnp

    from helmnet_tpu.core.config import Config
    from helmnet_tpu.ops.source import point_source_map
    from helmnet_tpu.ops.spectral import helmholtz_residual, make_operator

    cfg = Config()
    n, omega = 8192, 1.0  # ~1300 wavelengths, 0.5 GB per complex field
    # dense=False: the four [8192, 8192] matmul tables are ~1 GB — they
    # overflow the remote-compile request (HTTP 413) and the fft path
    # never reads them.
    op = make_operator(n, n, cfg.geometry.pml_size, cfg.geometry.sigma_max,
                       omega, dense=False)
    k_sq = jnp.full((n, n), omega**2)
    src = jnp.asarray(point_source_map(n, n, (n - 40, n // 2), 10.0, 0.0,
                                       omega))

    @jax.jit
    def _resid(op_, k_sq_, src_, u):
        r = helmholtz_residual(op_, u[None], k_sq_[None], src_[None],
                               mode="fft")[0]
        return r, jnp.sqrt(jnp.mean(r**2))

    def resid(u):
        return _resid(op, k_sq, src, u)

    u0 = jnp.zeros((n, n, 2), jnp.float32)
    r, rn = resid(u0)  # compile + correctness
    float(np.asarray(rn))
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        r, rn = resid(u0)
        float(np.asarray(rn))  # small fetch forces completion
    dt = (time.time() - t0) / reps
    gps = n * n / dt / 1e6
    print(f"  8192^2 fft residual: {dt*1e3:.1f} ms/apply = {gps:.0f} Mgp/s",
          flush=True)
    out = {
        "wavelengths_across": round(n / (2 * np.pi / omega), 1),
        "fft_residual_ms": round(dt * 1e3, 2),
        "fft_residual_mgps": round(gps, 1),
        "note": "capability probe: 67M-gridpoint problem resident and "
                "descending on one 16 GB chip; O(k)~1300-wavelength "
                "convergence is a multi-hour run, not attempted",
    }
    record("helm_8192_capability", out)  # throughput survives a solve OOM

    cyc = int(os.environ.get("G8192_CYCLES", "6"))
    # restart=8 OOMs: the [restart+1, 67M] complex Arnoldi basis alone is
    # 4.8 GB and the CSLP FFT temporaries stack on top. restart=4 fits.
    rst = int(os.environ.get("G8192_RESTART", "4"))
    solve = chunked_gmres(
        op, k_sq, src, mode="fft", precond="shifted_laplace", restart=rst,
        n_cycles=cyc, budget_s=float(os.environ.get("G8192_BUDGET_S", "600")),
    )
    out["cslp_cycles"] = solve
    out["cslp_restart"] = rst
    record("helm_8192_capability", out)


def main():
    print("devices:", end=" ")
    import jax

    print(jax.devices(), flush=True)
    solve_4096()
    if not os.environ.get("SKIP_8192"):
        probe_8192()


if __name__ == "__main__":
    main()
