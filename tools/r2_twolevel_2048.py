"""Two-level FGMRES at 2048^2 high wavenumber (~326 wavelengths).

The recorded CSLP result (R2_TPU_EXTRAS.json gmres_2048_highk) needs
O(k) Krylov iterations: 2.7e-6 relative in 4000 iterations / 280 s.
The two-level preconditioner (solvers/twolevel.py) adds a factor-2
spectral coarse-grid correction (1024^2, solved approximately by
on-device CSLP-GMRES), which removes the near-kernel smooth modes that
force the O(k) count. host-Arnoldi keeps every dispatch bounded (the
tunneled worker crashes past ~30 s per dispatch).

Env knobs: TL_RESTART, TL_MAX_RESTARTS, TL_COARSE_RESTART,
TL_COARSE_MAX_RESTARTS, TL_KEY. Writes into R2_TPU_EXTRAS.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..")


def main():
    import jax.numpy as jnp

    from helmnet_tpu.core.config import Config
    from helmnet_tpu.ops.source import point_source_map
    from helmnet_tpu.ops.spectral import make_operator
    from helmnet_tpu.solvers.twolevel import solve_fgmres_two_level

    cfg = Config()
    n, omega = 2048, 1.0  # same problem as gmres_2048_highk
    op = make_operator(n, n, cfg.geometry.pml_size, cfg.geometry.sigma_max,
                       omega)
    sos = np.ones((n, n), np.float32)
    src = point_source_map(n, n, (n - 40, n // 2), 10.0, 0.0, omega)

    restart = int(os.environ.get("TL_RESTART", "10"))
    max_restarts = int(os.environ.get("TL_MAX_RESTARTS", "25"))
    coarse_restart = int(os.environ.get("TL_COARSE_RESTART", "32"))
    coarse_max = int(os.environ.get("TL_COARSE_MAX_RESTARTS", "2"))
    key = os.environ.get("TL_KEY", "twolevel_2048_highk")

    t0 = time.time()
    res = solve_fgmres_two_level(
        op, jnp.asarray(src), jnp.asarray(sos), cfg=cfg, smoother="cslp",
        restart=restart, max_restarts=max_restarts,
        coarse_restart=coarse_restart, coarse_max_restarts=coarse_max,
        tol=2.8e-6,  # the CSLP-at-4000-iterations mark
        host_arnoldi=True, verbose=True,
    )
    out = {
        "rel_residual": float(np.asarray(res.residual_norms)[-1]),
        "trajectory": [float(x) for x in np.asarray(res.residual_norms)],
        "outer_iterations": int(res.iterations),
        "seconds": round(time.time() - t0, 1),
        "restart": restart,
        "coarse": f"GMRES({coarse_restart})x{coarse_max} at 1024^2",
        "cslp_comparison": "2.7e-6 in 4000 iterations / 280 s",
    }
    print(json.dumps(out, indent=2), flush=True)
    path = os.path.join(ROOT, "R2_TPU_EXTRAS.json")
    d = json.load(open(path)) if os.path.exists(path) else {}
    d[key] = out
    json.dump(d, open(path, "w"), indent=2)
    print("merged into R2_TPU_EXTRAS.json", flush=True)


if __name__ == "__main__":
    main()
