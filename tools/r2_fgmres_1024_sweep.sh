#!/bin/bash
# Sequential 1024^2 far-OOD preconditioning experiments (one at a time —
# single TPU chip). Each writes its own key into R2_TPU_EXTRAS.json.
set -x
cd "$(dirname "$0")/.."

# two-level with CSLP smoother: global coarse correction, medium-blind smoother
FG_MODE=twolevel FG_SMOOTHER=cslp FG_RESTART=10 FG_MAX_RESTARTS=20 \
  FG_KEY=fgmres_1024_twolevel_cslp \
  timeout 4200 python tools/r2_fgmres_1024.py

# two-level with the LEARNED smoother: medium-aware local smoothing +
# global coarse correction
FG_MODE=twolevel FG_SMOOTHER=learned FG_INNER=20 FG_RESTART=10 \
  FG_MAX_RESTARTS=20 FG_KEY=fgmres_1024_twolevel_learned \
  timeout 4200 python tools/r2_fgmres_1024.py

# deep learned preconditioner, host-driven Arnoldi (bounded dispatches)
FG_MODE=learned FG_INNER=100 FG_RESTART=16 FG_MAX_RESTARTS=12 \
  FG_HOST_ARNOLDI=1 FG_KEY=fgmres_1024_deep \
  timeout 5400 python tools/r2_fgmres_1024.py
