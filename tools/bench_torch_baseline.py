"""Measure the REFERENCE implementation's solver throughput on this host's
CPU (the only hardware here that can run it) and store it as the bench
baseline. Run manually: python tools/bench_torch_baseline.py

Writes bench_baseline.json {gridpoints_per_s, config...} used by bench.py's
vs_baseline field.
"""

import json
import os
import sys
import time
import types

import numpy as np
import torch

REFERENCE = "/root/reference"
sys.path.insert(0, REFERENCE)

# lightning/torchmetrics shims (same as make_golden_fixtures.py)
for name, builder in (
    ("pytorch_lightning", None),
    ("torchmetrics", None),
):
    pass

try:
    import pytorch_lightning  # noqa: F401
except ImportError:
    m = types.ModuleType("pytorch_lightning")
    u = types.ModuleType("pytorch_lightning.utilities")
    p = types.ModuleType("pytorch_lightning.utilities.parsing")

    class AttributeDict(dict):
        def __getattr__(self, k):
            return self[k]

    p.AttributeDict = AttributeDict
    m.utilities = u
    u.parsing = p
    m.LightningModule = torch.nn.Module
    sys.modules["pytorch_lightning"] = m
    sys.modules["pytorch_lightning.utilities"] = u
    sys.modules["pytorch_lightning.utilities.parsing"] = p

try:
    import torchmetrics  # noqa: F401
except ImportError:
    tm = types.ModuleType("torchmetrics")
    tr = types.ModuleType("torchmetrics.regression")

    class MeanAbsoluteError(torch.nn.Module):
        def forward(self, a, b):
            return (a - b).abs().mean()

    tr.MeanAbsoluteError = MeanAbsoluteError
    tm.regression = tr
    sys.modules["torchmetrics"] = tm
    sys.modules["torchmetrics.regression"] = tr

from helmnet.architectures import HybridNet  # noqa: E402
from helmnet.spectral import FastLaplacianWithPML  # noqa: E402
from helmnet.source_module import SourceModule  # noqa: E402

N, PML, SMAX, K0, OMEGA = 96, 8, 2.0, 1.0, 1.0

torch.manual_seed(0)
ckpt = torch.load(
    os.path.join(REFERENCE, "trained_models/jcp_paper_trained_weights.ckpt"),
    map_location="cpu", weights_only=False,
)
net = HybridNet("prelu", 4, N, 8, 6, 2, 4)
net.load_state_dict({k[2:]: v for k, v in ckpt["state_dict"].items() if k.startswith("f.")})
net.eval()
lap = FastLaplacianWithPML(N, PML, K0, SMAX)
sigx, sigy = lap.sigmas()
src1 = SourceModule(N, OMEGA, [82, 48], 10.0, 0.0, False).spatial_map(0).permute(0, 3, 1, 2)


def run(batch, iters):
    sigmas = torch.stack([sigx, sigy]).float().unsqueeze(0).repeat(batch, 1, 1, 1)
    source = src1.repeat(batch, 1, 1, 1)
    sos = torch.ones(batch, 1, N, N)
    sos[:, :, 40:64, 12:84] = 1.5
    k_sq = (OMEGA / sos) ** 2

    def residual(x):
        lap_out = lap(x.permute(0, 2, 3, 1).contiguous()).permute(0, 3, 1, 2)
        return lap_out + k_sq * x - source

    wavefield = torch.zeros(batch, 2, N, N)
    net.clear_states(wavefield)
    res = residual(wavefield)
    for _ in range(iters):
        inp = torch.cat([wavefield, 1e3 * res, sigmas], dim=1)
        d = net(inp)
        wavefield = d / 1e3 + wavefield
        res = residual(wavefield)
    return wavefield


with torch.no_grad():
    run(32, 3)  # warmup
    t0 = time.time()
    run(32, 50)
    dt = time.time() - t0
    # 500 iterations: the solve length the reference actually uses on its
    # test set (evaluate_on_testset.py) — the fair comparison workload for
    # the amortized bench primary. Per-iteration torch-CPU cost is flat,
    # but measure rather than extrapolate.
    t0 = time.time()
    run(32, 500)
    dt500 = time.time() - t0
    # batch 128 at the same 500-iteration solve length: the matched
    # baseline for the TPU throughput configuration (R5_ROOFLINE.json —
    # batch scaling is near-free on the chip; measure whether the torch
    # CPU path also gains so the comparison stays apples-to-apples)
    t0 = time.time()
    run(128, 500)
    dt_b128 = time.time() - t0

gps = 32 * N * N * 50 / dt
out = {
    "impl": "reference ucl-bug/helmnet (torch CPU, this host)",
    "hardware": f"CPU x{os.cpu_count()}",
    "config": {"grid": N, "batch": 32, "iterations": 50},
    "seconds": dt,
    "iterations_per_s": 50 / dt,
    "gridpoints_per_s": gps,
    "config_500": {"grid": N, "batch": 32, "iterations": 500},
    "seconds_500": dt500,
    "gridpoints_per_s_500": 32 * N * N * 500 / dt500,
    "config_b128_500": {"grid": N, "batch": 128, "iterations": 500},
    "seconds_b128_500": dt_b128,
    "gridpoints_per_s_b128_500": 128 * N * N * 500 / dt_b128,
}
with open(os.path.join(os.path.dirname(__file__), "..", "bench_baseline.json"), "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out, indent=2))
