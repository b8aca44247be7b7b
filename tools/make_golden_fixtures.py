"""Generate golden parity fixtures by running the REFERENCE torch code.

Run manually (needs /root/reference mounted):
    python tools/make_golden_fixtures.py

Outputs tests/fixtures/*.npz which are committed; the tests themselves never
import the reference. This script drives the reference's public modules
(architectures/spectral/source_module) with the shipped pretrained checkpoint
to capture: (A) the Fast PML Laplacian on random input, (B) one HybridNet
forward, (C) a 100-iteration solver rollout trace on a fixed sos slab.
"""

import os
import sys
import types

import numpy as np
import torch

REFERENCE = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
sys.path.insert(0, REFERENCE)

# Shim lightning for the checkpoint pickle only
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

from helmnet.architectures import HybridNet  # noqa: E402  (reference module)
from helmnet.spectral import FastLaplacianWithPML  # noqa: E402
from helmnet.source_module import SourceModule  # noqa: E402

CKPT = os.path.join(REFERENCE, "trained_models/jcp_paper_trained_weights.ckpt")

torch.manual_seed(0)
np.random.seed(0)
os.makedirs(OUT, exist_ok=True)

N, PML, SIGMA_MAX, K0, OMEGA = 96, 8, 2.0, 1.0, 1.0
SRC_LOC, SRC_AMP = [82, 48], 10.0

ckpt = torch.load(CKPT, map_location="cpu", weights_only=False)
sd = ckpt["state_dict"]
f_sd = {k[2:]: v for k, v in sd.items() if k.startswith("f.")}

net = HybridNet(
    activation_function="prelu",
    depth=4,
    domain_size=N,
    features=8,
    inchannels=6,
    state_channels=2,
    state_depth=4,
)
net.load_state_dict(f_sd)
net.eval()

lap = FastLaplacianWithPML(domain_size=N, PMLsize=PML, k=K0, sigma_max=SIGMA_MAX)
sigx, sigy = lap.sigmas()
sigmas = torch.stack([sigx, sigy]).float()  # [2, N, N]

src_mod = SourceModule(
    image_size=N, omega=OMEGA, location=SRC_LOC, amplitude=SRC_AMP, phase=0.0,
    smooth=False,
)
source = src_mod.spatial_map(0).permute(0, 3, 1, 2).float()  # [1, 2, N, N]


def apply_lap(x_nchw):
    return lap(x_nchw.permute(0, 2, 3, 1).contiguous()).permute(0, 3, 1, 2)


def get_residual(x, k_sq):
    return apply_lap(x) + k_sq * x - source


# --- Fixture A: Laplacian on random input (NHWC re/im pair layout) ----------
u = torch.randn(2, N, N, 2)
lap_out = lap(u)
np.savez_compressed(
    os.path.join(OUT, "laplacian_96.npz"),
    u=u.numpy(),
    lap=lap_out.detach().numpy(),
    sigmas=sigmas.numpy(),
)

# --- Fixture B: single network forward with checkpoint weights --------------
with torch.no_grad():
    x_in = 0.1 * torch.randn(2, 6, N, N)
    net.clear_states(x_in)
    out = net(x_in)
    states_flat = net.get_states(flatten=True)
np.savez_compressed(
    os.path.join(OUT, "hybridnet_forward_96.npz"),
    x=x_in.numpy(),
    out=out.numpy(),
    states_flat=states_flat.numpy(),
)

# --- Fixture C: 100-iteration rollout on a fixed slab sos map ----------------
sos = np.ones((N, N), np.float32)
sos[40:64, 12:84] = 1.5
sos_t = torch.tensor(sos)[None, None]

with torch.no_grad():
    k_sq = (OMEGA / sos_t) ** 2
    wavefield = torch.zeros(1, 2, N, N)
    net.clear_states(wavefield)
    residual = get_residual(wavefield, k_sq)
    rmse = []
    wf10 = None
    for it in range(100):
        inp = torch.cat(
            [wavefield, 1e3 * residual, sigmas.unsqueeze(0)], dim=1
        )
        d = net(inp)
        wavefield = d / 1e3 + wavefield
        residual = get_residual(wavefield, k_sq)
        rmse.append(float(residual.pow(2).mean((1, 2, 3)).sqrt()[0]))
        if it == 9:
            wf10 = wavefield.clone()
np.savez_compressed(
    os.path.join(OUT, "rollout_96_slab.npz"),
    sos=sos,
    source=source.numpy(),
    rmse=np.array(rmse, np.float64),
    wavefield_10=wf10.numpy(),
    wavefield_100=wavefield.numpy(),
    residual_100=residual.numpy(),
)

print("fixtures written to", os.path.abspath(OUT))
print("rollout rmse[0,9,49,99] =", [np.array(rmse)[i] for i in (0, 9, 49, 99)])

# --- Fixture D: variable-source rollout (forward_variable_src semantics) ----
src_mod2 = SourceModule(image_size=N, omega=OMEGA, location=[20, 60],
                        amplitude=SRC_AMP, phase=0.0, smooth=False)
source2 = src_mod2.spatial_map(0).permute(0, 3, 1, 2).float()

with torch.no_grad():
    k_sq = (OMEGA / sos_t) ** 2
    wavefield = torch.zeros(1, 2, N, N)
    net.clear_states(wavefield)
    cur_src = source
    residual = apply_lap(wavefield) + k_sq * wavefield - cur_src
    rmse_vs = []
    for it in range(20):
        if it == 8:  # switch source mid-solve (hybridnet.py:727-733)
            cur_src = source2
            residual = apply_lap(wavefield) + k_sq * wavefield - cur_src
        inp = torch.cat([wavefield, 1e3 * residual, sigmas.unsqueeze(0)], dim=1)
        d = net(inp)
        wavefield = d / 1e3 + wavefield
        residual = apply_lap(wavefield) + k_sq * wavefield - cur_src
        rmse_vs.append(float(residual.pow(2).mean((1, 2, 3)).sqrt()[0]))
np.savez_compressed(
    os.path.join(OUT, "rollout_variable_source_96.npz"),
    sos=sos,
    source_a=source.numpy(),
    source_b=source2.numpy(),
    switch_iteration=8,
    rmse=np.array(rmse_vs, np.float64),
    wavefield_20=wavefield.numpy(),
)
print("variable-source fixture written; rmse:", rmse_vs[:3], "...", rmse_vs[-1])

# --- Fixture E: BPTT gradient parity (2-step unroll training gradient) ------
# Loss = 1e4 * mean over both unrolled steps of residual^2, grads w.r.t. a
# few representative weights (hybridnet.py:385-414 semantics).
net.zero_grad()
for p in net.parameters():
    p.requires_grad_(True)
k_sq = (OMEGA / sos_t) ** 2
wavefield = torch.zeros(1, 2, N, N)
net.clear_states(wavefield)
residual = get_residual(wavefield, k_sq)
residuals = []
for _ in range(2):
    inp = torch.cat([wavefield, 1e3 * residual, sigmas.unsqueeze(0)], dim=1)
    d = net(inp)
    wavefield = d / 1e3 + wavefield
    residual = get_residual(wavefield, k_sq)
    residuals.append(residual)
loss = 1e4 * torch.cat(residuals).pow(2).mean()
loss.backward()
np.savez_compressed(
    os.path.join(OUT, "bptt_grads_96.npz"),
    sos=sos,
    loss=float(loss),
    g_inc_c1_w=net.inc.double_conv[0].weight.grad.numpy(),
    g_outc_w=net.outc.conv.weight.grad.numpy(),
    g_enc0_state_c1_w=net.enc[0].conv_state.double_conv[0].weight.grad.numpy(),
    g_up2_w=net.up[2].weight.grad.numpy(),
    g_prelu_inc=net.inc.double_conv[1].weight.grad.numpy(),
)
print("bptt fixture: loss", float(loss))
