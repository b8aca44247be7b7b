"""Checkpoint/operator parity against golden fixtures generated from the
reference implementation (tools/make_golden_fixtures.py).

These lock in: (A) exact PML-Laplacian semantics, (B) exact network
semantics with the shipped pretrained JCP weights (conv/transpose/PReLU
conversions), (C) full 100-iteration rollout trajectory parity.
"""

import os

import numpy as np
import pytest

from helmnet_tpu.core.config import Config
from helmnet_tpu.ops.spectral import laplacian, make_operator
from helmnet_tpu.solvers.iterative import IterativeSolver
from helmnet_tpu.train.checkpoint import load_reference_checkpoint

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
REFERENCE_CKPT = "/root/reference/trained_models/jcp_paper_trained_weights.ckpt"


def nchw_to_nhwc(a):
    return np.transpose(a, (0, 2, 3, 1))


@pytest.fixture(scope="module")
def ckpt():
    if not os.path.exists(REFERENCE_CKPT):
        pytest.skip("reference checkpoint not available")
    params, cfg = load_reference_checkpoint(REFERENCE_CKPT)
    # bit-parity tests run at full f32 precision
    cfg = cfg.replace(model=cfg.model.__class__(
        **{**cfg.model.__dict__, "precision": "highest"}))
    return params, cfg


class TestLaplacianParity:
    def test_fast_laplacian_fixture(self):
        fx = np.load(os.path.join(FIXTURES, "laplacian_96.npz"))
        op = make_operator(96, 96, 8, 2.0, 1.0)
        for mode in ("matmul", "fft"):
            got = np.asarray(laplacian(op, fx["u"], mode))
            np.testing.assert_allclose(got, fx["lap"], atol=5e-4)

    def test_sigmas_fixture(self):
        fx = np.load(os.path.join(FIXTURES, "laplacian_96.npz"))
        op = make_operator(96, 96, 8, 2.0, 1.0)
        np.testing.assert_allclose(np.asarray(op.sigmas), fx["sigmas"], atol=1e-6)


class TestNetworkParity:
    def test_param_count(self, ckpt):
        from helmnet_tpu.models.hybridnet import count_params

        params, _ = ckpt
        # ckpt totals 140,320 incl. non-learnable buffers (source, Lap.*,
        # 5 x 96^2 x 2 = 92,160); the learnable network is 48,160.
        assert count_params(params) == 48_160

    def test_forward_fixture(self, ckpt):
        from helmnet_tpu.models import hybridnet

        params, cfg = ckpt
        fx = np.load(os.path.join(FIXTURES, "hybridnet_forward_96.npz"))
        x = nchw_to_nhwc(fx["x"])
        states = hybridnet.init_states(x.shape[0], 96, cfg.model)
        out, new_states = hybridnet.apply(params, x, states, cfg=cfg.model)
        np.testing.assert_allclose(
            np.asarray(out), nchw_to_nhwc(fx["out"]), atol=2e-5
        )
        flat = np.asarray(hybridnet.flatten_states(new_states))
        np.testing.assert_allclose(flat, fx["states_flat"], atol=2e-5)


class TestRolloutParity:
    def test_rollout_trace(self, ckpt):
        params, cfg = ckpt
        fx = np.load(os.path.join(FIXTURES, "rollout_96_slab.npz"))
        solver = IterativeSolver(cfg, params=params)
        out = solver.forward(
            fx["sos"][None], num_iterations=100, collect=("rmse", "wavefields"),
            decimate=10,
        )
        rmse = np.asarray(out["rmse"])[:, 0]
        ref_rmse = fx["rmse"]
        # trajectory parity: tight at early iterations, relative later
        np.testing.assert_allclose(rmse[:20], ref_rmse[:20], rtol=2e-2)
        # mid-trajectory bound: measured max relative deviation over iters
        # 20-99 is 7.6e-4 (f32 HIGHEST vs the torch fixture) — pin with
        # ~6x headroom for platform drift
        np.testing.assert_allclose(rmse[20:100], ref_rmse[20:100], rtol=5e-3)
        # converges to the same level (within 20% in log-space terms)
        assert rmse[-1] < 1.5 * max(ref_rmse[-1], 1e-6)
        # final wavefield parity (fields are O(1); atol vs max |u|)
        wf100 = np.asarray(out["wavefields"][-1])  # decimated: chunk 10 = iter 100
        ref_wf = nchw_to_nhwc(fx["wavefield_100"])
        scale = np.abs(ref_wf).max()
        np.testing.assert_allclose(wf100, ref_wf, atol=2e-2 * scale)

    def test_source_matches_reference_buffer(self, ckpt):
        params, cfg = ckpt
        fx = np.load(os.path.join(FIXTURES, "rollout_96_slab.npz"))
        solver = IterativeSolver(cfg, params=params)
        np.testing.assert_allclose(
            np.asarray(solver.source), nchw_to_nhwc(fx["source"]), atol=1e-6
        )


class TestVariableSourceParity:
    def test_variable_source_trace(self, ckpt):
        """Mid-solve source switching matches the reference
        forward_variable_src semantics (hybridnet.py:699-754)."""
        import jax.numpy as jnp

        from helmnet_tpu.solvers.iterative import rollout_variable_source

        params, cfg = ckpt
        fx = np.load(os.path.join(FIXTURES, "rollout_variable_source_96.npz"))
        solver = IterativeSolver(cfg, params=params)
        sources = jnp.asarray(
            np.stack([
                nchw_to_nhwc(fx["source_a"]),
                nchw_to_nhwc(fx["source_b"]),
            ])
        )  # [2, 1, H, W, 2]
        out = rollout_variable_source(
            params, solver.op, sources,
            jnp.array([0, int(fx["switch_iteration"])]),
            jnp.asarray(fx["sos"])[None], cfg=cfg, num_iterations=20,
        )
        rmse = np.asarray(out["rmse"])[:, 0]
        np.testing.assert_allclose(rmse, fx["rmse"], rtol=2e-2)
        # residual jump at the switch is reproduced
        assert abs(rmse[8] - rmse[7]) > 1e-5 or abs(fx["rmse"][8] - fx["rmse"][7]) < 1e-5
        wf = np.asarray(out["wavefield"])[0]
        ref_wf = nchw_to_nhwc(fx["wavefield_20"])[0]
        scale = np.abs(ref_wf).max()
        np.testing.assert_allclose(wf, ref_wf, atol=2e-2 * scale)


class TestGradientParity:
    def test_bptt_gradients_match_reference(self, ckpt):
        """Training-path parity: gradients of the 2-step unrolled physics
        loss match the reference's torch BPTT (hybridnet.py:385-414)."""
        import jax
        import jax.numpy as jnp

        from helmnet_tpu.models import hybridnet
        from helmnet_tpu.models.blocks import (
            torch_conv_to_hwio,
            torch_convtranspose_to_hwio,
        )
        from helmnet_tpu.ops.spectral import helmholtz_residual
        from helmnet_tpu.solvers.iterative import SolverCarry, n_steps

        params, cfg = ckpt
        fx = np.load(os.path.join(FIXTURES, "bptt_grads_96.npz"))
        solver = IterativeSolver(cfg, params=params)
        sos = jnp.asarray(fx["sos"])[None]
        k_sq = (cfg.source.omega / sos) ** 2
        source = solver.source

        def loss_fn(p):
            wavefield = jnp.zeros((1, 96, 96, 2))
            states = hybridnet.init_states(1, 96, cfg.model)
            residual = helmholtz_residual(solver.op, wavefield, k_sq, source)
            _, ys = n_steps(
                p, solver.op, source, k_sq,
                SolverCarry(wavefield, residual, states),
                cfg=cfg, num_steps=2,
            )
            return 1e4 * jnp.mean(ys["residuals"] ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert float(loss) == pytest.approx(float(fx["loss"]), rel=1e-3)

        checks = [
            (grads["inc"]["c1"]["w"], torch_conv_to_hwio(fx["g_inc_c1_w"])),
            (grads["outc"]["w"], torch_conv_to_hwio(fx["g_outc_w"])),
            (grads["enc"][0]["conv_state"]["c1"]["w"],
             torch_conv_to_hwio(fx["g_enc0_state_c1_w"])),
            (grads["up"][2]["w"],
             torch_convtranspose_to_hwio(fx["g_up2_w"])),
            (grads["inc"]["act"]["a"], fx["g_prelu_inc"]),
        ]
        for got, ref in checks:
            scale = np.abs(ref).max() + 1e-12
            np.testing.assert_allclose(
                np.asarray(got), ref, atol=2e-3 * scale, rtol=2e-3
            )
