"""solve_auto policy (solvers/auto.py) — the measured solver decision
surface as an executable, test-pinned policy.

Each test pins the choice on a benchmarked regime from
R2_TPU_EXTRAS.json / results/gmres_sweep_96.json; if a re-measurement
moves a threshold, update solvers/auto.py AND the matching pin here.
"""

import numpy as np
import pytest

from helmnet_tpu.core.config import Config, GeometryConfig
from helmnet_tpu.solvers.auto import choose_solver, solve_auto


def _sos(n, contrast=0.0, d3=False):
    shape = (n, n, n) if d3 else (n, n)
    sos = np.ones(shape, np.float32)
    if contrast:
        c = tuple(slice(s // 4, 3 * s // 4) for s in shape)
        rng = np.random.default_rng(0)
        sos[c] = 1.0 + contrast * rng.random(sos[c].shape, np.float32)
    return sos


CFG = Config()
FAKE_PARAMS = {"dummy": np.zeros(1)}  # policy only checks availability


class TestPolicyPins:
    """One pin per benchmarked regime (module-docstring table)."""

    def test_96_with_checkpoint_is_learned(self):
        plan = choose_solver(_sos(96, 1.0), cfg=CFG, params=FAKE_PARAMS)
        assert plan.method == "learned"

    def test_96_without_checkpoint_is_cslp(self):
        plan = choose_solver(_sos(96, 1.0), cfg=CFG)
        assert plan.method == "cslp"

    def test_512_mild_with_checkpoint_is_learned_resized(self):
        """adjudication_512_tpu_r2c (r5): the 96^2-trained model RESIZED
        to 512^2 reaches 8.9e-6 median best rmse on 16/16 maps while
        CSLP stalls on 4/16 — 512^2 in-distribution stays learned (the
        shipped checkpoint is r2c resized; the native r3b512 stalls at
        rel 0.33, adjudication_512.json)."""
        plan = choose_solver(_sos(512, 0.3), cfg=CFG, params=FAKE_PARAMS)
        assert plan.method == "learned"

    def test_512_strong_contrast_is_two_level_even_with_ckpt(self):
        """skull_auto_512 (r5): at 512^2 contrast 2.0 CSLP stalls at
        0.158 and the learned terminal rollout is unadjudicated
        off-distribution — strong heterogeneity at >=512 routes
        two-level regardless of checkpoint."""
        plan = choose_solver(_sos(512, 1.0), cfg=CFG, params=FAKE_PARAMS)
        assert plan.method == "two_level"
        assert plan.kwargs["smoother"] == "learned"

    def test_1024_mild_with_checkpoint_is_classical(self):
        """adjudication_1024.json: learned terminal rel 0.84, CSLP 5.5x
        faster at matched accuracy."""
        plan = choose_solver(_sos(1024, 0.3), cfg=CFG, params=FAKE_PARAMS)
        assert plan.method == "cslp"

    def test_2048_highk_mild_contrast_is_cslp_not_two_level(self):
        """twolevel_2048_highk.cslp_comparison: CSLP 280 s vs two-level
        829 s — the regression solve_auto exists to prevent."""
        plan = choose_solver(_sos(2048), cfg=CFG, params=FAKE_PARAMS)
        assert plan.method == "cslp"

    def test_4096_highk_is_recycled_two_level(self):
        """r5 re-measurement moved the threshold: recycled two-level
        9.9e-5/271 s vs CSLP 9.7e-5/325 s at 4096^2
        (helm_4096_recycled vs gmres_4096_highk)."""
        plan = choose_solver(_sos(4096), cfg=CFG)
        assert plan.method == "two_level_recycled"

    def test_2048_stays_cslp_below_recycle_threshold(self):
        """plateau_2048: the best two-level-family config (246 s to
        1e-5) still loses to CSLP (280 s to 2.7e-6) at 2048^2."""
        plan = choose_solver(_sos(2048), cfg=CFG)
        assert plan.method == "cslp"

    def test_1024_strong_heterogeneity_is_two_level(self):
        """fgmres_1024 far-OOD: CSLP stalls at 0.072; two-level is the
        only converger (8.5e-5)."""
        plan = choose_solver(_sos(1024, 1.0), cfg=CFG, params=FAKE_PARAMS)
        assert plan.method == "two_level"
        assert plan.kwargs["smoother"] == "learned"
        assert plan.kwargs["transfer"] == "spectral"

    def test_1024_strong_heterogeneity_no_params_cslp_smoother(self):
        plan = choose_solver(_sos(1024, 1.0), cfg=CFG)
        assert plan.method == "two_level"
        assert plan.kwargs["smoother"] == "cslp"

    def test_8192_is_recycled_two_level(self):
        """helm_8192_capability: CSLP plateaus at 5.6e-2; recycled
        two-level is the only descending method."""
        plan = choose_solver(_sos(8192), cfg=CFG)
        assert plan.method == "two_level_recycled"
        # the measured-converging 16 GB-chip config (helm_8192_recycled)
        assert plan.kwargs["recycle_k"] == 1
        assert plan.kwargs["restart"] == 3
        assert plan.kwargs["coarse_restart"] == 8

    def test_3d_measured_contrast_is_cslp(self):
        """helm3d_twolevel_256: CSLP keeps the wall-clock edge at
        sos 1->2."""
        plan = choose_solver(_sos(64, 1.0, d3=True), cfg=CFG)
        assert plan.method == "cslp3d"

    def test_3d_extreme_contrast_is_two_level(self):
        sos = _sos(64, d3=True)
        sos[16:48, 16:48, 16:48] = 4.0
        plan = choose_solver(sos, cfg=CFG)
        assert plan.method == "two_level3d"

    def test_rationale_and_evidence_present(self):
        for sos in (_sos(96), _sos(2048), _sos(1024, 1.0)):
            plan = choose_solver(sos, cfg=CFG)
            assert plan.rationale and plan.evidence


class TestSolveAutoExecutes:
    def test_cslp_small_end_to_end(self):
        n = 64
        cfg = Config(geometry=GeometryConfig(domain_size=n, pml_size=8,
                                             sigma_max=2.0))
        sos = _sos(n, 0.3)
        src = np.zeros((n, n, 2), np.float32)
        src[48, 32, 0] = 10.0
        res, plan = solve_auto(src, sos, cfg=cfg, tol=1e-6)
        assert plan.method == "cslp"
        norms = np.asarray(res.residual_norms)
        assert norms[-1] / norms[0] < 1e-3

    def test_override_merges(self):
        n = 64
        cfg = Config(geometry=GeometryConfig(domain_size=n, pml_size=8,
                                             sigma_max=2.0))
        res, plan = solve_auto(
            np.zeros((n, n, 2), np.float32), _sos(n), cfg=cfg,
            max_restarts=1,
        )
        # zero source: converged immediately, but the call path honored
        # the override without kwargs conflicts
        assert plan.method == "cslp"

    def test_small_cslp_forwards_all_overrides(self):
        """ADVICE r4: the small-grid CSLP branch silently dropped
        overrides other than restart/max_restarts/tol (e.g. mode),
        inconsistent with the chunked branch's **kw."""
        n = 64
        cfg = Config(geometry=GeometryConfig(domain_size=n, pml_size=8,
                                             sigma_max=2.0))
        sos = _sos(n, 0.3)
        src = np.zeros((n, n, 2), np.float32)
        src[48, 32, 0] = 10.0
        # mode + shift are NOT in the plan kwargs; both must reach
        # solve_helmholtz without a duplicate-keyword TypeError
        res, plan = solve_auto(src, sos, cfg=cfg, tol=1e-6,
                               mode="matmul", shift=(1.0, 0.6))
        assert plan.method == "cslp"
        norms = np.asarray(res.residual_norms)
        assert norms[-1] / norms[0] < 1e-3

    def test_recycled_plan_returns_channel_pair(self, monkeypatch):
        """ADVICE r4 (medium): the 8192-class plan sets
        keep_x_complex=True internally; solve_auto must STILL return the
        documented [H, W, 2] f32 wavefield — a flat complex return
        poisons the axon process the moment cli/solve np.asarray()s it."""
        import helmnet_tpu.solvers.auto as auto_mod

        n = 64
        monkeypatch.setattr(auto_mod, "RECYCLE_MIN_GRID", n)
        cfg = Config(geometry=GeometryConfig(domain_size=n, pml_size=8,
                                             sigma_max=2.0))
        sos = _sos(n, 0.2)
        src = np.zeros((n, n, 2), np.float32)
        src[48, 32, 0] = 10.0
        res, plan = solve_auto(src, sos, cfg=cfg, tol=1e-4,
                               max_restarts=2, budget_s=60.0)
        assert plan.method == "two_level_recycled"
        assert plan.kwargs["keep_x_complex"] is True  # internal knob set
        wf = res.wavefield
        assert wf.shape == (n, n, 2)
        assert not np.iscomplexobj(np.asarray(wf))

    def test_sos_range_device_array(self):
        """ADVICE r4: _sos_range reduces ON DEVICE for device arrays
        (only two scalars cross the tunnel) and matches numpy."""
        import jax.numpy as jnp

        from helmnet_tpu.solvers.auto import _sos_range

        s = _sos(96, 1.0)
        lo_np, hi_np = _sos_range(s)
        lo_dev, hi_dev = _sos_range(jnp.asarray(s))
        assert lo_dev == pytest.approx(lo_np, rel=1e-6)
        assert hi_dev == pytest.approx(hi_np, rel=1e-6)
