"""Time-domain CW solver vs direct Helmholtz solve — the independent
ground-truth cross-check (the role k-Wave plays for the reference).

Fields are compared source-normalized over the sponge/PML-cropped interior
(support_functions.py conventions) so phase/scale conventions cancel.
"""

import numpy as np
import pytest

from helmnet_tpu.eval.harness import normalize_wavefield
from helmnet_tpu.ops.source import point_source_amplitude, point_source_map
from helmnet_tpu.ops.spectral import assemble_dense
from helmnet_tpu.solvers.timedomain import solve_cw


@pytest.mark.slow
class TestTimeDomain:
    def _compare(self, sos, loc, crop=18, roundtrips=30):
        h, w = sos.shape
        amp = point_source_amplitude(h, w, loc, 1.0)
        td = solve_cw(
            sos, amp, omega=1.0, cfl=0.1, roundtrips=roundtrips,
            record_periods=3, sponge_width=16, sponge_strength=1.0,
        )
        phasor = np.asarray(td.phasor)

        # direct dense Helmholtz solve with PML on the same grid
        k_sq = (1.0 / sos) ** 2
        M = assemble_dense(h, w, 8, 2.0, 1.0, k_sq=k_sq)
        s = point_source_map(h, w, loc, 1.0)
        b = (s[..., 0] + 1j * s[..., 1]).ravel()
        u = np.linalg.solve(M, b).reshape(h, w)

        p_td = normalize_wavefield(phasor, loc)
        p_hh = normalize_wavefield(u, loc)
        inner = np.s_[crop:-crop, crop:-crop]
        # phase conventions may mirror (e^{-iwt} vs e^{+iwt}): allow conj
        err = np.abs(p_td - p_hh)[inner].max()
        err_conj = np.abs(np.conj(p_td) - p_hh)[inner].max()
        scale = np.abs(p_hh[inner]).max()
        return min(err, err_conj) / scale

    def test_homogeneous_agrees_with_helmholtz(self):
        sos = np.ones((64, 64), np.float32)
        rel = self._compare(sos, (40, 32))
        assert rel < 0.03, rel

    def test_heterogeneous_agrees_with_helmholtz(self):
        sos = np.ones((64, 64), np.float32)
        sos[24:34, 18:46] = 1.5
        rel = self._compare(sos, (44, 32))
        assert rel < 0.06, rel
