"""Power-law absorption fit (fitPowerLawParamsMulti.m counterpart) and
DICOM CT ingestion (skull_example.m dicomread counterpart)."""

import numpy as np
import pytest

from helmnet_tpu.data import absorption, dicom, skull


class TestPowerLawFit:
    def test_db_neper_roundtrip(self):
        a0 = np.array([0.5, 1.0, 8.0])
        y = np.array([1.1, 1.5, 2.0])
        np.testing.assert_allclose(
            absorption.neper2db(absorption.db2neper(a0, y), y), a0, rtol=1e-12
        )

    def test_fit_matches_desired_at_reference_frequency(self):
        """The fitted prefactor, run through the second-order fractional-
        Laplacian absorption model at f_ref, must reproduce the DESIRED
        power-law absorption exactly (the defining property of the fit)."""
        a0 = np.array([[0.2, 2.0], [8.0, 15.0]])  # dB/(MHz^y cm), skull-ish
        y = np.array([[1.1, 1.3], [1.9, 1.2]])
        c0 = np.array([[1500.0, 1800.0], [2800.0, 3000.0]])
        f_ref, y_ref = 500e3, 2.0
        a0_fit = absorption.fit_power_law_params(a0, y, c0, f_ref, y_ref)
        w = 2 * np.pi * f_ref
        desired = absorption.db2neper(a0, y) * w**y
        actual = absorption.absorbed_power_law(
            absorption.db2neper(a0_fit, y_ref), y_ref, c0, w
        )
        np.testing.assert_allclose(actual, desired, rtol=1e-10)

    def test_small_absorption_limit(self):
        """For weak absorption the second-order correction vanishes: the
        fit reduces to plain exponent conversion a0 * w^(y - y_ref)."""
        a0, y, c0, f_ref, y_ref = 1e-4, 1.5, 1500.0, 100e3, 2.0
        a0_fit = absorption.fit_power_law_params(a0, y, c0, f_ref, y_ref)
        w = 2 * np.pi * f_ref
        expected = absorption.neper2db(
            absorption.db2neper(a0, y) * w**y / w**y_ref, y_ref
        )
        np.testing.assert_allclose(a0_fit, expected, rtol=1e-3)

    def test_y_ref_one_rejected(self):
        with pytest.raises(ValueError):
            absorption.fit_power_law_params(1.0, 1.5, 1500.0, 1e6, 1.0)


class TestDicom:
    def test_write_read_roundtrip(self, tmp_path):
        hu = skull.synthetic_skull_ct(64, seed=1)
        path = str(tmp_path / "slice.dcm")
        dicom.write_dicom_ct(path, hu)
        back = dicom.read_dicom_hu(path)
        assert back.shape == (64, 64)
        np.testing.assert_allclose(back, np.round(hu + 1024) - 1024, atol=0.5)

    def test_series_ordering(self, tmp_path):
        for inst, val in ((3, 30.0), (1, 10.0), (2, 20.0)):
            dicom.write_dicom_ct(
                str(tmp_path / f"s{inst}.dcm"),
                np.full((8, 8), val), instance=inst,
            )
        vol = dicom.load_ct_series(str(tmp_path))
        assert vol.shape == (3, 8, 8)
        np.testing.assert_allclose(vol[:, 0, 0], [10.0, 20.0, 30.0], atol=0.5)

    def test_medium_from_dicom(self, tmp_path):
        hu = skull.synthetic_skull_ct(96, seed=0)
        path = str(tmp_path / "ct.dcm")
        dicom.write_dicom_ct(path, hu)
        med = skull.medium_from_dicom(path)
        assert med.sos.shape == (96, 96)
        assert med.skull_mask.any()
        assert med.sos.min() >= 1.0 - 1e-6 and med.sos.max() <= 2.0 + 1e-6

    def test_not_dicom_rejected(self, tmp_path):
        p = tmp_path / "x.dcm"
        p.write_bytes(b"\x00" * 200)
        with pytest.raises(ValueError):
            dicom.read_dicom_hu(str(p))
