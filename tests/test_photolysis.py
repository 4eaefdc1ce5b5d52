"""Photolysis tests: table parsing and J-rate magnitudes."""

import numpy as np
import pytest

from mistra_tpu.photolysis.tables import load_photolysis_tables

PHOT_DIR = "/root/reference/input/photolys/"


@pytest.fixture(scope="module")
def tb():
    return load_photolysis_tables(PHOT_DIR)


class TestTables:
    def test_wavelength_grid(self, tb):
        nm = tb.wave * 1.0e7
        assert abs(nm[0] - 179.4) < 0.5
        assert abs(nm[-1] - 850.0) < 0.5
        assert np.all(np.diff(nm) > 0)

    def test_flux_and_cross_sections(self, tb):
        assert tb.flux.shape == (176,)
        assert tb.flux.max() > 1e14  # visible flux ~2.7e15
        # O3 Hartley band peak ~1.1e-17 cm2 near 255 nm
        o3 = tb.cs_t["O3"][0]
        assert 5e-18 < o3.max() < 2e-17
        # NO2 cross section peaks ~6e-19 near 400 nm
        assert 3e-19 < tb.cs_t["NO2"][0].max() < 1e-18
        assert list(tb.cs_t["O3"][1]) == [226.0, 263.0, 298.0]

    def test_quantum_yields(self, tb):
        assert set(tb.qy) == {"CHOH", "COH2", "NO2O", "NOO2", "NO2"}
        assert tb.qy["NO2"].max() == 1.0
        assert 0.7 < tb.qy["CHOH"].max() < 0.8

    def test_chebyshev_coefficients(self, tb):
        assert tb.cheb_a.shape == (20, 13)
        # B coefficients are ln(cross sections): large negative values
        assert tb.cheb_b.min() < -40


class TestJRates:
    @pytest.fixture(scope="class")
    def noon_j(self):
        from mistra_tpu.config import MistraConfig
        from mistra_tpu.model import Model
        from mistra_tpu.photolysis.jrates import PhotolysisDriver
        cfg = MistraConfig(chem=False, mic=False, tw=288.15, zinv=800.0,
                           dtinv=7.0, alat=55.0, nday=21, nmonth=7,
                           nyear=1982, nhour=12)
        m = Model(cfg)
        s = m.init_state()
        pd = PhotolysisDriver(m, m._radiation)
        return np.asarray(pd(s))

    def test_canonical_midday_magnitudes(self, noon_j):
        pj = noon_j
        assert pj.shape[0] == 47
        assert np.all(np.isfinite(pj)) and np.all(pj >= 0)
        # canonical clear-sky midlatitude summer surface values
        assert 3e-3 < pj[0, 1] < 2e-2       # J_NO2 ~ 8e-3
        assert 5e-6 < pj[2, 1] < 1e-4       # J_O1D ~ 2.5e-5
        assert 1e-4 < pj[46, 1] < 1e-3      # J_O3P ~ 4e-4
        assert 5e-4 < pj[3, 1] < 5e-3       # J_HONO ~ 1.8e-3
        assert 1e-6 < pj[5, 1] < 3e-5       # J_H2O2 ~ 7e-6
        assert 0.05 < pj[26, 1] < 0.4       # J_I2 ~ 0.15
        assert 0.01 < pj[21, 1] < 0.1       # J_Br2 ~ 0.03

    def test_o1d_fraction_small(self, noon_j):
        # O(1D) channel is a small fraction of total O3 photolysis at sfc
        assert noon_j[2, 1] < 0.2 * noon_j[46, 1]

    def test_profile_increases_upward(self, noon_j):
        # UV rates increase with altitude (less overhead absorption)
        assert noon_j[2, -1] >= noon_j[2, 1]
