import numpy as np
import pytest

from mistra_tpu.config import MistraConfig
from mistra_tpu.grids import make_grids


@pytest.fixture(scope="module")
def grids():
    cfg = MistraConfig(chem=False)
    return make_grids(cfg)


def test_atm_grid_structure(grids):
    atm = grids.atm
    n, nf = 150, 100
    assert atm.eta.shape == (n,)
    # equidistant part: boundaries at multiples of 10 m
    assert np.allclose(atm.etw[:nf], np.arange(nf) * 10.0)
    # continuity at the match point: first stretched boundary = nf * detamin
    assert np.isclose(atm.etw[nf], nf * 10.0)
    # monotone increasing boundaries and mids
    assert np.all(np.diff(atm.etw) > 0)
    assert np.all(np.diff(atm.eta) > 0)
    # top near (below) the configured 2000 m ceiling
    assert 1500.0 < atm.etw[-1] <= 2500.0
    # layer mids halfway between boundaries
    assert np.allclose(atm.eta[1:], 0.5 * (atm.etw[1:] + atm.etw[:-1]))
    # surface "layer" bookkeeping of the reference
    assert atm.eta[0] == 0.0 and atm.detw[0] == 10.0


def test_soil_grid(grids):
    soil = grids.soil
    assert soil.zb[0] == 0.0
    assert np.all(np.diff(soil.zb) > 0)
    assert np.all(soil.dzbw > 0)
    assert soil.dzbw[0] >= 0.001
    # total depth about 1 m
    assert 0.5 < soil.zb[-1] < 1.5


def test_micro_mass_grids(grids):
    mg = grids.micro
    nka = nkt = 70
    # log-equidistant: constant ratio
    r_n = mg.enw[1:] / mg.enw[:-1]
    assert np.allclose(r_n, r_n[0])
    r_t = mg.ew[1:] / mg.ew[:-1]
    assert np.allclose(r_t, r_t[0])
    # dry radii span the configured range (0.005 .. 15 um by default)
    assert 0.005 < mg.rn[0] < 0.01
    assert 10.0 < mg.rn[-1] <= 15.5
    # total radius exceeds both the dry radius and the pure-water radius
    assert np.all(mg.rq >= mg.rn[None, :] * 0.999)
    assert np.all(np.diff(mg.rq, axis=0) > 0)
    assert np.all(np.diff(mg.rq, axis=1) > 0)
    # rw (boundary-mass radius) >= rq (center-mass radius) per bin
    assert np.all(mg.rw >= mg.rq)


def test_chemistry_bin_split(grids):
    mg = grids.micro
    # ka: all bins below the split have rn <= 0.5, the next one is above
    assert np.all(mg.rn[:mg.ka] <= 0.5)
    assert mg.rn[mg.ka] > 0.5
    # kw: monotone increasing with dry size
    assert np.all(np.diff(mg.kw) >= 0)
    assert mg.kw[0] >= 0 and mg.kw[-1] <= 70


def test_rpw_monotone(grids):
    assert np.all(np.diff(grids.micro.rpw) > 0)
