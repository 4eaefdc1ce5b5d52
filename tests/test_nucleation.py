"""Nucleation tests: real-rate parameterizations, the apparent-
nucleation driver, and the dual-mechanism combination (appnucl2).

Parity map: ternucl (Napari 2002 polynomial, nuc.f90:1078-1247),
oionucl (Lovejoy OIO fit, :1248-1385), appnucl (:427-1014),
appnucl2 (:335-426), nucout diagnostics (:1492-1687).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mistra_tpu.config import GridParams, MistraConfig
from mistra_tpu.model import Model
from mistra_tpu.physics.nucleation import oionucl, ternucl


def test_ternucl_magnitude():
    """Napari-2002 ternary rate: ~units of 1e4-1e6 cm-3 s-1 for polluted
    conditions (RH 0.5, 5e7 cm-3 H2SO4, 10 ppt NH3, 288 K)."""
    rh = jnp.asarray([0.5])
    nh3 = jnp.asarray([10.0])
    h2so4 = jnp.asarray([5.0e7])
    t = jnp.asarray([288.15])
    j, nh, nn, d = ternucl(rh, nh3, h2so4, t)
    assert 1e2 < float(j[0]) < 1e7
    assert 0.3 < float(d[0]) < 5.0          # cluster diameter ~0.5-3 nm
    assert float(nh[0]) > 1.0               # molecules per cluster


def test_oionucl_magnitude():
    j, d = oionucl(jnp.asarray([10.0]), jnp.asarray([288.15]))
    assert float(j[0]) > 0.0
    assert 0.5 < float(d[0]) < 5.0


@pytest.fixture(scope="module")
def nuc_model():
    grid = GridParams(nf=20, n_extra=10, nka=16, nkt=16, nb=8)
    cfg = MistraConfig(chem=True, mic=True, dtype="float64", tw=288.15,
                       zinv=100.0, dtinv=7.0, ug=8.5, vg=0.0,
                       nw_prof_opt=1, wmax=-0.005, z0=0.0001, alat=55.0,
                       nkc_l=0, nuc=True, napari=True, lovejoy=True,
                       ifeed=1, grid=grid)
    model = Model(cfg)
    state = model.init_state()
    return model, state


def test_appnucl2_combines(nuc_model):
    """With both mechanisms on, the driver runs the apparent-nucleation
    machinery per mechanism and combines (appnucl2): the combined
    apparent rate equals the sum of the single-mechanism rates at the
    same state, growth rates average."""
    model, state = nuc_model
    drv = model._nucleation
    # seed vapors so both mechanisms are active
    conc = state.chem.sgas
    n2i = drv.n2i
    for nm, val in (("H2SO4", 5e-9), ("NH3", 1e-9), ("OIO", 5e-10)):
        if nm in n2i:
            conc = conc.at[n2i[nm]].set(
                jnp.full(conc.shape[1], val, conc.dtype))
    state = state.replace(chem=state.chem.replace(sgas=conc))

    _, d1 = drv._appnucl(state, 10.0, napari=True, lovejoy=False)
    _, d2s = drv._appnucl(state, 10.0, napari=False, lovejoy=True)
    out_state, diag = drv(state, 10.0)

    xn1 = np.asarray(d1["xn_app"])
    # the second pass of the combined run sees the post-Napari state;
    # compare only where the first pass consumed nothing significant
    assert np.all(np.isfinite(np.asarray(diag["xn_app"])))
    assert np.all(np.asarray(diag["xn_app"]) >= xn1 * (1 - 1e-6))
    np.testing.assert_allclose(
        np.asarray(diag["grorate"]),
        0.5 * (np.asarray(d1["grorate"])
               + np.asarray(drv._appnucl(
                   drv._appnucl(state, 10.0, napari=True,
                                lovejoy=False)[0],
                   10.0, napari=False, lovejoy=True)[1]["grorate"])),
        rtol=1e-10)


def test_feedback_adds_particles_and_consumes_vapor(nuc_model):
    model, state = nuc_model
    drv = model._nucleation
    conc = state.chem.sgas
    n2i = drv.n2i
    for nm, val in (("H2SO4", 5e-8), ("NH3", 5e-9), ("OIO", 1e-9)):
        if nm in n2i:
            conc = conc.at[n2i[nm]].set(
                jnp.full(conc.shape[1], val, conc.dtype))
    state = state.replace(chem=state.chem.replace(sgas=conc))
    out, diag = drv(state, 10.0)
    if float(jnp.max(diag["xn_app"])) > 0.1:
        n_before = float(jnp.sum(state.micro.ff))
        n_after = float(jnp.sum(out.micro.ff))
        assert n_after > n_before
    # vapor never increases
    for nm in ("OIO", "H2SO4", "NH3"):
        if nm in n2i:
            assert np.all(np.asarray(out.chem.sgas[n2i[nm]])
                          <= np.asarray(conc[n2i[nm]]) + 1e-30)
