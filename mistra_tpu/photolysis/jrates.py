"""Photolysis driver: profiles -> optical depths -> actinic fluxes -> the
47 J-rates of the mechanism (reference photol, jrate.f:95-399).

The J-rate indexing (1-based slots of photol_j) follows the reference's
copy loop (jrate.f:330-395).  Each rate is the direct spectral integral
J(k) = sum_l sigma(l, T_k) * qy(l, T_k) * F_act(l, k) over the 176
intervals, evaluated with the same cross-section tables.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .tables import MAXWAV, PhotolysisTables
from . import solver as S

NPHRXN = 47

# photol_j slot (1-based) -> cross-section recipe:
#   ("cs", name)            single-T cross section
#   ("cst", name)           T-interpolated cross section
# optional quantum-yield channel and scale factor applied afterwards.
J_RECIPES = {
    1: ("cst", "NO2", "NO2", 1.0),
    2: ("cst", "NO3", "NOO2", 1.0),
    4: ("cs", "HONO", None, 1.0),
    5: ("cs", "HNO3", "T_HNO3", 1.0),
    6: ("cs", "H2O2", None, 1.0),
    7: ("cs", "HNO4", None, 2.0 / 3.0),
    8: ("cst", "CH2O", "CHOH", 1.0),
    9: ("cst", "CH2O", "COH2", 1.0),
    10: ("cst", "NO3", "NO2O", 1.0),
    11: ("cs", "HNO4", None, 1.0 / 3.0),
    12: ("cs", "N2O5", None, 1.0),
    13: ("cs", "HOCl", None, 1.0),
    14: ("cst", "ClONO2", None, 1.0),
    15: ("cs", "BrNO3", None, 1.0),
    16: ("cs", "Cl2O2", None, 1.0),
    17: ("cs", "CH3OOH", None, 1.0),
    18: ("cs", "ClNO2", None, 1.0),
    19: ("cs", "Cl2_noT", None, 1.0),
    20: ("cs", "HOBr", None, 1.0),
    21: ("cs", "BrNO2", None, 1.0),
    22: ("cs", "Br2", None, 1.0),
    23: ("cs", "BrCl_noT", None, 1.0),
    24: ("cs", "BrO_noT", None, 1.0),
    25: ("cs", "IO", None, 1.0),
    26: ("cs", "HOI_Jen91", None, 1.0),
    27: ("cs", "I2", None, 1.0),
    28: ("cs", "ICl", None, 1.0),
    29: ("cs", "IBr", None, 1.0),
    30: ("cs", "INO3", None, 1.0),
    31: ("cs", "CH3I", None, 1.0),
    32: ("cs", "C3H7I", None, 1.0),
    33: ("cs", "CH2ClI", None, 1.0),
    34: ("cs", "CH2I2", None, 1.0),
    35: ("cs", "OClO_noT", None, 1.0),
    37: ("cs", "INO2", None, 1.0),
    38: ("cs", "NO2m", None, 1.0),
    39: ("cs", "NO3n", "QYNO3n", 1.0),
    41: ("cs", "dumm24", None, 1.0),
    42: ("cs", "dumm25", None, 1.0),
    43: ("cs", "dumm26", None, 1.0),
}
# derived slots: 3 (O1D), 47 (O3P), 36 (I2O2 = 9 x J16),
# 40 (OIO = J35), 44 (CH2BrI = J34/17), 46 (C2H5I = J31), 45 unused.


def compute_jrates(tb: PhotolysisTables, press_pa, temp, qmo3, u0,
                   taer_s, taer_a, ga_pl, albedo, scaleo3, dtype):
    """Full photolysis calculation on the radiation grid (top-down).

    Args:
      press_pa, temp, qmo3: [nrlev] level values (top-down, level 0 = the
        uppermost model level; the virtual "infinity" level is added here).
      taer_s/taer_a/ga_pl: [nrlay] aerosol optics from the radiation code.
      albedo: scalar shortwave albedo.  scaleo3: O3 column [DU].

    Returns photol_j [NPHRXN, nrlay+1] (top-down levels incl. virtual top).
    """
    L = press_pa.shape[0] - 1  # nrlay

    # virtual level 0 (reference read_data:507-516)
    press = press_pa / 100.0
    p0 = 0.37 * press[0]
    t0 = (temp[1] - temp[0]) / (press[1] - press[0]) * (-0.63) * press[0] \
        + temp[0]
    o30 = (qmo3[1] - qmo3[0]) / (press[1] - press[0]) * (-0.63) * press[0] \
        + qmo3[0]
    pressx = jnp.concatenate([p0[None], press])        # [L+2]? no:
    # reference maps model levels 1..L onto TEMP(1..L); our inputs already
    # carry L+1 levels, the virtual level replaces index 0
    press_l = jnp.concatenate([p0[None], press[1:]])
    temp_l = jnp.concatenate([t0[None], temp[1:]])
    o3_l = jnp.concatenate([o30[None], qmo3[1:]])

    cols = S.column_densities(press_l, temp_l, o3_l, u0, scaleo3)
    v2s, v3s = cols["v2s"], cols["v3s"]
    dv2, dv3 = cols["dv2"], cols["dv3"]

    # cross sections on levels
    cst_o3 = S.interp_t(*tb.cs_t["O3"], temp_l)        # [L+1, 176]
    sro2 = S.sr_o2_km(tb, v2s, temp_l)                 # [13, L+1]
    cs_o2 = jnp.broadcast_to(jnp.asarray(tb.cs["O2"], dtype),
                             (L + 1, MAXWAV))
    cst_o2 = cs_o2.at[:, :13].set(sro2.T)
    qyo1d = S.qy_o1d(tb, temp_l)                       # [L+1, 176]

    # ---- optical depths per layer and wavelength -------------------------
    ta_o2 = 0.5 * (cst_o2[:-1] + cst_o2[1:]) * dv2[:, None]    # [L, 176]
    # top layer Schumann-Runge handled by the fitted TOA polynomial
    dlv2s = jnp.log(jnp.maximum(v2s[0], 1.0))
    ct = jnp.asarray(S.CT_TOP, dtype)                          # [13, 4]
    toa_poly = u0 * jnp.exp(ct[:, 0] + (ct[:, 1] + (ct[:, 2]
                            + ct[:, 3] * dlv2s) * dlv2s) * dlv2s)
    ta_o2 = ta_o2.at[0, :13].set(toa_poly)
    ta_o3 = 0.5 * (cst_o3[:-1] + cst_o3[1:]) * dv3[:, None]
    taua_clr = (ta_o2 + ta_o3).T                               # [176, L]
    cs_ray = jnp.asarray(tb.cs_ray, dtype)
    taus_clr = (cs_ray[None, :] / 0.21 * dv2[:, None]).T
    taus_clr = taus_clr.at[:13, :].set(0.0)  # SR band: absorption only

    taua = taua_clr + taer_a[None, :]
    taus = taus_clr + taer_s[None, :]

    # phase function moments: Rayleigh (2nd moment 0.1) + aerosol H-G
    wsca = jnp.maximum(taus, 1e-30)
    g = ga_pl[None, :]
    ww1 = 3.0 * g * taer_s[None, :] / wsca
    ww2 = (5.0 * g ** 2 * taer_s[None, :] + 0.1 * taus_clr) / wsca
    ww3 = 7.0 * g ** 3 * taer_s[None, :] / wsca
    ww4 = 9.0 * g ** 4 * taer_s[None, :] / wsca

    flx = jnp.asarray(tb.flux, dtype)
    alb = jnp.full((MAXWAV,), albedo, dtype)
    fact = S.four_stream(taus, taua, ww1, ww2, ww3, ww4, alb, flx, u0)
    fact = jnp.where(u0 > 0.0, fact, 0.0)              # [176, L+1]

    # ---- spectral J integrals -------------------------------------------
    jr = jnp.zeros((NPHRXN, L + 1), dtype)

    def spectral_j(sigma_lw):
        # sigma_lw [L+1, 176] or [176] -> J [L+1]
        if sigma_lw.ndim == 1:
            return fact.T @ sigma_lw
        return jnp.einsum("lw,wl->l", sigma_lw, fact)

    qy_chan = {k: jnp.asarray(v, dtype) for k, v in tb.qy.items()}
    for slot, (kind, name, qy, scale) in J_RECIPES.items():
        if kind == "cs":
            sig = jnp.asarray(tb.cs[name], dtype)
        else:
            sig = S.interp_t(*tb.cs_t[name], temp_l)
        if qy == "T_HNO3":
            corr = jnp.exp(jnp.asarray(tb.coeff_hno3, dtype)[None, :]
                           * (temp_l[:, None] - 298.0))
            sig = sig[None, :] * corr if sig.ndim == 1 else sig * corr
        elif qy == "QYNO3n":
            qyno3 = 1.7e-2 * jnp.exp(1800.0 * (1.0 / 298.0 - 1.0 / temp_l))
            sig = (sig[None, :] if sig.ndim == 1 else sig) \
                * qyno3[:, None]
        elif qy is not None:
            sig = sig * qy_chan[qy][None, :] if sig.ndim == 2 \
                else sig * qy_chan[qy]
        jr = jr.at[slot - 1].set(scale * spectral_j(sig))

    # O3 channels with the Michelsen quantum yield
    j_o1d = jnp.einsum("lw,wl->l", cst_o3 * qyo1d, fact)
    j_o3p = jnp.einsum("lw,wl->l", cst_o3 * (1.0 - qyo1d), fact)
    jr = jr.at[2].set(j_o1d)        # slot 3
    jr = jr.at[46].set(j_o3p)       # slot 47
    # derived slots
    jr = jr.at[35].set(9.0 * jr[15])        # I2O2 = 9 x Cl2O2
    jr = jr.at[39].set(jr[34])              # OIO = OClO
    jr = jr.at[43].set(jr[33] / 17.0)       # CH2BrI = CH2I2/17
    jr = jr.at[45].set(jr[30])              # C2H5I = CH3I
    return jnp.maximum(jr, 0.0)


class PhotolysisDriver:
    """Model-facing driver: profiles from the radiation stack -> photol_j
    on the model grid (bottom-up)."""

    def __init__(self, model, rad_driver):
        from .tables import load_photolysis_tables
        import os
        cfg = model.cfg
        self.model = model
        self.rad = rad_driver
        self.dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32
        phot_dir = os.path.join(cfg.inpdir, "photolys/")
        self.tb = load_photolysis_tables(phot_dir)
        self.albedo = float(rad_driver.albedo[0])
        self.scaleo3 = cfg.scaleo3_m

    def __call__(self, state):
        """Compute photol_j [NPHRXN, n] (bottom-up model levels)."""
        gp = self.model.cfg.grid
        n, nrlay = gp.n, gp.nrlay
        tx, px, rhox, xm1x, ts, bea, baa, ga = self.rad.load_profile(state)
        # top-down level arrays
        t_td = tx[::-1]
        p_td = px[::-1]
        qmo3_td = jnp.asarray(self.rad.qmo3[::-1].copy(), self.dtype)
        thk_td = jnp.asarray(self.rad.thk[::-1].copy(), self.dtype)
        bea_td = bea[0, ::-1]
        baa_td = baa[0, ::-1]
        ga_td = ga[0, ::-1]
        taer_s = (bea_td - baa_td) * thk_td
        taer_a = baa_td * thk_td

        jr = compute_jrates(self.tb, p_td, t_td, qmo3_td, state.rad.u0,
                            taer_s, taer_a, ga_td, self.albedo,
                            self.scaleo3, self.dtype)      # [47, nrlay+1]
        # map to model levels: model level j (0-based) <-> rad level L - j
        idx = nrlay - jnp.arange(n)
        return jr[:, idx]
