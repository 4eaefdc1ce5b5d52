"""Aqueous-phase support physics: the reference's "liq_parm stack".

Parity map (all kpp.f90):
- ``cw_rc`` (:2152-2420): per-bin LWC cw, mean radius rc, molality switch
  cm, conversion conv2, with deliquescence/crystallisation hysteresis
- ``st_coeff_a/t`` (:664-1044): sticking coefficients alpha(T)
- ``v_mean`` (:1045-1263): mean molecular speeds
- ``henry_a/t`` (:1676-2151): dimensionless inverse Henry constants
- ``equil_co_a/t`` (:2954-3369): acid-base equilibrium rates xkef/xkeb
- ``fast_k_mt_a/t`` (:2421-2953): Schwartz mass-transfer coefficients kmt
  and aqueous-bin fall velocities vt
- ``dry_cw_rc``/``dry_rates_g/a/t`` (:4580-5203): het chemistry on dry
  aerosol (xkmtd, dry henry, xeq)

All loops over the 2-D particle grid become masked einsums with the static
(nkt, nka, nkc) chemistry-bin membership tensor; the species dimension is
carried as named tables.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import CAL15, GAS_CONST, PI
from .driver import HENRY_TABLE, henry_molar

# thresholds (cw_rc)
CWM = 1.0e-1    # aerosol bins 1-2 activity threshold [um3/cm3-ish units]
CWMD = 1.0e2    # droplet bins 3-4
XCRYSSULF = 0.4
XCRYSSS = 0.42
XDELISULF = 0.7
XDELISS = 0.75

# species exchanged between gas and aqueous phase (fast_k_mt lex list)
EXCHANGE_SPECIES = [
    "NO2", "HNO3", "NH3", "SO2", "H2SO4", "O3", "ACO2", "HCHO", "H2O2",
    "HONO", "HCl", "N2O5", "HNO4", "NO3", "OH", "HO2", "MO2", "CO2", "O2",
    "ROOH", "HOCl", "Cl2", "HBr", "HOBr", "Br2", "BrCl", "DMSO", "ClNO3",
    "BrNO3", "CH3SO3H", "DMS", "CH3SO2H", "DMSO2", "HOI", "IO", "I2",
    "ICl", "IBr", "OIO", "INO2", "INO3", "HI", "I2O2", "HIO3", "NO",
    "ACTA", "CH3OH", "C2H5OH", "XOR", "SOR"]

# molar masses [kg/mol] for vmean of species not in the gas CSV
EXTRA_MASS = {
    "OH": 17e-3, "HO2": 33e-3, "MO2": 47e-3, "OIO": 159e-3, "O1D": 16e-3,
    "O3P": 16e-3, "CO2": 44e-3, "ClNO3": 97.5e-3, "HIO3": 176e-3,
}

# equilibrium table keys (equil_co_t): name -> (kf_expr, kb_const,
# gamma indices).  kf is either a constant or (A, B) for funa(A,B) =
# A*exp(B*(1/T - 1/298)); kb couples to conv2 and activity coefficients.
EQUILIBRIA = {
    "H2O":      ((1.0e-5, -6716.0), 1.0e9, (1, 3)),
    "HO2":      (1.6e5, 1.0e10, (1, 11)),
    "ACO2":     (1.8e0, 1.0e4, (1, 16)),
    "CO2":      ((4.3e-2, -913.0), 1.0e5, (1, 9)),
    "HONO":     ((5.1e3, -1260.0), 1.0e7, (1, 12)),
    "HNO3":     ((1.54e10, 8700.0), 1.0e9, (1, 13)),
    "HNO4":     (2.0e3, 2.0e8, ()),
    "NH3":      ((1.7e5, -4325.0), 1.0e10, (3, 2)),
    "HSO3ml1":  ((6.0e2, 1120.0), 1.0e10, (1, 6)),      # kf x gamma(5)
    "H2SO4":    (1.0e12, 1.0e9, (1, 19)),
    "HSO4ml1":  ((1.02e6, 2720.0), 1.0e8, (1, 8)),      # kf x gamma(19)
    "SO2":      ((1.7e8, 2090.0), 1.0e10, (1, 5)),
    "HCHO":     ("conv2_1e10", 1.0e5, ()),               # special: kf~cv2
    "HCl":      ((1.7e10, 6896.0), 1.0e4, (1, 14)),
    "Cl2ml1":   (5.2e4, 1.0e10, ()),                     # kf x gamma(15); kb x gamma(14)
    "HOCl":     (3.2e2, 1.0e10, (1, 22)),
    "HBr":      (1.0e13, 1.0e4, (1, 24)),
    "Br2":      ((2.95e4, -4068.0), (1.17e10, -1812.0), ()),
    "HOBr":     ((2.3e1, -3091.0), 1.0e10, (1, 26)),
    "BrCl2ml1": ("kf_cv2", 1.3e9, ()),
    "Br2Clml1": ("kf_cv2_5e9", 2.8e5, ()),
    "Br2l1":    ("kf_cv2_5e9", 3.85e9, ()),
    "ICl":      ("kf_cv2_1e11", 1.3e9, ()),
    "IBr":      ("kf_cv2_1e11b", 3.5e8, ()),
    "IClBrml1": ("kf_cv2_5e9", 2.8e5, ()),
    "I2":       ("kf_cv2_5e9", 3.85e9, ()),
    "HIO3":     (1.57e4, 1.0e5, ()),
}


def bin_masks(micro_grid):
    """Static (nkt, nka, nkc) membership tensor of the 4 chemistry bins."""
    ka = micro_grid.ka
    kw = np.asarray(micro_grid.kw)
    nka = kw.shape[0]
    nkt = micro_grid.ew.shape[0]
    ia = np.arange(nka)[None, :]
    jt = np.arange(nkt)[:, None]
    small_a = ia < ka           # dry bins 1..ka (0-based < ka)
    small_t = jt < kw[None, :]  # water bins 1..kw(ia)
    masks = np.stack([
        small_a & small_t,            # bin 1: small aerosol
        (~small_a) & small_t,         # bin 2: large aerosol
        small_a & (~small_t),         # bin 3: small droplets
        (~small_a) & (~small_t),      # bin 4: large droplets
    ], axis=-1).astype(np.float64)
    return masks


def cw_rc(ff, feu, cloud, micro_grid, masks, dtype):
    """LWC/radius/molality switches per chemistry bin.

    ff [nkt, nka, n]; feu [n]; cloud [nkc, n] bool hysteresis state.
    Returns (cw, cm, rc, conv2) each [nkc, n] plus new cloud flags.
    """
    rq = jnp.asarray(micro_grid.rq, dtype)
    e = jnp.asarray(micro_grid.e, dtype)
    m = jnp.asarray(masks, dtype)
    xpi = 4.0 / 3.0 * PI

    vol = xpi * rq ** 3                              # [nkt, nka] um3
    cw_raw = jnp.einsum("tkn,tk,tkc->cn", ff, vol, m)
    rc_raw = jnp.einsum("tkn,tk,tkc->cn", ff, vol * rq, m)
    cm_raw = jnp.einsum("tkn,t,tkc->cn", ff, e, m)

    rc = jnp.where(cw_raw > 0.0, rc_raw / jnp.maximum(cw_raw, 1e-300)
                   * 1.0e-6, 0.0)
    cw = cw_raw * 1.0e-12                            # m3(aq)/m3(air)

    thresh = jnp.asarray([CWM, CWM, CWMD, CWMD], dtype)[:, None]
    crys = jnp.asarray([XCRYSSULF, XCRYSSS, 0.0, 0.0], dtype)[:, None]
    deli = jnp.asarray([XDELISULF, XDELISS, 0.0, 0.0], dtype)[:, None]

    big = cw_raw >= thresh
    aero = jnp.arange(4)[:, None] < 2
    wet_ok = jnp.where(aero,
                       (cloud & (feu[None, :] >= crys))
                       | (feu[None, :] >= deli),
                       True)
    both_dry = feu[None, :] < min(XCRYSSULF, XCRYSSS)
    active = big & wet_ok & ~(both_dry & aero)

    cm = jnp.where(active, cm_raw * 1.0e-3, 0.0)
    conv2 = jnp.where(active, 1.0e9 / jnp.maximum(cw_raw, 1e-300), 0.0)
    return cw, cm, rc, conv2, active


def sticking_coefficients(species, t, lp_buxmann=False, dtype=jnp.float64):
    """alpha(T) per species: [nspec_listed, n] given t [n]
    (st_coeff_t, kpp.f90:664-1044; default 0.1)."""
    tcorr = 1.0 / t - 1.0 / 298.15
    RT = GAS_CONST * t
    CoR = CAL15 / GAS_CONST
    CoRT = CAL15 / RT
    zexp2 = jnp.exp(2000.0 * tcorr)

    def sig(base):
        # the reference's saturating T-dependence form
        return 1.0 / (1.0 + 1.0 / ((1.0 / (1.0 / base - 1.0)) * zexp2))

    table = {
        "H2SO4": 0.65, "O3P": 1.0e-6, "O1D": 1.0e-6, "O3": 2.0e-3,
        "O2": sig(1.0e-2), "OH": 1.0e-2, "HO2": 2.0e-1,
        "H2O2": 1.0 / (jnp.exp(-26.0e3 / RT + 107.8456 / GAS_CONST) + 1.0),
        "NO": 5.0e-5, "NO2": 1.5e-3, "NO3": 4.0e-2,
        "HONO": 4.0e-2, "HNO3": 5.0e-1, "NH3": 6.0e-2,
        "MO2": sig(1.0e-2),
        "ROOH": 1.0 / (jnp.exp(-6.5e3 * CoRT + 32.5 * CoR) + 1.0),
        "HCHO": 4.0e-2,
        "ACO2": 1.0 / (jnp.exp(-7.9e3 * CoRT + 34.9 * CoR) + 1.0),
        "ACTA": 6.7e-2, "CH3OH": 5.6e-2, "C2H5OH": 4.8e-2,
        "CO2": sig(1.0e-2),
        "HCl": 1.0 / (jnp.exp(-3.072e3 / t + 1.283e1) + 1.0),
        "Cl2": 1.0 / (jnp.exp(-1.3e4 * CoRT + 50.0 * CoR) + 1.0),
        "HBr": 1.0 / (jnp.exp(-3.94e3 / t + 1.664e1) + 1.0),
        "HOBr": 6.0e-1, "HOCl": 6.0e-1, "BrNO3": 8.0e-1,
        "Br2": 1.0 / (jnp.exp(-1.3e4 * CoRT + 50.0 * CoR) + 1.0),
        "BrCl": 0.33, "SO2": 1.1e-1,
        "CH3SO3H": 1.0 / (jnp.exp(-3.50e3 * CoRT + 16.7 * CoR) + 1.0),
        "DMS": 1.0e-2,
        "DMSO": 1.0 / (jnp.exp(-5.12e3 * CoRT + 23.1 * CoR) + 1.0),
        "DMSO2": 1.0 / (jnp.exp(-10.7e3 * CoRT + 43.0 * CoR) + 1.0),
        "CH3SO2H": 2.0e-4,
        "INO3": sig(1.0e-1), "HOI": 6.0e-1,
        "HI": 1.0 / (jnp.exp(-4.13e3 / t + 1.715e1) + 1.0),
        "I2": sig(1.0e-2), "IO": sig(5.0e-1), "I2O2": sig(1.0e-1),
        "ICl": 1.8e-2 if lp_buxmann else sig(1.0e-2),
        "IBr": 1.8e-2 if lp_buxmann else sig(1.0e-2),
        "INO2": sig(1.0e-1), "OIO": 1.0, "HIO3": sig(1.0e-2),
        "XOR": 7.0e-2,
    }
    rows = []
    ones = jnp.ones_like(t)
    for name in species:
        val = table.get(name, 0.1)
        rows.append(jnp.minimum(1.0, val * ones))
    return jnp.stack(rows)          # [nspec, n]


def mean_speeds(species, masses, t, dtype=jnp.float64):
    """vmean = sqrt(8RT/(pi M)) [m/s] per species: [nspec, n]."""
    vals = []
    for name in species:
        m = masses.get(name, EXTRA_MASS.get(name, 0.1))
        vals.append(jnp.sqrt(8.0 * GAS_CONST * t / (PI * m)))
    return jnp.stack(vals)


def inverse_henry(species, t):
    """Dimensionless inverse Henry constants [nspec, n] (henry_a tail)."""
    fct = 0.0820577 * t
    rows = []
    for name in species:
        h = henry_molar(name, t)
        rows.append(jnp.where(h > 0.0,
                              1.0 / (jnp.maximum(h, 1e-300) * fct), 0.0))
    return jnp.stack(rows)


def fast_k_mt(ff, t, p, alpha, vmean, cw, cm, masks, micro_grid, freep,
              dtype):
    """Schwartz mass-transfer coefficients and bin fall velocities.

    alpha/vmean: [nexch, n]; ff [nkt, nka, n]; cw/cm [nkc, n].
    Returns xkmt [nexch, nkc, n], vt [nkc, n].
    """
    from ..physics.sedimentation import vterm
    rqm = jnp.asarray(micro_grid.rq, dtype) * 1.0e-6     # [nkt, nka] m
    m = jnp.asarray(masks, dtype)                        # [nkt, nka, nkc]
    z4pi3 = 4.0e-9 * PI / 3.0 * 1.0e9  # the reference's z4pi3*1e6 scaling
    z4pi3 = 4.0 * PI / 3.0

    # fall velocities (l == 1 branch of fast_k_mt)
    xvs = vterm(rqm[:, :, None], t[None, None, :], p[None, None, :])
    xx1 = jnp.einsum("tkn,tk,tkc->cn", ff * xvs, rqm ** 3 * 1.0e6, m)
    vt = jnp.where(cw > 0.0, z4pi3 / jnp.maximum(cw, 1e-300) * xx1, 0.0)

    # kmt per exchange species: loop over species via lax.map to bound
    # memory (each iteration handles a [nkt, nka, n] block)
    def one_species(av):
        a_l, v_l = av                                    # [n], [n]
        x1 = jnp.where(a_l > 0.0, 4.0 / (3.0 * jnp.maximum(a_l, 1e-300)),
                       0.0)
        x2 = v_l[None, None, :] / (rqm[:, :, None] / freep[None, None, :]
                                   + x1[None, None, :])
        xk1 = jnp.einsum("tkn,tk,tkc->cn", ff * x2, rqm ** 2 * 1.0e6, m)
        return jnp.where((cw > 0.0) & (cm > 0.0),
                         z4pi3 / jnp.maximum(cw, 1e-300) * xk1, 0.0)

    xkmt = jax.lax.map(one_species, (alpha, vmean))      # [nexch, nkc, n]
    return xkmt, vt


def equil_constants(t, conv2, xgamma, dtype):
    """Acid-base equilibrium forward/backward rates.

    conv2 [nkc, n]; xgamma [j6ish, nkc, n] activity coefficients (ones
    until the Pitzer stage fills them).  Returns dicts key -> [nkc, n].
    """
    def funa(a0, b0):
        return a0 * jnp.exp(b0 * (1.0 / t - 3.354e-3))[None, :]

    def gam(i):
        return xgamma[i - 1] if xgamma is not None else 1.0

    kef, keb = {}, {}
    for key, (kf, kb, gidx) in EQUILIBRIA.items():
        # forward
        if kf == "conv2_1e10":
            f = 1.0e10 * conv2
        elif kf == "kf_cv2":
            f = funa(5.0e9, 1143.0) * conv2 * gam(14)
        elif kf == "kf_cv2_5e9":
            f = 5.0e9 * conv2
        elif kf == "kf_cv2_1e11":
            f = 1.0e11 * conv2 * gam(14)
        elif kf == "kf_cv2_1e11b":
            f = 1.0e11 * conv2 * gam(24)
        elif isinstance(kf, tuple):
            f = funa(*kf) * jnp.ones_like(conv2)
        else:
            f = kf * jnp.ones_like(conv2)
        if key == "HSO3ml1":
            f = f * gam(5)
        elif key == "HSO4ml1":
            f = f * gam(19)
        elif key == "Cl2ml1":
            f = f * gam(15)
        elif key == "Br2":
            f = f * gam(25)
        # backward
        if isinstance(kb, tuple):
            b = funa(*kb) * conv2 * gam(24)
        elif key == "HCHO":
            b = kb * jnp.ones_like(conv2)
        elif key in ("BrCl2ml1",):
            b = kb * gam(28) * jnp.ones_like(conv2)
        elif key in ("ICl",):
            b = kb * gam(37) * jnp.ones_like(conv2)
        elif key in ("IBr",):
            b = kb * gam(38) * jnp.ones_like(conv2)
        elif key in ("Br2Clml1", "Br2l1", "IClBrml1", "I2", "HIO3",
                     "HNO4"):
            b = kb * conv2 if key in ("HIO3", "HNO4") else \
                kb * jnp.ones_like(conv2)
        elif key == "Cl2ml1":
            b = kb * conv2 * gam(14)
        else:
            g = 1.0
            for i in gidx:
                g = g * gam(i)
            b = kb * conv2 * g
        active = conv2 > 0.0
        kef[key] = jnp.where(active, f, 0.0)
        keb[key] = jnp.where(active, b, 0.0)
    return kef, keb


def dry_aerosol_rates(species, ff, t, p, masks, micro_grid, freep, nf,
                      dtype):
    """Het-on-dry-aerosol stack: xkmtd [4, 2, n], dry henry and xeq for
    HNO3/N2O5/NH3/H2SO4 plus dry cw/rc (dry_cw_rc + dry_rates_g)."""
    rq = jnp.asarray(micro_grid.rq, dtype)
    m = jnp.asarray(masks, dtype)[:, :, :2]          # aerosol bins only
    xpi = 4.0 / 3.0 * PI
    vol = xpi * rq ** 3
    cwd_raw = jnp.einsum("tkn,tk,tkc->cn", ff, vol, m)
    rcd_raw = jnp.einsum("tkn,tk,tkc->cn", ff, vol * rq, m)
    rcd = jnp.where(cwd_raw > 0.0,
                    rcd_raw / jnp.maximum(cwd_raw, 1e-300) * 1.0e-6, 0.0)
    cwd = cwd_raw * 1.0e-12

    zgamma = {"HNO3": 0.02, "N2O5": 0.02, "NH3": 0.05, "H2SO4": 0.1}
    vmean_c = {"HNO3": 6.3e-2, "N2O5": 1.08e-1, "NH3": 1.7e-2,
               "H2SO4": 9.8e-2}
    xkmtd = {}
    for name in ("HNO3", "N2O5", "NH3", "H2SO4"):
        zv = jnp.sqrt(t / vmean_c[name]) * 4.60138
        g = zgamma[name]
        x1 = jnp.where(rcd > 0.0,
                       1.0 / (jnp.maximum(rcd, 1e-300)
                              * (rcd / freep[None, :] + 4.0 / (3.0 * g))),
                       0.0)
        xkmtd[name] = zv[None, :] * x1               # [2, n]

    xeq_hno3 = 1.54e1 * jnp.exp(8700.0 * (1.0 / t - 3.354e-3))
    fct = 0.0820577 * t
    h_hno3_molar = (2.5e6 / jnp.maximum(xeq_hno3, 1e-300)) \
        * jnp.exp(8694.0 * (1.0 / t - 3.3557e-3))
    henry_dry = {"HNO3": 1.0 / (h_hno3_molar * fct)}
    for name in ("N2O5", "NH3", "H2SO4"):
        h = henry_molar(name, t)
        henry_dry[name] = jnp.where(h > 0.0,
                                    1.0 / (jnp.maximum(h, 1e-300) * fct),
                                    0.0)
    return {"xkmtd": xkmtd, "henry_dry": henry_dry, "xeq_hno3": xeq_hno3,
            "cwd": cwd, "rcd": rcd}
