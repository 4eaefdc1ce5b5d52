"""Surface layer: Clarke-function drag interpolation and the water-surface
boundary condition.

Reference semantics: ``claf`` (str.f90:4369-4477) interpolates tabulated
Clarke functions read from ``input/clarke.dat``; ``surf0``
(str.f90:3954-4071) applies the constant-SST water surface with forced
relative humidity and Charnock roughness.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..constants import G
from .thermo import p21
from ..constants import EPS_RATIO, ONE_MINUS_EPS


@dataclass(frozen=True)
class ClarkeTable:
    fu: np.ndarray      # [18, 7] momentum Clarke function
    ft: np.ndarray      # [18, 7] heat/moisture Clarke function
    xzpdl: np.ndarray   # [18] stability coordinate nodes
    xzpdz0: np.ndarray  # [7] roughness coordinate nodes


def load_clarke_table(inpdir: str) -> ClarkeTable:
    """Parse input/clarke.dat (free whitespace floats, Fortran fill order)."""
    path = os.path.join(inpdir, "clarke.dat")
    with open(path) as f:
        vals = np.array([float(tok) for tok in f.read().split()])
    nfu = 18 * 7
    fu = vals[:nfu].reshape(7, 18).T           # read i-fastest, k slow
    ft = vals[nfu:2 * nfu].reshape(7, 18).T
    xzpdl = vals[2 * nfu:2 * nfu + 18]
    xzpdz0 = vals[2 * nfu + 18:2 * nfu + 25]
    return ClarkeTable(fu=fu, ft=ft, xzpdl=xzpdl, xzpdz0=xzpdz0)


def claf(table: ClarkeTable, zpdl, zpdz0):
    """Interpolate Clarke functions (cu for momentum, ctq for heat).

    Pure JAX; all branch structure of the table lookup is expressed with
    gathers and where-selects so it vmaps over column ensembles.
    """
    dtype = jnp.asarray(zpdl).dtype
    fu = jnp.asarray(table.fu, dtype)
    ft = jnp.asarray(table.ft, dtype)
    xzpdl = jnp.asarray(table.xzpdl, dtype)
    xzpdz0 = jnp.asarray(table.xzpdz0, dtype)

    zpdla = jnp.clip(zpdl, -5.5, 3.0)
    zpdz0a = jnp.minimum(zpdz0, 17.0)

    # nl: first node index with xzpdl[nl] > zpdla (0-based, in 1..17)
    nl = jnp.clip(jnp.searchsorted(xzpdl, zpdla, side="right"), 1, 17)
    # nz: first node index with xzpdz0[nz] > zpdz0a (0-based, in 0..6)
    nz = jnp.clip(jnp.searchsorted(xzpdz0, zpdz0a, side="right"), 0, 6)

    dx = (zpdla - xzpdl[nl - 1]) / (xzpdl[nl] - xzpdl[nl - 1])

    # --- branch nz == 0: scale from the first roughness node --------------
    dy0 = zpdz0a / xzpdz0[0]
    u_b0 = (fu[nl, 0] * dx + fu[nl - 1, 0] * (1.0 - dx)) * dy0
    t_b0 = (ft[nl, 0] * dx + ft[nl - 1, 0] * (1.0 - dx)) * dy0 / 1.35

    # --- branch nz >= 1: bilinear interpolation ---------------------------
    nzs = jnp.maximum(nz, 1)  # safe index for the gather below
    dy = (zpdz0a - xzpdz0[nzs - 1]) / (xzpdz0[nzs] - xzpdz0[nzs - 1])

    def bilin(tab):
        t00 = tab[nl - 1, nzs - 1]
        t10 = tab[nl, nzs - 1]
        t01 = tab[nl - 1, nzs]
        t11 = tab[nl, nzs]
        return t00 + (t10 - t00) * dx + (t01 - t00) * dy \
            + (t11 - t01 + t00 - t10) * dx * dy

    u_b1 = bilin(fu)
    t_b1 = bilin(ft) / 1.35

    u = jnp.where(nz == 0, u_b0, u_b1)
    tq_unstable = jnp.where(nz == 0, t_b0, t_b1)
    tq = jnp.where(zpdl >= 0.0, u / 1.35, tq_unstable)
    return u, tq


def surf0(table: ClarkeTable, met, surf, eta, dt, *, rhsurf=1.0,
          ltwcst=True, ntwopt=1):
    """Water-surface boundary condition; returns (met, surf) updates.

    Sets surface temperature/humidity, recomputes the frictional velocity
    from the Clarke functions and the Charnock roughness length.
    """
    tw = surf.tw
    if not ltwcst:
        rate = {1: 5.787e-6, 2: 6.94444e-6}[ntwopt]
        tw = tw - rate * dt

    zp21 = p21(tw)
    t0 = tw
    xm1_0 = rhsurf * EPS_RATIO * zp21 / (met.p[0] - ONE_MINUS_EPS * zp21)

    uu, vv = met.u[1], met.v[1]
    vqr = uu * uu + vv * vv
    vbt = jnp.sqrt(vqr)

    zp = 0.5 * eta[1] + surf.z0
    zpdz0 = jnp.log(zp / surf.z0)
    xnvl = G * (met.theta[1] - tw) * 2.0 / (met.theta[1] + tw)
    zpdl = zp * xnvl / vqr

    cu, ctq = claf(table, zpdl, zpdz0)

    ustern = jnp.maximum(0.01, vbt / cu)
    z0_new = 0.015 * ustern * ustern / G

    met = met.replace(t=met.t.at[0].set(t0), xm1=met.xm1.at[0].set(xm1_0))
    surf = surf.replace(tw=tw, ustern=ustern, z0=z0_new, gclu=cu, gclt=ctq)
    return met, surf


# --------------------------------------------------------------------------
# Bare-soil surface (isurf=1): soil diffusion + surface energy balance
# --------------------------------------------------------------------------

# sandy-loam soil constants (reference data_surface.f90:63-71)
AKS = 3.41e-5     # saturated hydraulic conductivity [m/s]
ANU0 = 43.415524  # thermal conductivity reference
BS = 4.9          # moisture potential exponent
BS0 = 2.128043    # conductivity exponent
EBC = 0.0742724   # reference soil moisture
EBS = 0.435       # volumetric porosity
PSIS = -0.218     # saturated moisture potential [m]
RHOC = 1.34e6     # volumetric heat capacity, dry soil [J/m3/K]
RHOCW = 4.186e6   # volumetric heat capacity, water [J/m3/K]
AL31 = 2.835e6    # latent heat of sublimation [J/kg]
SIGMA_SB = 5.6697e-8
T0C = 273.15


def p31(t):
    """Saturation vapour pressure over ice [Pa] (Goff-Gratch form)."""
    t1 = 273.16
    xlog10 = (-9.09685 * (t1 / t - 1.0) - 3.56654 * jnp.log10(t1 / t)
              + 0.87682 * (1.0 - t / t1) + 0.78614)
    return 100.0 * 10.0 ** xlog10


def soil(surf, soil_grid, dt):
    """Implicit heat and moisture diffusion in the soil column
    (str.f90:3842-3953)."""
    from ..utils.tridiag import implicit_sweep
    zb = jnp.asarray(soil_grid.zb, surf.tb.dtype)
    dzb = jnp.asarray(soil_grid.dzb, surf.tb.dtype)
    dzbw = jnp.asarray(soil_grid.dzbw, surf.tb.dtype)
    tb, eb = surf.tb, surf.eb
    nb = tb.shape[0]

    # soil temperature: conductivity depends on moisture
    x0 = jnp.maximum(eb, EBC)
    akb = ANU0 * x0 ** BS0 / ((1.0 - EBS) * RHOC + eb * RHOCW)
    xa = akb * dt / (dzbw * dzb)
    xc = jnp.concatenate([jnp.zeros(1, xa.dtype),
                          xa[:-1] * dzbw[:-1] / dzbw[1:]])
    tb_new = implicit_sweep(xa, xc, tb[:, None])[:, 0]

    # volumetric moisture: hydraulic conductivity ak and diffusivity d
    x0c = 2.0 * BS + 3.0
    x1c = BS + 2.0
    x2c = -BS * AKS * PSIS / EBS
    ebp = jnp.concatenate([eb[1:], eb[-1:]])
    x3 = (eb + dzbw * (ebp - eb) / (2.0 * dzb)) / EBS
    ak = AKS * x3 ** x0c
    d = x2c * x3 ** x1c
    ak = ak.at[0].set(0.0)
    d0 = jnp.where(jnp.abs(eb[1] - eb[0]) > 1.0e-5,
                   surf.ajm * dzb[0] / (1000.0 * (eb[1] - eb[0])), 0.0)
    d = d.at[0].set(d0)
    xa_m = d * dt / (dzbw * dzb)
    xc_m = jnp.concatenate([jnp.zeros(1, xa.dtype),
                            xa_m[:-1] * dzbw[:-1] / dzbw[1:]])
    akm = jnp.concatenate([ak[:1] * 0.0, ak[:-1]])
    rhs = eb + dt / dzbw * (akm - ak)
    rhs = rhs.at[0].set(eb[0])
    eb_new = implicit_sweep(xa_m, xc_m, eb[:, None], rhs=rhs[:, None])[:, 0]
    return surf.replace(tb=tb_new, eb=eb_new)


def surf1(table, met, surf, rad, atm_grid, soil_grid, dt):
    """Bare-soil surface energy/moisture balance (str.f90:4072-4342).

    2-D Newton-Raphson iteration on surface temperature Ts and top-layer
    soil moisture eta1, balancing radiation, soil heat flux, latent and
    sensible fluxes; includes dew (tau) and rime (reif) reservoirs.
    Returns (met', surf').
    """
    import jax
    from .growth import xl21
    from ..constants import CP, G, R1

    dtype = met.t.dtype
    deta = atm_grid.deta
    dzb = jnp.asarray(soil_grid.dzb, dtype)
    rrho = met.rho[0]
    uu, vv = met.u[1], met.v[1]
    vqr = jnp.maximum(uu * uu + vv * vv, 1.0e-12)
    vbt = jnp.sqrt(vqr)
    bs3 = 2.0 * BS + 3.0
    psi2 = PSIS * (EBS / surf.eb[1]) ** BS
    qq2 = met.xm1[1]
    ps = met.p[0]
    tb2 = surf.tb[1]
    eb2 = surf.eb[1]
    sk, sl = rad.sk, rad.sl
    ajs, tau, reif = surf.ajs, surf.tau, surf.reif

    zp = deta[0] + surf.z0
    zpdz0 = jnp.log(zp / surf.z0)

    def cm(pp):
        return 0.62198 * pp / (ps - 0.37802 * pp)

    def clarke(ts):
        xnvl = G * (met.theta[1] - ts) * 2.0 / (met.theta[1] + ts)
        zpdl = zp * xnvl / vqr
        cu, ctq = claf(table, zpdl, zpdz0)
        ustern = jnp.maximum(0.01, vbt / cu)
        return cu, ctq, ustern

    cu0, ctq, ustern = clarke(met.t[0])

    def fluxes(ts, eb1, ddew):
        xm21s = jnp.where(ts >= T0C, cm(p21(ts)), cm(p31(ts)))
        psi1 = PSIS * (EBS / eb1) ** BS
        qs = xm21s * jnp.exp(G * psi1 / (R1 * ts))
        tst = (met.theta[1] - ts * (1.0 + 0.608 * qs)) / ctq
        qst = (qq2 - qs) / ctq
        anu = ANU0 * jnp.maximum(eb1, EBC) ** BS0
        ajb = anu * (tb2 - ts) / dzb[0]
        ajq = rrho * ustern * qst
        ajl = jnp.where(ts < T0C, AL31 * ajq - (AL31 - xl21(ts)) * ajs,
                        xl21(ts) * ajq)
        ajt = rrho * CP * ustern * tst
        rak1 = 1000.0 * AKS * ((0.5 * eb1 + 0.5 * eb2) / EBS) ** bs3
        ajm = rak1 * ((psi2 - psi1) / dzb[0] - 1.0)
        x0 = ajq + ajm + ajs
        sat = eb1 >= EBS
        ddew0 = tau / dt
        ajd = jnp.where(sat, jnp.where(x0 < 0.0,
                                       jnp.minimum(-x0, ddew0), -x0), 0.0)
        ddew_new = jnp.where(sat, ddew0 - ajd, ddew)
        fts = sl + sk + ajb + ajl + ajt - SIGMA_SB * ts ** 4
        fqs = x0 + ajd
        return (fts, fqs, xm21s, psi1, qs, anu, ajb, ajq, ajl, ajt, ajm,
                ajd, rak1, ddew_new)

    ts0 = met.t[0]
    eb1_0 = surf.eb[0]
    f0 = fluxes(ts0, eb1_0, jnp.zeros((), dtype))

    def newton(carry, _):
        ts, eb1, ddew, flx, done = carry
        (fts, fqs, xm21s, psi1, qs, anu, ajb, ajq, ajl, ajt, ajm, ajd,
         rak1, ddew_c) = flx
        djbde = jnp.where(eb1 > EBC, ajb * BS0 / eb1, 0.0)
        djbdt = -anu / dzb[0]
        djqde = rrho * ustern * qs * G * BS * psi1 / (ctq * R1 * ts * eb1)
        x0p = p21(ts)
        djqdt = rrho * ustern * qs / ctq * (
            G * psi1 / (R1 * ts * ts)
            + x0p * 4027.163 / ((x0p - 0.37802 * ps) * (ts - 38.33) ** 2))
        djtdt = -rrho * CP * ustern / ctq
        djmde = rak1 / dzb[0] * psi1 * BS / eb1
        xl = xl21(ts)
        f1e = djbde + xl * djqde
        f1t = djbdt - 2335.5 * ajq + xl * djqdt + djtdt \
            - 4.0 * SIGMA_SB * ts ** 3
        f2e = djqde + djmde
        f2t = djqdt
        det = f1e * f2t - f1t * f2e
        det = jnp.where(jnp.abs(det) < 1.0e-10,
                        jnp.sign(det) * 1.0e-10 + 1.0e-10, det)
        ts_new = ts + (fts * f2e - fqs * f1e) / det
        eb1_new = eb1 + (fqs * f1t - fts * f2t) / det
        eb1_new = jnp.clip(eb1_new, EBS / 15.0, EBS)
        eb1_new = jnp.where(ddew_c > 0.0, EBS, eb1_new)
        ts_new = jnp.where((ts_new > 300.0) | (ts_new < 250.0),
                           ts - 0.01, ts_new)
        flx_new = fluxes(ts_new, eb1_new, ddew_c)
        conv = ((jnp.abs(ts_new - ts) <= 1.0e-2)
                & (jnp.abs(eb1_new - eb1) <= 1.0e-3)) \
            | ((jnp.abs(flx_new[0]) <= 0.1)
               & (jnp.abs(flx_new[1]) <= 0.1 * jnp.abs(flx_new[7])))
        ts_out = jnp.where(done, ts, ts_new)
        eb1_out = jnp.where(done, eb1, eb1_new)
        flx_out = jax.tree.map(lambda a, b: jnp.where(done, a, b),
                               flx, flx_new)
        ddew_out = jnp.where(done, ddew, ddew_c)
        return (ts_out, eb1_out, ddew_out, flx_out, done | conv), None

    (ts, eb1, ddew, flx, _), _ = jax.lax.scan(
        newton, (ts0, eb1_0, jnp.zeros((), dtype), f0,
                 jnp.zeros((), bool)), None, length=20)
    (fts, fqs, xm21s, psi1, qs, anu, ajb, ajq, ajl, ajt, ajm, ajd,
     rak1, ddew) = flx

    # dew / rime bookkeeping
    l1 = ((tau > 0.0) & (ts < T0C)) | ((ts > T0C) & (reif > 0.0))
    ts = jnp.where(l1, T0C, ts)
    tau = jnp.where(ts >= T0C, tau - ajd * dt, tau)
    reif = jnp.where(ts < T0C, reif - ajd * dt, reif)
    uwr = jnp.clip(dt * fts / 3.35e5, -tau, reif)
    tau = jnp.where(l1, tau + uwr, tau)
    reif = jnp.where(l1, reif - uwr, reif)
    tau = jnp.maximum(0.0, tau)
    reif = jnp.maximum(0.0, reif)

    _, ctq2, ustern2 = clarke(ts)
    cu2, ctq2b, _ = clarke(ts)

    met = met.replace(t=met.t.at[0].set(ts),
                      xm1=met.xm1.at[0].set(qs),
                      feu=met.feu.at[0].set(qs / xm21s))
    surf = surf.replace(tb=surf.tb.at[0].set(ts),
                        eb=surf.eb.at[0].set(eb1),
                        tau=tau, reif=reif, ajb=ajb, ajq=ajq, ajl=ajl,
                        ajt=ajt, ajm=ajm, ajd=ajd,
                        ustern=ustern2, gclu=cu2, gclt=ctq2b)
    return met, surf
