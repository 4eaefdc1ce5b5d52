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
