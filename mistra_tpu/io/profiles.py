"""Hourly ASCII profile output.

Parity with the reference's human-readable profiles: ``profm`` (met),
``profc`` (chemistry), ``profr`` (radiation) — outp.f90:1745-2277,
written every hour from the main loop (str.f90:504-508).  Format is
column-aligned text, one line per level, one block per output time.
"""

from __future__ import annotations

import numpy as np


def profm(fh, state, atm, nf: int):
    """Meteorology profile block (profm, outp.f90:1745-1918)."""
    met = state.met
    tim = state.tim
    fh.write(f"# day {int(tim.lday)} {int(tim.lst):02d}:"
             f"{int(tim.lmin):02d}  t={float(tim.time):.0f}s\n")
    fh.write("#  k     eta[m]      u[m/s]      v[m/s]       T[K]"
             "    theta[K]  q[kg/kg]   rh[-]   tke[m2/s2]\n")
    eta = np.asarray(atm.eta)
    u, v = np.asarray(met.u), np.asarray(met.v)
    t, th = np.asarray(met.t), np.asarray(met.theta)
    q, feu = np.asarray(met.xm1), np.asarray(met.feu)
    tke = np.asarray(met.tke)
    for k in range(min(nf + 1, len(eta))):
        fh.write(f"{k:4d} {eta[k]:10.2f} {u[k]:11.4f} {v[k]:11.4f} "
                 f"{t[k]:10.3f} {th[k]:11.3f} {q[k]:9.5f} {feu[k]:7.4f} "
                 f"{tke[k]:11.5f}\n")
    fh.write("\n")
    fh.flush()


def profr(fh, state, atm, nf: int):
    """Radiation profile block (profr, outp.f90:2153-2277)."""
    rad = state.rad
    tim = state.tim
    fh.write(f"# day {int(tim.lday)} {int(tim.lst):02d}:"
             f"{int(tim.lmin):02d}  u0={float(rad.u0):.4f}\n")
    fh.write("#  k     eta[m]   dtrad[K/h]\n")
    eta = np.asarray(atm.eta)
    dtrad = np.asarray(rad.dtrad)
    for k in range(min(nf + 1, len(eta))):
        fh.write(f"{k:4d} {eta[k]:10.2f} {dtrad[k] * 3600.0:12.5f}\n")
    fh.write("\n")
    fh.flush()


def profc(fh, state, atm, species, nf: int, names=("O3", "NO", "NO2",
                                                   "HNO3", "NH3", "SO2",
                                                   "DMS", "O1D", "OH",
                                                   "HCl", "HBr", "HI")):
    """Chemistry profile block for selected gases (profc,
    outp.f90:1919-2152; concentrations converted to molecules/cm3 by the
    caller's unit convention — here mol/m3 as stored)."""
    tim = state.tim
    n2i = {s: i for i, s in enumerate(species)}
    sel = [(nm, n2i[nm]) for nm in names if nm in n2i]
    if not sel:
        return
    fh.write(f"# day {int(tim.lday)} {int(tim.lst):02d}:"
             f"{int(tim.lmin):02d}  [mol/m3]\n")
    fh.write("#  k     eta[m] " + " ".join(f"{nm:>10s}" for nm, _ in sel)
             + "\n")
    eta = np.asarray(atm.eta)
    sgas = np.asarray(state.chem.sgas)
    for k in range(min(nf + 1, len(eta))):
        vals = " ".join(f"{sgas[i, k]:10.3e}" for _, i in sel)
        fh.write(f"{k:4d} {eta[k]:10.2f} {vals}\n")
    fh.write("\n")
    fh.flush()
