"""Loaders for the radiative-transfer input tables.

Parses the reference model's data files (PIFM2 correlated-k coefficient
file and the Mie optics tables for urban/rural/ocean aerosol; see
``ipdata``/``intrad``, radinit.f90:126-695).  Everything here is host-side
numpy executed once at model construction; the parsed tables become device
constants.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

MB = 18    # spectral bands
MBS = 6    # solar bands
MBIR = 12  # IR bands
NCW = 8    # droplet optics classes

# number of cumulative probabilities (k-quadrature points) per band
KG = np.array([10, 8, 12, 7, 12, 5, 2, 3, 4, 4, 3, 5, 2, 10, 12, 7, 7, 8])

# Mie table coordinate grids (radinit.f90:263-272)
XA0 = np.array([0.0, 0.2, 0.4, 0.6, 0.7, 0.8, 0.85, 0.9, 0.95, 0.975, 1.0])
XW0 = np.array([0.01, 0.0125, 0.015, 0.02, 0.025, 0.03, 0.04, 0.05, 0.06,
                0.08, 0.1, 0.125, 0.15, 0.2, 0.25, 0.3, 0.4, 0.5, 0.6, 0.8,
                1.0, 1.25, 1.5, 2.0, 2.5, 3.0, 4.0, 5.0, 6.0, 8.0,
                10.0, 12.5, 15.0, 20.0, 25.0, 30.0, 40.0, 50.0, 60.0, 80.0])


@dataclass(frozen=True)
class Pifm2Tables:
    """Contents of pifm2_171115.dat (Fortran column-major fill order)."""
    ttab: np.ndarray      # [35]
    pibtab: np.ndarray    # [35, mbir]
    ret: np.ndarray       # [ncw] tabulated effective radii
    r2wt: np.ndarray      # [ncw]
    b2wt: np.ndarray      # [ncw, mb]
    w2wt: np.ndarray      # [ncw, mb]
    g2wt: np.ndarray      # [ncw, mb]
    feux: np.ndarray      # [8] reference relative humidities
    seanew: np.ndarray    # [8, mb, 4] aerosol extinction
    saanew: np.ndarray    # [8, mb, 4] aerosol absorption
    ganew: np.ndarray     # [8, mb, 4] aerosol asymmetry
    s0b: np.ndarray       # [mbs] solar energy per band
    hk: dict              # band (1-based) -> [kg] quadrature weights
    cgas: dict            # named coefficient tables per band
    o3un: np.ndarray      # [52] unreduced ozone amounts (Craig table)
    berayl: np.ndarray    # [mbs] Rayleigh coefficients

    @property
    def s0tot(self) -> float:
        return float(self.s0b.sum())


class _Reader:
    """Sequential reader mimicking Fortran list reads of '(8e16.8)' blocks
    separated by one comment line each."""

    def __init__(self, path: str):
        with open(path) as f:
            self.lines = f.read().splitlines()
        self.pos = 0

    def block(self, shape) -> np.ndarray:
        count = int(np.prod(shape))
        self.pos += 1  # skip the comment/separator line
        vals = []
        while len(vals) < count:
            line = self.lines[self.pos]
            self.pos += 1
            # fixed-width e16.8 fields
            for i in range(0, len(line.rstrip()), 16):
                vals.append(float(line[i:i + 16]))
        arr = np.array(vals[:count])
        # Fortran column-major fill
        return arr.reshape(tuple(reversed(shape))).T if len(shape) > 1 \
            else arr


def load_pifm2(inpdir: str, fname: str = "pifm2_171115.dat") -> Pifm2Tables:
    r = _Reader(os.path.join(inpdir, fname))
    ttab = r.block((35,))
    pibtab = r.block((35, MBIR))
    ret = r.block((NCW,))
    r2wt = r.block((NCW,))
    b2wt = r.block((NCW, MB))
    w2wt = r.block((NCW, MB))
    g2wt = r.block((NCW, MB))
    feux = r.block((8,))
    seanew = r.block((8, MB, 4))
    saanew = r.block((8, MB, 4))
    ganew = r.block((8, MB, 4))
    s0b = r.block((MBS,))

    hk = {}
    cgas = {}
    hk[1] = r.block((10,))
    cgas["fk1o3"] = r.block((10,))
    for ib, ncoef, npres in [(2, 8, 11), (3, 12, 11), (4, 7, 11),
                             (5, 12, 11), (6, 5, 11)]:
        hk[ib] = r.block((ncoef,))
        cgas[f"c{ib}h2o"] = r.block((3, npres, ncoef))
    for ib, ncoef in [(7, 2), (8, 3), (9, 4)]:
        hk[ib] = r.block((ncoef,))
        cgas[f"c{ib}h2o"] = r.block((3, 19, ncoef))
    hk[10] = r.block((4,))
    cgas["c10h2o"] = r.block((3, 19, 4))
    cgas["c10ch4"] = r.block((3, 19))
    cgas["c10n2o"] = r.block((3, 19))
    hk[11] = r.block((3,))
    cgas["c11h2o"] = r.block((3, 19, 3))
    cgas["c11ch4"] = r.block((3, 19))
    cgas["c11n2o"] = r.block((3, 19))
    hk[12] = r.block((5,))
    cgas["c12o3"] = r.block((3, 19, 5))
    cgas["c12h2o"] = r.block((3, 19))
    hk[13] = r.block((2,))
    cgas["c13h2o"] = r.block((3, 19, 2))
    hk[14] = r.block((10,))
    cgas["c14hca"] = r.block((3, 19, 10))
    cgas["c14hcb"] = r.block((3, 19, 10))
    hk[15] = r.block((12,))
    cgas["c15hca"] = r.block((3, 19, 12))
    cgas["c15hcb"] = r.block((3, 19, 12))
    for ib, ncoef in [(16, 7), (17, 7), (18, 8)]:
        hk[ib] = r.block((ncoef,))
        cgas[f"c{ib}h2o"] = r.block((3, 19, ncoef))
    o3un = r.block((52,))
    berayl = r.block((MBS,))

    return Pifm2Tables(ttab=ttab, pibtab=pibtab, ret=ret, r2wt=r2wt,
                       b2wt=b2wt, w2wt=w2wt, g2wt=g2wt, feux=feux,
                       seanew=seanew, saanew=saanew, ganew=ganew, s0b=s0b,
                       hk=hk, cgas=cgas, o3un=o3un, berayl=berayl)


# --------------------------------------------------------------------------
# Mie tables -> per-bin optics (intrad)
# --------------------------------------------------------------------------

def load_mie_tables(inpdir: str) -> np.ndarray:
    """Read the six urban/rural/ocean kw/lw files.

    Returns qabs0/qext0/asym0 stacked: [3 types, mb, nw0, na0, 3 quantities].
    """
    na0, nw0 = len(XA0), len(XW0)
    out = np.zeros((3, MB, nw0, na0, 3))
    names = [("urbankw.dat", "urbanlw.dat"), ("ruralkw.dat", "rurallw.dat"),
             ("ozeankw.dat", "ozeanlw.dat")]
    for ityp, (fkw, flw) in enumerate(names):
        for fname, b0, b1 in [(fkw, 0, MBS), (flw, MBS, MB)]:
            nb = b1 - b0
            # one record per (ja0, jw0, jb); the record holds 5 values but
            # the reference reads only the first 3 (qabs, qext, asym)
            rows = []
            with open(os.path.join(inpdir, fname)) as f:
                for line in f:
                    toks = line.split()
                    if len(toks) >= 3:
                        rows.append([float(toks[0]), float(toks[1]),
                                     float(toks[2])])
            vals = np.array(rows).reshape(na0, nw0, nb, 3)
            out[ityp, b0:b1] = np.transpose(vals, (2, 1, 0, 3))
    return out


def interpolate_particle_optics(mie: np.ndarray, rn: np.ndarray,
                                rq: np.ndarray):
    """Bilinear interpolation of the Mie tables onto the 2-D particle grid
    (reference ``intrad``).

    Args: mie [3, mb, nw0, na0, 3]; rn [nka] dry radii; rq [nkt, nka] total
    radii (um).  Returns (qabs, qext, asym), each [mb, nkt, nka, 3]
    (trailing axis = aerosol type: urban/rural/ocean).
    """
    nkt, nka = rq.shape
    xw1 = rq                                       # [nkt, nka]
    xa1 = 1.0 - (rn[None, :] / rq) ** 3

    iw = np.searchsorted(XW0, xw1)                 # first idx with xw0 >= xw1
    iw = np.clip(iw, 1, len(XW0) - 1)
    below = xw1 < XW0[0]
    above = xw1 > XW0[-1]
    dx = (xw1 - XW0[iw - 1]) / (XW0[iw] - XW0[iw - 1])
    dx = np.where(below, 0.0, np.where(above, 1.0, dx))
    iw = np.where(below, 1, np.where(above, len(XW0) - 1, iw))

    xa1 = np.clip(xa1, 0.0, 1.0)
    ia = np.clip(np.searchsorted(XA0, xa1), 1, len(XA0) - 1)
    dy = (xa1 - XA0[ia - 1]) / (XA0[ia] - XA0[ia - 1])

    w11 = (dx * dy)[None, :, :, None]
    w10 = (dx * (1 - dy))[None, :, :, None]
    w01 = ((1 - dx) * dy)[None, :, :, None]
    w00 = ((1 - dx) * (1 - dy))[None, :, :, None]

    def interp(q):  # q: [3 types, mb, nw0, na0]
        qt = np.transpose(q, (1, 0, 2, 3))  # [mb, 3, nw0, na0]
        v = (w11 * qt[:, :, iw, ia].transpose(0, 2, 3, 1)
             + w10 * qt[:, :, iw, ia - 1].transpose(0, 2, 3, 1)
             + w01 * qt[:, :, iw - 1, ia].transpose(0, 2, 3, 1)
             + w00 * qt[:, :, iw - 1, ia - 1].transpose(0, 2, 3, 1))
        return v  # [mb, nkt, nka, 3]

    qabs = interp(mie[..., 0])
    qext = interp(mie[..., 1])
    asym = interp(mie[..., 2])
    return qabs, qext, asym
