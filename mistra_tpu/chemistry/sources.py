"""Aerosol ion loading and sea-salt aerosol source.

Parity map: initial per-bin soluble ion composition ``sa1`` + its
application ``init_konc`` (kpp.f90:313-460, 1045-1151-ish); sea-salt
emission flux ``aer_source`` with the Monahan-86 / Smith-93
parameterisations (kpp.f90:3722-4069).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# sion1-index -> mechanism ion base name (reference ion numbering,
# kpp.f90:3676-3711; Na+ (20) is charge-balance bookkeeping only and has
# no reactions in the mechanism, so it is deliberately not loaded)
ION_NAMES = {1: "Hp", 2: "NH4p", 8: "SO42m", 9: "HCO3m", 13: "NO3m",
             14: "Clm", 19: "HSO4m", 24: "Brm", 34: "Im", 36: "IO3m"}


def ion_loading_table(cfg, grids, fcs, xmol3):
    """sa1: per dry-aerosol bin soluble ion content [mol/particle-ish,
    the reference's en*fcs/xmol3 units]; dict name -> [nka]."""
    rn = grids.micro.rn
    en = grids.micro.en
    nka = rn.shape[0]
    x0 = en * 1.0e-3 * np.asarray(fcs) / np.asarray(xmol3)
    xiod = 1.0 if (cfg.iod and cfg.halo) else 0.0

    names = list(ION_NAMES.values()) + ["DOM"]
    sa1 = {name: np.zeros(nka) for name in names}
    if cfg.iaertyp == 3:
        # sub-0.5um: ammonium sulfate mix; larger (or all, for the polar
        # Buys13 case): sea salt (kpp.f90:350-383)
        small = (rn < 0.5) & (not cfg.lp_buys13_0d)
        sa1["NH4p"][small] = x0[small] * 1.34
        sa1["SO42m"][small] = x0[small] * 0.34
        sa1["NO3m"][small] = x0[small] * 0.004
        sa1["HSO4m"][small] = x0[small] * 0.656
        large = ~small
        xso42m, xhco3m, xno3m, xbrm = 0.0485, 4.2e-3, 1.0e-7, 1.45e-3
        xim = 7.4e-8 / 0.545 * xiod
        xio3m = 2.64e-7 / 0.545 * xiod
        xclm = 1.0 - (xso42m + xhco3m + xno3m + xbrm + xim + xio3m)
        sa1["SO42m"][large] = xso42m * x0[large]
        sa1["HCO3m"][large] = xhco3m * x0[large]
        sa1["NO3m"][large] = xno3m * x0[large]
        sa1["Clm"][large] = xclm * x0[large]
        sa1["Brm"][large] = xbrm * x0[large]
        sa1["Im"][large] = xim * x0[large]
        sa1["IO3m"][large] = xio3m * x0[large]
        sa1["DOM"][large] = 0.27 * xbrm * x0[large]
        if cfg.lp_buxmann15alph:
            # chamber: pure NaCl/NaBr salt for rn >= 0.1 um
            for name in names:
                sa1[name][:] = 0.0
            big = rn >= 0.1
            xbrm = 4.76e-2
            sa1["Clm"][big] = (1.0 - xbrm) * x0[big]
            sa1["Brm"][big] = xbrm * x0[big]
    elif cfg.iaertyp == 1 and cfg.lp_joyce14bc:
        small = rn <= 0.5
        sa1["Hp"] = x0 * 0.1868 * 2.0
        sa1["SO42m"] = x0 * 0.1868
        sa1["Clm"] = np.where(small, x0 * 0.0227, 0.0)
        sa1["DOM"] = x0 * 0.6642
    return sa1


def apply_initial_ions(conc, sa1, ff, tot_n2i, ka, nkc, dtype):
    """init_konc: load sa1 x particle count into bins 1 (small) / 2
    (large) for all interior levels."""
    n = ff.shape[2]
    ap = jnp.sum(ff, axis=0)                     # [nka, n] particles/cm3
    lev = jnp.arange(n)
    interior = (lev >= 1) & (lev <= n - 2)
    for name, arr in sa1.items():
        for b, sel in ((1, slice(0, ka)), (2, slice(ka, None))):
            if b > nkc:
                continue
            sp = f"{name}l{b}"
            if sp not in tot_n2i:
                continue
            load = jnp.einsum("kn,k->n", ap[sel], jnp.asarray(arr[sel],
                                                              dtype)) * 1e6
            load = jnp.where(interior, load, 0.0)
            conc = conc.at[tot_n2i[sp]].add(load)
    return conc


# --------------------------------------------------------------------------
# sea-salt aerosol source (Monahan / Smith)
# --------------------------------------------------------------------------

def aer_source(model, state, dt, k_in=1, d_z=None):
    """Sea-salt particle + ion emission into the lowest interior layer.

    Vectorized over the large dry bins: each bin's equilibrium water class
    at the current surface RH receives the emitted particles; ions go to
    chemistry bin 2 (reference kpp.f90:3810-4069).
    """
    cfg = model.cfg
    drv = model._chemistry
    mg = model.grids.micro
    dtype = drv.dtype
    met, chem, micro = state.met, state.chem, state.micro
    grid = model.atm

    # u10: wind interpolated to 10 m (aer_source_init)
    eta = np.asarray(model.grids.atm.eta)
    k10m = int(np.searchsorted(eta, 10.0)) - 1
    k10p = k10m + 1
    w10p = (10.0 - eta[k10m]) / (eta[k10p] - eta[k10m])
    w10m = 1.0 - w10p
    u10 = w10m * jnp.sqrt(met.u[k10m] ** 2 + met.v[k10m] ** 2) \
        + w10p * jnp.sqrt(met.u[k10p] ** 2 + met.v[k10p] ** 2)

    rn = jnp.asarray(mg.rn, dtype)
    ew = jnp.asarray(mg.ew, dtype)
    rq = jnp.asarray(mg.rq, dtype)
    rw = jnp.asarray(mg.rw, dtype)
    ka = mg.ka
    nka = rn.shape[0]
    nkt = ew.shape[0]
    if d_z is None:
        d_z = grid.detw[1]

    from ..physics.microphysics import rgl, Z4PI3, ZRHO_FRAC
    a0m = model.consts["a0m"]
    b0m = jnp.asarray(model.consts["b0m"], dtype)

    feu2 = jnp.minimum(met.feu[k_in], 0.99999)
    a0 = a0m / met.t[k_in]
    b0 = b0m * ZRHO_FRAC
    rg = rgl(rn, a0, b0, feu2)                  # [nka] equilibrium radius
    eg = Z4PI3 * (rg ** 3 - rn ** 3)
    jt_eq = jnp.clip(jnp.searchsorted(ew, eg), 0, nkt - 1)   # target class

    # dry-ish radius at RH=0.8 sets the source-function radius rr [um]
    rr = rgl(rn, a0, b0, jnp.asarray(0.8, dtype))
    # jt_low: largest jt with rq <= rr
    below = rq <= rr[None, :]
    jt_low = jnp.maximum(jnp.sum(below, axis=0) - 1, 0)      # [nka]

    if cfg.lpsmith:
        a1 = 10.0 ** (0.0676 * u10 + 2.43)
        a2 = 10.0 ** (0.959 * jnp.sqrt(u10) - 1.476)
        df = a1 * jnp.exp(-3.1 * jnp.log(rr / 2.1) ** 2) \
            + a2 * jnp.exp(-3.3 * jnp.log(rr / 9.2) ** 2)
    else:  # Monahan et al. 1986
        bb = (0.380 - jnp.log10(rr)) / 0.65
        df = 1.373 * u10 ** 3.41 * rr ** (-3.0) \
            * (1.0 + 0.057 * rr ** 1.05) * 10.0 ** (1.19 * jnp.exp(-bb ** 2))

    # bin-width factor
    width_low = jnp.take_along_axis(
        rq, jnp.minimum(jt_low + 1, nkt - 1)[None, :], axis=0)[0] \
        - jnp.take_along_axis(rq, jt_low[None, :], axis=0)[0]
    width_gen = jnp.take_along_axis(rw, jt_low[None, :], axis=0)[0] \
        - jnp.take_along_axis(rw, jnp.maximum(jt_low - 1, 0)[None, :],
                              axis=0)[0]
    width = jnp.where(jt_low == 0, width_low, width_gen)
    df = df * width / d_z * 1.0e-6              # [1/cm3/s] per bin

    # only the large (sea-salt) bins emit
    ia_mask = jnp.arange(nka) >= ka
    df = jnp.where(ia_mask, df, 0.0)

    # add particles at their equilibrium water class, level 1
    onehot = jax.nn.one_hot(jt_eq, nkt, dtype=dtype).T       # [nkt, nka]
    ff = micro.ff.at[:, :, k_in].add(onehot * df[None, :] * dt)
    micro = micro.replace(ff=ff, fsum=jnp.sum(ff, axis=(0, 1)))

    # ions into chemistry bin 2
    conc = chem.conc
    sa1 = drv.sa1_table
    for name, arr in sa1.items():
        sp = f"{name}l2"
        if sp not in drv.tot_n2i:
            continue
        add = jnp.sum(df * dt * jnp.asarray(arr, dtype) * 1.0e6)
        conc = conc.at[drv.tot_n2i[sp], k_in].add(add)
    chem = chem.replace(conc=conc)
    return state.replace(micro=micro, chem=chem)
