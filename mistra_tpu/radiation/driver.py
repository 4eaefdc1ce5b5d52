"""Radiation driver: grid extension, per-step profile loading, band/pair
orchestration, and coupling back to the column state.

Parity with ``radiation``/``initr``/``load1``/``rotate_in``/``rotate_out``
(radinit.f90) and the ``nstrahl`` band x quadrature loop (nrad.f90:55-484).
The driver keeps bottom-up model indexing and flips to the solver's
top-down convention at the interface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import G, R0
from . import solver as S
from . import tables as T


def _p21_np(t):
    return 610.7 * np.exp(17.15 * (t - 273.15) / (t - 38.33))


class RadiationDriver:
    def __init__(self, model):
        cfg = model.cfg
        gp = cfg.grid
        self.model = model
        self.gp = gp
        self.dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32

        self.tb = T.load_pifm2(cfg.inpdir)
        self.pt = S.PairTables(self.tb)
        mie = T.load_mie_tables(cfg.inpdir)
        rn = model.grids.micro.rn
        rq = model.grids.micro.rq
        qabs, qext, asym = T.interpolate_particle_optics(mie, rn, rq)
        model.consts["qabs"] = qabs  # used by the droplet-growth solver

        # per-bin aerosol-type selection for the optics sums (load1 rule:
        # small dry bins of ocean type use the rural table)
        nar1 = int(model.consts.get("nar", [cfg.iaertyp] * gp.n)[1]) \
            if model.consts.get("nar") is not None else cfg.iaertyp
        ka0 = min(nar1, 3)  # background handled as rural upstream
        type_of_bin = np.full(rn.shape[0], ka0 - 1)
        if ka0 == 3:
            type_of_bin[rn < 0.5] = 1  # rural
        sel = np.arange(3)[None, None, None, :] == \
            type_of_bin[None, None, :, None]
        self.qabs_sel = (qabs * sel).sum(-1)   # [mb, nkt, nka]
        self.qext_sel = (qext * sel).sum(-1)
        self.asym_sel = (asym * sel).sum(-1)

        # albedo / emissivity
        self.albedo = np.full(T.MBS, 0.8 if cfg.jp_albedo_opt == 1 else 0.05)
        self.emis = np.ones(T.MBIR)

        self._static_built = False

    # ------------------------------------------------------------------
    def build_static(self, state):
        """Radiation grid + standard-atmosphere extension (initr).

        Host-side numpy, executed once at initialisation with the initial
        profiles; the extension layers then stay constant for the run.
        """
        gp = self.gp
        n, nrlay, nrlev = gp.n, gp.nrlay, gp.nrlev
        atm = self.model.grids.atm
        etw = atm.etw

        # level heights (bottom-up): model walls then 7 layers to 11 km,
        # then 20/30/40/50/100 km
        zx = np.zeros(nrlev)
        zx[:n - 1] = etw[1:n]
        dz = (11000.0 - zx[n - 2]) / 7.0
        for k in range(n - 1, n + 6):
            zx[k] = zx[k - 1] + dz
        zx[n + 6] = 20000.0
        zx[n + 7] = 30000.0
        zx[n + 8] = 40000.0
        zx[n + 9] = 50000.0
        zx[n + 10] = 100000.0
        thk = np.diff(zx)

        # dynamic lower profile at init (load1 interpolation)
        t = np.asarray(state.met.t, np.float64)
        p = np.asarray(state.met.p, np.float64)
        xm1 = np.asarray(state.met.xm1, np.float64)
        detw, deta = np.asarray(atm.detw), np.asarray(atm.deta)
        tx = np.zeros(nrlev)
        px = np.zeros(nrlev)
        xm1x = np.zeros(nrlev)
        tx[0], px[0], xm1x[0] = t[1], p[0], xm1[1]
        x0 = 0.5 * detw[1:n - 1] / deta[1:n - 1]
        tx[1:n - 1] = t[1:n - 1] + (t[2:n] - t[1:n - 1]) * x0
        px[1:n - 1] = p[1:n - 1] + (p[2:n] - p[1:n - 1]) * x0
        xm1x[1:n - 1] = xm1[1:n - 1] + (xm1[2:n] - xm1[1:n - 1]) * x0

        # standard atmosphere above the model top (initr:904-975)
        rnaer = np.zeros(nrlev)
        for k in range(n - 1, n + 6):
            gam, rf = 0.0065, 0.3
            tx[k] = tx[k - 1] - gam * thk[k - 1]
            px[k] = px[k - 1] * (tx[k] / tx[k - 1]) ** (G / (R0 * gam))
            xm1x[k] = 0.62198 * rf / (px[k] / _p21_np(tx[k]) - 0.37802 * rf)
            rnaer[k] = 100.0
        k = n + 6
        tx[k] = tx[k - 1]
        px[k] = px[k - 1] * np.exp(-G * (zx[k] - zx[k - 1]) / (R0 * tx[k]))
        xm1x[k] = 0.62198 * 0.02 / (px[k] / _p21_np(tx[k]) - 0.37802 * 0.02)
        for k, (gam, rf) in zip(range(n + 7, n + 10),
                                [(-0.001, 0.005), (-0.0026, 5e-5),
                                 (-0.0018, 2e-6)]):
            tx[k] = tx[k - 1] - gam * thk[k - 1]
            px[k] = px[k - 1] * (tx[k] / tx[k - 1]) ** (G / (R0 * gam))
            xm1x[k] = 0.62198 * rf / (px[k] / _p21_np(tx[k]) - 0.37802 * rf)
        tx[nrlev - 1] = 210.0
        px[nrlev - 1] = 0.0
        xm1x[nrlev - 1] = 0.0

        # ozone path (initr:995-1021): interpolate the Craig table
        o3un = self.tb.o3un
        eta_o3 = np.zeros(nrlev)
        for jz in range(nrlev):
            i_inf = min(int(zx[jz] // 1000.0) + 1, 51)
            if i_inf < 51:
                zlo = (i_inf - 1) * 1000.0
                dz3 = (zx[jz] - zlo) / 1000.0
                eta_o3[jz] = o3un[i_inf - 1] \
                    + (o3un[i_inf] - o3un[i_inf - 1]) * dz3
        qmo3 = np.zeros(nrlev)
        dp_lay = px[:-1] - px[1:]
        u_o3 = (eta_o3[:-1] - eta_o3[1:]) * 0.01
        with np.errstate(divide="ignore", invalid="ignore"):
            q = u_o3 / (2.3808 * (px[:nrlay] - px[1:nrlay + 1]))
        qmo3[:nrlay] = np.where(np.isfinite(q), q, 0.0)
        qmo3[nrlev - 1] = 0.0

        # background aerosol optics above the model domain (initr:1024-1056)
        bea_up = np.zeros((T.MB, nrlay))
        baa_up = np.zeros((T.MB, nrlay))
        ga_up = np.zeros((T.MB, nrlay))
        feux = self.tb.feux
        for jz in range(n - 1, nrlay):
            if rnaer[jz] > 0.0:
                rf = xm1x[jz] * px[jz] / (_p21_np(tx[jz])
                                          * (0.62198 + 0.37802 * xm1x[jz]))
                ih = min(np.searchsorted(feux, rf, side="right"), 7)
                ih = max(ih, 1)
                drh = (rf - feux[ih - 1]) / (feux[ih] - feux[ih - 1])
                xn = rnaer[jz] * 1.0e6
                # type 4 = background/tropospheric (0-based 3)
                bea_up[:, jz] = xn * ((1 - drh) * self.tb.seanew[ih - 1, :, 3]
                                      + drh * self.tb.seanew[ih, :, 3])
                baa_up[:, jz] = xn * ((1 - drh) * self.tb.saanew[ih - 1, :, 3]
                                      + drh * self.tb.saanew[ih, :, 3])
                ga_up[:, jz] = ((1 - drh) * self.tb.ganew[ih - 1, :, 3]
                                + drh * self.tb.ganew[ih, :, 3])

        self.zx = zx
        self.thk = thk
        self.qmo3 = qmo3
        self.t_up = tx[n - 1:]
        self.p_up = px[n - 1:]
        self.xm1_up = xm1x[n - 1:]
        self.bea_up = bea_up
        self.baa_up = baa_up
        self.ga_up = ga_up
        self._static_built = True

    # ------------------------------------------------------------------
    def load_profile(self, state):
        """Per-call lower-atmosphere profile + particle optics (load1)."""
        gp = self.gp
        n, nrlay, nrlev = gp.n, gp.nrlay, gp.nrlev
        dt = self.dtype
        atm = self.model.atm
        met = state.met

        detw, deta = atm.detw, atm.deta
        x0 = 0.5 * detw[1:n - 1] / deta[1:n - 1]
        tx_low = jnp.concatenate([
            met.t[1:2], met.t[1:n - 1] + (met.t[2:n] - met.t[1:n - 1]) * x0])
        px_low = jnp.concatenate([
            met.p[0:1], met.p[1:n - 1] + (met.p[2:n] - met.p[1:n - 1]) * x0])
        xm1_low = jnp.concatenate([
            met.xm1[1:2],
            met.xm1[1:n - 1] + (met.xm1[2:n] - met.xm1[1:n - 1]) * x0])

        tx = jnp.concatenate([tx_low, jnp.asarray(self.t_up, dt)])
        px = jnp.concatenate([px_low, jnp.asarray(self.p_up, dt)])
        xm1x = jnp.concatenate([xm1_low, jnp.asarray(self.xm1_up, dt)])
        rhox = px / (R0 * jnp.maximum(tx, 1.0) * (1.0 + 0.608 * xm1x))
        rhox = rhox.at[nrlev - 1].set(0.0)
        ts = met.t[0]

        # particle optics for model layers (levels 1..n-1 feed layers 0..n-2)
        bea = jnp.asarray(self.bea_up, dt)
        baa = jnp.asarray(self.baa_up, dt)
        ga = jnp.asarray(self.ga_up, dt)
        if self.model.cfg.mic:
            rq = jnp.asarray(self.model.grids.micro.rq, dt)
            ff = state.micro.ff[:, :, 1:n]            # [nkt, nka, n-1]
            x0p = jnp.pi * 1.0e-6 * rq[:, :, None] ** 2 * ff
            qa = jnp.asarray(self.qabs_sel, dt)
            qe = jnp.asarray(self.qext_sel, dt)
            asy = jnp.asarray(self.asym_sel, dt)
            baa_low = jnp.einsum("btk,tkz->bz", qa, x0p)
            bea_low = jnp.einsum("btk,tkz->bz", qe, x0p)
            ga_num = jnp.einsum("btk,tkz->bz", asy * (qe - qa), x0p)
            sca = bea_low - baa_low
            ga_low = jnp.where(sca > 0.0, ga_num / jnp.maximum(sca, 1e-300),
                               0.0)
            bea = bea.at[:, :n - 1].set(bea_low)
            baa = baa.at[:, :n - 1].set(baa_low)
            ga = ga.at[:, :n - 1].set(ga_low)

        return tx, px, rhox, xm1x, ts, bea, baa, ga

    # ------------------------------------------------------------------
    def __call__(self, state, init=False):
        if not self._static_built:
            self.build_static(state)
        gp = self.gp
        n, nrlay, nrlev = gp.n, gp.nrlay, gp.nrlev
        dt = self.dtype

        tx, px, rhox, xm1x, ts, bea, baa, ga = self.load_profile(state)

        # flip to top-down
        t_td = tx[::-1]
        p_td = px[::-1]
        rho_td = rhox[::-1]
        xm1_td = xm1x[::-1]
        qmo3_td = jnp.asarray(self.qmo3[::-1].copy(), dt)
        thk_td = jnp.asarray(self.thk[::-1].copy(), dt)
        bea_td = bea[:, ::-1]
        baa_td = baa[:, ::-1]
        ga_td = ga[:, ::-1]
        zeros_lay = jnp.zeros((nrlay,), dt)

        hr_td, totrad_td, fnseb, flgeg = nstrahl(
            self.pt, self.tb, t_td, p_td, rho_td, xm1_td, ts, qmo3_td,
            bea_td, baa_td, ga_td, zeros_lay, zeros_lay, zeros_lay,
            thk_td, state.rad.u0, jnp.asarray(self.albedo, dt),
            jnp.asarray(self.emis, dt),
            jnp.asarray(self.tb.berayl, dt), dt)

        # rotate back: dtrad[j] = hr_td[nrlay - j] for j = 1..n-1
        j = np.arange(1, n)
        dtrad = jnp.concatenate([
            jnp.zeros((1,), dt), hr_td[nrlay - j]])
        totrad_bu = jnp.concatenate([
            jnp.zeros((T.MB, 1), dt), totrad_td[:, nrlay - j]], axis=1)

        rad = state.rad.replace(dtrad=dtrad, totrad=totrad_bu,
                                sk=fnseb, sl=flgeg)
        return state.replace(rad=rad)


# --------------------------------------------------------------------------


def nstrahl(pt, tb, t, p, rho, xm1, ts, qmo3, bea, baa, ga, frac, rew,
            rho2w, thk, u0, albedo, emis, berayl, dtype):
    """Full 18-band, 121-pair radiative transfer solve (top-down arrays).

    Returns (hr [nrlay], totrad [mb, nrlay], fnseb, flgeg).
    """
    nrlev = t.shape[0]
    nrlay = nrlev - 1
    P = pt.npairs
    band_idx = jnp.asarray(pt.band_of_pair)
    n_solar = int(pt.solar_pair.sum())
    day = u0 > S.U0MIN

    bb, cc = S.frr(frac)

    # --- per-band optical building blocks ---------------------------------
    # Rayleigh
    zdopr = 2.0 * rho[nrlev - 1]
    dtaur_s = berayl[:, None] * thk[None, :] \
        * (rho[:-1] + rho[1:])[None, :] / zdopr            # [mbs, L]
    dtaur = jnp.concatenate(
        [dtaur_s, jnp.zeros((T.MB - T.MBS, nrlay), dtype)])  # [mb, L]

    # aerosol
    taer = bea * thk[None, :]
    waer = jnp.where(bea > 1.0e-20, 1.0 - baa / jnp.maximum(bea, 1e-300),
                     0.0)
    zbsca = bea - baa
    # solar bands fold Rayleigh into the asymmetry normalisation
    is_solar_band = jnp.arange(T.MB)[:, None] < T.MBS
    denom = zbsca + jnp.where(is_solar_band, dtaur / thk[None, :], 0.0)
    zgaer = jnp.where(denom >= 1.0e-20,
                      ga * zbsca / jnp.maximum(denom, 1e-300), 0.0)
    geff = jnp.where(is_solar_band, zgaer, ga)
    plaer = jnp.stack([3.0 * geff, 5.0 * geff ** 2], axis=1)  # [mb, 2, L]
    plaer = jnp.where(is_solar_band[:, None, :] & (denom < 1e-20)[:, None, :],
                      0.0, plaer)

    # droplet optics
    t2w, w2w, pl2w = S.water_optics(tb, frac, rew, rho2w, thk, dtype)

    # water vapour continuum (bands 11-17, 1-based)
    vv = jnp.asarray([1175.0, 1040.0, 890.0, 735.0, 605.0, 470.0, 340.0],
                     dtype)
    tgcon_bands = jax.vmap(lambda v: S.qopcon(v, t, p, xm1))(vv)  # [7, L]
    tgcon = jnp.zeros((T.MB, nrlay), dtype)
    tgcon = tgcon.at[10:17].set(tgcon_bands)

    # Planck function for IR bands
    wvl = jnp.asarray(S.WVL, dtype)
    pib = jnp.stack([jnp.pi * S.plkavg(wvl[b + 1], wvl[b], t)
                     for b in range(T.MBIR)])               # [mbir, L+1]
    pibs_b = jnp.stack([jnp.pi * S.plkavg(wvl[b + 1], wvl[b], ts)
                        for b in range(T.MBIR)])            # [mbir]

    # gas absorption for all pairs
    tg, hk = S.gas_tau(pt, p, t, xm1, qmo3, dtype)          # [P, L], [P]

    # --- gather per-pair optics and combine -------------------------------
    dtau, om, pl = S.total_tau(
        dtaur[band_idx], taer[band_idx], waer[band_idx], plaer[band_idx],
        tgcon[band_idx], tg, t2w[band_idx], w2w[band_idx], pl2w[band_idx])

    # --- solar pairs ------------------------------------------------------
    sl = slice(0, n_solar)
    alb_pair = albedo[band_idx[sl]]
    a1, a2, a3, a4s, a5s, a6 = S.kurzw_coefficients(
        dtau[sl], om[sl], pl[sl], u0)
    sf, sw, ssf, ssw, f1f, f1w, f2f, f2w = S.kurzw_propagate(
        a1, a2, a3, a6, bb, cc, u0, alb_pair)
    f1f, f1w, f2f, f2w = S.jeanfr(a4s, a5s, bb, cc, f1f, f1w, f2f, f2w,
                                  alb_pair)
    hk_s = hk[sl]
    wgt = jnp.where(day, 1.0, 0.0) * hk_s
    ss = jnp.einsum("p,pl->l", wgt, sf + sw)
    sss = jnp.einsum("p,pl->l", wgt, ssf + ssw)
    fs1 = jnp.einsum("p,pl->l", wgt, f1f + f1w)
    fs2 = jnp.einsum("p,pl->l", wgt, f2f + f2w)
    # per-band sums for totrad
    seg_s = jax.nn.one_hot(band_idx[sl], T.MBS, dtype=dtype)  # [Ps, mbs]
    dlam2 = jnp.einsum("pb,p,pl->bl", seg_s, wgt, ssf + ssw)
    dlam3 = jnp.einsum("pb,p,pl->bl", seg_s, wgt, f1f + f1w)
    dlam4 = jnp.einsum("pb,p,pl->bl", seg_s, wgt, f2f + f2w)

    # --- IR pairs ---------------------------------------------------------
    ir = slice(n_solar, P)
    ir_band0 = band_idx[ir] - T.MBS                        # 0..11
    emis_pair = emis[ir_band0]
    pib_pair = pib[ir_band0]                               # [Pi, L+1]
    pibs_pair = pibs_b[ir_band0]
    a4i, a5i, a6i = S.langw_coefficients(dtau[ir], om[ir], pl[ir])
    f1f_i, f1w_i, f2f_i, f2w_i = S.langw_rhs(
        a4i, a5i, a6i, pib_pair, pibs_pair, frac, emis_pair, bb)
    f1f_i, f1w_i, f2f_i, f2w_i = S.jeanfr(
        a4i, a5i, bb, cc, f1f_i, f1w_i, f2f_i, f2w_i, 1.0 - emis_pair)
    hk_i = hk[ir]
    up_ir = pib_pair - f1f_i - f1w_i
    dn_ir = pib_pair - f2f_i - f2w_i
    fl1 = jnp.einsum("p,pl->l", hk_i, up_ir)
    fl2 = jnp.einsum("p,pl->l", hk_i, dn_ir)
    seg_i = jax.nn.one_hot(ir_band0, T.MBIR, dtype=dtype)
    dlam5 = jnp.einsum("pb,p,pl->bl", seg_i, hk_i, up_ir)
    dlam6 = jnp.einsum("pb,p,pl->bl", seg_i, hk_i, dn_ir)
    dlam7 = jnp.einsum("pb,p,pl->bl", seg_i, hk_i, pib_pair)

    # --- corrections (nstrahl:417-444) ------------------------------------
    s0 = 1355.3
    zfuq1 = s0 / tb.s0tot
    zfuq2 = pibs_b[T.MBIR - 1] * 0.03 * emis[T.MBIR - 1]
    ss = ss * zfuq1
    sss = sss * zfuq1
    fs1 = fs1 * zfuq1
    fs2 = fs2 * zfuq1
    dlam2 = dlam2 * zfuq1
    dlam3 = dlam3 * zfuq1
    dlam4 = dlam4 * zfuq1

    totds = jnp.where(day, sss + fs2, 0.0)
    fs2 = jnp.where(day, totds - ss, 0.0)
    fl1 = fl1 + zfuq2
    dlam5 = dlam5.at[T.MBIR - 1].add(zfuq2)

    flgeg = fl2[nrlev - 1]
    fnseb = fs2[nrlev - 1] + ss[nrlev - 1] - fs1[nrlev - 1]

    # heating rates
    zfn = fl1 - fl2 + fs1 - ss - fs2                       # [L+1]
    zx0 = thk * (rho[:-1] + rho[1:]) * 502.5
    hr = (zfn[1:] - zfn[:-1]) / zx0

    # totrad for the droplet-growth radiative term (nstrahl:464-482)
    u0_safe = jnp.maximum(u0, 1.0e-4)
    tot_s = (dlam2[:, :-1] + dlam2[:, 1:]) / (2.0 * u0_safe) \
        + dlam3[:, :-1] + dlam3[:, 1:] + dlam4[:, :-1] + dlam4[:, 1:]
    tot_s = jnp.where(day, tot_s, 0.0)
    tot_i = -(dlam7[:, :-1] + dlam7[:, 1:]) * 2.0 \
        + dlam6[:, :-1] + dlam6[:, 1:] + dlam5[:, :-1] + dlam5[:, 1:]
    totrad = jnp.concatenate([tot_s, tot_i], axis=0)       # [mb, L]
    return hr, totrad, fnseb, flgeg
