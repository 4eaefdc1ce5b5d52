"""Chemistry diagnostics: family mass closure and per-reaction budgets.

Parity map: ``mass_ch`` (kpp.f90:5900-6181) column totals of the Cl / Br /
I / S element families across gas and aqueous phases, used as an in-run
conservation assertion; the ``bud_*`` files (C33) record per-reaction
instantaneous and cumulative rates.  With mechanism-as-data both are
generic: element counts come from parsing species names, reaction rates
from the packed rate vector.
"""

from __future__ import annotations

import re

import jax.numpy as jnp
import numpy as np


def base_name(name: str, binned: bool) -> str:
    """Chemical formula of an aqueous species with the bin suffix and the
    trailing charge marker (m = anion, p = cation: Clm, SO42m, NH4p)
    removed.  Gas-phase names pass through untouched — gas "Cl2" must
    keep its l2, it is molecular chlorine, not a bin suffix."""
    if not binned:
        return name
    base = re.sub(r"l[1-4]$", "", name)
    return re.sub(r"[mp]$", "", base) if len(base) > 1 else base


def element_counts(species: list, element: str,
                   species_bin=None) -> np.ndarray:
    """Number of atoms of ``element`` in each species, parsed from the
    conventional species names (Cl2 -> 2, BrCl -> 1, Clml3 -> 1...).

    species_bin: [nvar] aqueous-bin array (0 = gas phase); required to
    strip the l1..l4 suffix of binned species.  None = all gas-phase.
    """
    counts = np.zeros(len(species))
    pat = re.compile(rf"{element}(?![a-z])([0-9]*)")
    for i, name in enumerate(species):
        binned = species_bin is not None and species_bin[i] > 0
        for m in pat.finditer(base_name(name, binned)):
            counts[i] += int(m.group(1)) if m.group(1) else 1
    return counts


def family_column_totals(sgas, species, detw, elements=("Cl", "Br", "I",
                                                        "S", "N"),
                         species_bin=None):
    """Column-integrated element totals [mol/m2] per family (mass_ch,
    kpp.f90:5900-6181: gas + aqueous contributions enter through the
    combined species vector).

    sgas: [nvar, n] concentrations [mol/m3]; detw: [n] layer thicknesses.
    """
    out = {}
    for el in elements:
        cnt = jnp.asarray(element_counts(species, el, species_bin),
                          sgas.dtype)
        out[el] = jnp.einsum("sn,s,n->", sgas, cnt, detw)
    return out


def species_production_loss(rates, stoich, species_idx):
    """Per-species production / loss rates from per-reaction rates
    (the S/DMS budget machinery bud_s_{g,a,t}.f generalized: every
    reaction producing or consuming the species is a budget channel).

    rates: [..., nrxn]; stoich: [nrxn, nvar] net stoichiometry.
    Returns (production [...,], loss [...]) with loss >= 0.
    """
    col = jnp.asarray(stoich[:, species_idx], rates.dtype)
    prod = rates @ jnp.maximum(col, 0.0)
    loss = rates @ jnp.maximum(-col, 0.0)
    return prod, loss


def species_budget_channels(rates, stoich, species_idx, labels=None,
                            top: int = 20):
    """The ``top`` reactions by |contribution| to a species tendency —
    the per-channel view the reference prints for the S family.

    rates: [nrxn] (single cell); returns list of (reaction_index,
    signed_rate) sorted by magnitude."""
    col = np.asarray(stoich[:, species_idx])
    contrib = np.asarray(rates) * col
    order = np.argsort(-np.abs(contrib))[:top]
    out = []
    for j in order:
        if contrib[j] == 0.0:
            break
        lab = labels[j] if labels is not None else int(j)
        out.append((lab, float(contrib[j])))
    return out


class BudgetAccumulator:
    """Per-reaction rate budgets at selected levels (reference bud_gas:
    bg(1,:,:) instantaneous, bg(2,:,:) cumulative; bud_g.f:18-403)."""

    def __init__(self, nrxn: int, levels):
        self.levels = np.asarray(levels)
        self.inst = np.zeros((nrxn, len(levels)))
        self.cum = np.zeros((nrxn, len(levels)))

    def update(self, rates_by_level, dt):
        """rates_by_level: [nlev_selected, nrxn] reaction rates [mol/m3/s]."""
        r = np.asarray(rates_by_level).T
        self.inst = r
        self.cum = self.cum + r * dt


# charge of an ion species from its name: trailing 'm'/'p' repeated or
# with digit (SO42m => -2, Hp => +1, Cl2m => -1? no: Cl2m is Cl2^-)
_CHARGE_RE = re.compile(r"([mp])$")


def ion_charge(name: str, binned: bool = True) -> int:
    """Signed charge parsed from the species naming convention
    (...m = anion, ...p = cation; SO42m/SO32m/CO32m carry charge -2)."""
    if not binned:
        return 0
    base = re.sub(r"l[1-4]$", "", name)
    if base.endswith("m"):
        return -2 if base in ("SO42m", "SO32m", "CO32m") else -1
    if base.endswith("p"):
        return 1
    return 0


def ion_balance(conc, species, species_bin, nkc):
    """Net charge [mol/m3] per chemistry bin (ion_mass, str.f90:6503-
    6612); exact electro-neutrality is not expected because Na+ is
    implicit, but drift in time indicates a bug."""
    out = []
    z = np.array([ion_charge(s, species_bin[i] > 0)
                  for i, s in enumerate(species)])
    for kc in range(1, nkc + 1):
        sel = (species_bin == kc) & (z != 0)
        idx = np.nonzero(sel)[0]
        if idx.size == 0:
            out.append(jnp.zeros(conc.shape[1], conc.dtype))
            continue
        zz = jnp.asarray(z[idx], conc.dtype)
        out.append(jnp.einsum("sn,s->n", conc[jnp.asarray(idx)], zz))
    return jnp.stack(out)


def total_aqueous_mass(conc, species, species_bin, molar_mass):
    """Total dissolved mass [g/m3] per bin (out_mass, str.f90:7114-7228).

    molar_mass: dict name -> kg/mol (falls back to 0 for unknown)."""
    nkc = int(species_bin.max()) if species_bin.size else 0
    out = []
    for kc in range(1, nkc + 1):
        idx = np.nonzero(species_bin == kc)[0]
        mm = jnp.asarray([molar_mass.get(re.sub(r"l[1-4]$", "",
                                                species[i]), 0.0) * 1e3
                          for i in idx], conc.dtype)  # binned names only
        out.append(jnp.einsum("sn,s->n", conc[jnp.asarray(idx)], mm))
    return jnp.stack(out) if out else jnp.zeros((0, conc.shape[1]))


def sulfur_reaction_channels(mech):
    """Budget channels of the S/DMS family: every reaction that moves a
    sulfur atom (the reference's fixed 122-channel layout bud_s_{g,a,t}.f
    generalized to mechanism-as-data: each S-touching reaction is one
    channel, at all levels).

    Returns (idx [nch] reaction indices, labels [nch]).
    """
    sb = getattr(mech, "species_bin", None)
    s_cnt = element_counts(mech.species, "S", sb)
    has_s = np.zeros(mech.nrxn, bool)
    st = np.asarray(mech.stoich)
    has_s |= (np.abs(st) @ (s_cnt > 0)) > 0
    idx = np.nonzero(has_s)[0]
    labels = [mech.reactions[i].label for i in idx]
    return idx, labels
