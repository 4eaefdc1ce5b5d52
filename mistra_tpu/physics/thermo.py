"""Thermodynamic helper functions.

Formulas match the reference's statement functions (e.g. ``p21``,
str.f90:7672-7693) so parity tests against the Fortran model hold.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import EPS_RATIO, ONE_MINUS_EPS


def p21(t):
    """Saturation water vapour pressure [Pa] (Magnus form over water)."""
    return 610.7 * jnp.exp(17.15 * (t - 273.15) / (t - 38.33))


def qsat(t, p):
    """Saturation specific humidity [kg/kg]."""
    es = p21(t)
    return EPS_RATIO * es / (p - ONE_MINUS_EPS * es)


def rel_humidity(xm1, t, p):
    """Relative humidity from specific humidity."""
    return xm1 * p / ((EPS_RATIO + ONE_MINUS_EPS * xm1) * p21(t))


def density(t, p, xm1):
    """Moist air density [kg/m3] (virtual temperature form)."""
    from ..constants import R0
    return p / (R0 * (t * (1.0 + 0.61 * xm1)))
