"""Pallas TPU kernel for the Bott spectral-bin advection (growth step).

The condensation-growth solve (``subkon``/``advec``, str.f90:4987-5516) is
the dominant cost of the whole model on TPU.  The XLA formulations either
serialize (gather/scatter under vmap batch dims), or — in the banded
rolled form — materialize ~70 [batch, n, nka, nkt] intermediates in HBM
(26 GB at batch 64).  This kernel runs the complete banded characteristic
walk + Bott polynomial deposit on [rows, nkt] blocks resident in VMEM:
one HBM read of (u, z), one HBM write of psi, everything else on the VPU.

Algorithm identical to ``growth._walk_banded`` + the banded deposit of
``growth.bott_bin_advection`` (see there for the derivation and the
reference file:line citations); J = nkt reproduces the reference walk
exactly, smaller J clamps walks longer than J bins to the band edge.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._x64 import no_x64

_WALK_EPS = 1.0e-7
YMIN = 1.0e-32


def _roll(x, d):
    """np.roll(x, d, axis=-1) for a static or traced integer d (cyclic)."""
    nk = x.shape[-1]
    if isinstance(d, int):
        d = d % nk
        if d == 0:
            return x
        return pltpu.roll(x, d, len(x.shape) - 1)
    return pltpu.roll(x, jnp.asarray(d, jnp.int32) % nk, len(x.shape) - 1)


def _walk_right_banded(dt, u, i, J, nkt):
    """Banded rightward characteristic walk (see growth.py)."""
    dtype = u.dtype
    pos = u > 0.0
    inv = jnp.where(pos, 1.0 / jnp.where(pos, u, 1.0), 0.0)
    # prefix sum along lanes via log-step doubling
    S = inv
    sh = 1
    while sh < nkt:
        S = S + jnp.where(i >= sh, _roll(S, sh), 0.0)
        sh *= 2
    P = S - inv
    target = P + (dt - _WALK_EPS)

    one = jnp.ones(u.shape, jnp.int32)
    zero = jnp.zeros(u.shape, jnp.int32)
    # Mosaic cannot rotate i1 vectors: roll a f32 indicator instead
    posf = jnp.where(pos, 1.0, 0.0).astype(dtype)

    def count_body(d, carry):
        count, run, qf = carry
        Sd = _roll(S, -d)
        count = count + jnp.where((i + d < nkt) & (Sd < target), one, zero)
        qf = qf * _roll(posf, -(d + 1)) * jnp.where(i + d + 1 < nkt,
                                                    1.0, 0.0).astype(dtype)
        run = run + qf.astype(jnp.int32)
        return count, run, qf

    count, run, _ = jax.lax.fori_loop(0, J, count_body,
        (jnp.zeros(u.shape, jnp.int32), jnp.zeros(u.shape, jnp.int32),
         jnp.ones(u.shape, dtype)))
    kstar = i + count
    b = i + 1 + run
    b_inf = b >= nkt
    kstop = jnp.minimum(kstar, b)

    o_ks = jnp.clip(kstop, 0, nkt - 1) - i
    o_bs = jnp.clip(b, 0, nkt - 1) - i
    zf = jnp.zeros(u.shape, dtype)

    def gather_body(d, carry):
        Pk, uk, Pb, ub = carry
        Pd = _roll(P, -d)
        ud = _roll(u, -d)
        sel_k = o_ks == d
        sel_b = o_bs == d
        Pk = jnp.where(sel_k, Pd, Pk)
        uk = jnp.where(sel_k, ud, uk)
        Pb = jnp.where(sel_b, Pd, Pb)
        ub = jnp.where(sel_b, ud, ub)
        return Pk, uk, Pb, ub

    Pk, uk, Pb, ub = jax.lax.fori_loop(0, J + 2, gather_body,
                                       (zf, zf, zf, zf))

    R_in = dt - (Pk - P)
    seg = jnp.minimum(R_in, 1.0 / jnp.maximum(uk, 1e-30))
    x_frac = kstop.astype(dtype) + uk * seg

    R = dt - (Pb - P)
    dt0 = jnp.minimum(1.0 / jnp.maximum(jnp.abs(ub), 1e-30), R)
    xb = b.astype(dtype) + ub * dt0
    x_osc = jnp.where(R - dt0 > _WALK_EPS, b.astype(dtype) - 1.0, xb)
    x_barrier = jnp.where(ub == 0.0, b.astype(dtype), x_osc)
    x_barrier = jnp.where(b_inf, jnp.full(u.shape, float(nkt), dtype),
                          x_barrier)
    return jnp.where(kstar < b, x_frac, x_barrier)


def _walk_and_split(u, z, R, dt, J, nkt):
    """Shared part: characteristic walk + Bott polynomial split.

    Returns (k_low, k_high, w_lo, w_hi, i) — the two destination bins and
    mass fractions for every source bin.
    """
    dtype = u.dtype
    i = jax.lax.broadcasted_iota(jnp.int32, u.shape, 1)
    i_f = i.astype(dtype)

    def rev(x):
        # permutation matmul MUST keep full f32 precision: the default
        # MXU precision truncates inputs to bf16 (~8 mantissa bits),
        # which corrupts positions/velocities by O(0.2)
        return jnp.dot(x, R, preferred_element_type=dtype,
                       precision=jax.lax.Precision.HIGHEST)

    x_right = _walk_right_banded(dt, u, i, J, nkt)
    x_rev = _walk_right_banded(dt, rev(-u), i, J, nkt)
    x_left = (nkt - 1.0) - rev(x_rev)
    x0 = jnp.where(u == 0.0, i_f, jnp.where(u > 0.0, x_right, x_left))

    # ---- Bott polynomial split of the fractional position ----------------
    k_low_raw = jnp.floor(x0).astype(jnp.int32)
    c0 = x0 - k_low_raw.astype(dtype)
    k_low = jnp.clip(k_low_raw, 0, nkt - 1)
    k_high = jnp.clip(k_low + 1, 0, nkt - 1)

    zm2, zm1 = _roll(z, 2), _roll(z, 1)
    zp1, zp2 = _roll(z, -1), _roll(z, -2)
    al = 1.0 - 2.0 * c0
    al2 = al * al
    al3 = al2 * al

    x1_o1 = c0 * z
    a0_2 = (26.0 * z - zp1 - zm1) / 24.0
    a1_2 = (zp1 - zm1) / 16.0
    a2_2 = (zp1 + zm1 - 2.0 * z) / 48.0
    x1_o2 = jnp.minimum(z, a0_2 * c0 + a1_2 * (1.0 - al2)
                        + a2_2 * (1.0 - al2 * al))
    a0_4 = (9.0 * (zp2 + zm2) - 116.0 * (zp1 + zm1) + 2134.0 * z) / 1920.0
    a1_4 = (-5.0 * (zp2 - zm2) + 34.0 * (zp1 - zm1)) / 384.0
    a2_4 = (-zp2 + 12.0 * (zp1 + zm1) - 22.0 * z - zm2) / 384.0
    a3_4 = (zp2 - 2.0 * (zp1 - zm1) - zm2) / 768.0
    a4_4 = (zp2 - 4.0 * (zp1 + zm1) + 6.0 * z + zm2) / 3840.0
    x1_o4 = jnp.minimum(z, a0_4 * c0 + a1_4 * (1.0 - al2)
                        + a2_4 * (1.0 - al3) + a3_4 * (1.0 - al2 * al2)
                        + a4_4 * (1.0 - al2 * al3))

    order1 = (i == 0) | (i == nkt - 1)
    order2 = (i == 1) | (i == nkt - 2)
    x1 = jnp.where(order1, x1_o1, jnp.where(order2, x1_o2, x1_o4))
    x1 = jnp.maximum(0.0, x1)
    x1 = jnp.where(c0 > 0.0, x1, 0.0)

    active = z >= YMIN
    w_lo = jnp.where(active, z - x1, 0.0)
    w_hi = jnp.where(active, x1, 0.0)
    return k_low, k_high, w_lo, w_hi, i


def _bott_kernel(u_ref, z_ref, rev_ref, out_ref, *, dt, J, nkt):
    u = u_ref[:]
    z = z_ref[:]
    dtype = u.dtype
    k_low, k_high, w_lo, w_hi, i = _walk_and_split(u, z, rev_ref[:],
                                                   dt, J, nkt)

    # ---- banded shift-accumulate deposit ---------------------------------
    D = J + 2
    dk_lo = k_low - i
    dk_hi = k_high - i
    over_t = jnp.sum(jnp.where(dk_lo > D, w_lo, 0.0)
                     + jnp.where(dk_hi > D, w_hi, 0.0),
                     axis=1, keepdims=True)
    over_b = jnp.sum(jnp.where(dk_lo < -D, w_lo, 0.0)
                     + jnp.where(dk_hi < -D, w_hi, 0.0),
                     axis=1, keepdims=True)

    def dep_body(k, out):
        d = k - D
        v = (jnp.where(dk_lo == d, w_lo, 0.0)
             + jnp.where(dk_hi == d, w_hi, 0.0))
        return out + _roll(v, d)

    out = jax.lax.fori_loop(0, 2 * D + 1, dep_body,
                            jnp.zeros(z.shape, dtype))
    out = out + jnp.where(i == 0, over_b, 0.0) \
              + jnp.where(i == nkt - 1, over_t, 0.0)
    out_ref[:] = out


def _dwsum_kernel(u_ref, z_ref, rev_ref, out_ref, *, dt, J, nkt,
                  loge0, lnfac):
    """Water-mass change of the advection WITHOUT depositing the spectrum:
    dw_row = sum_i w_lo*e[k_low] + w_hi*e[k_high] - z*e[i], using the
    exactly-geometric mass grid e[k] = exp(loge0 + k*lnfac).  This is all
    the Newton iteration of subkon needs (the spectrum itself is
    reconstructed once after convergence) and skips the deposit loop —
    nearly half the full kernel's work."""
    u = u_ref[:]
    z = z_ref[:]
    dtype = u.dtype
    k_low, k_high, w_lo, w_hi, i = _walk_and_split(u, z, rev_ref[:],
                                                   dt, J, nkt)

    def e_of(k):
        return jnp.exp(loge0 + k.astype(dtype) * lnfac)

    gain = w_lo * e_of(k_low) + w_hi * e_of(k_high)
    loss = jnp.where(i < nkt, z, 0.0) * e_of(i)
    out_ref[:] = jnp.sum(gain - loss, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("dt", "band", "block_rows"))
@no_x64
def bott_advect_tpu(u, z, dt, band=32, block_rows=256):
    """Banded Bott bin advection as one fused Pallas kernel.

    Args:
      u, z: [..., nkt] velocities (bins/time) and bin contents.
      dt: static python float timestep.
      band: walk band J (J >= nkt is exact).
    Returns [..., nkt] advected contents.
    """
    shape = z.shape
    nkt = shape[-1]
    J = min(band, nkt)
    u = jnp.broadcast_to(u, shape)
    m = 1
    for s in shape[:-1]:
        m *= s
    u2 = u.reshape(m, nkt)
    z2 = z.reshape(m, nkt)
    tm = min(block_rows, m)
    pad = (-m) % tm
    if pad:
        u2 = jnp.concatenate([u2, jnp.zeros((pad, nkt), u.dtype)], axis=0)
        z2 = jnp.concatenate([z2, jnp.zeros((pad, nkt), z.dtype)], axis=0)
    mp = m + pad
    # pad the bin axis to full 128-lane tiles: Mosaic dynamic rotates
    # (the fori-loop rolls) require lane-aligned shapes; the dead lanes
    # carry u=0 / z=0 and are masked by the logical-nkt comparisons
    nkp = -(-nkt // 128) * 128
    cpad = nkp - nkt
    if cpad:
        u2 = jnp.pad(u2, ((0, 0), (0, cpad)))
        z2 = jnp.pad(z2, ((0, 0), (0, cpad)))
    rev_mat = jnp.zeros((nkp, nkp), z.dtype)
    rev_mat = rev_mat.at[:nkt, :nkt].set(jnp.eye(nkt, dtype=z.dtype)[:, ::-1])

    kernel = functools.partial(_bott_kernel, dt=float(dt), J=J, nkt=nkt)
    out = pl.pallas_call(
        kernel,
        grid=(mp // tm,),
        in_specs=[
            pl.BlockSpec((tm, nkp), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, nkp), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nkp, nkp), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, nkp), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, nkp), z.dtype),
    )(u2, z2, rev_mat)
    out = out[:m, :nkt]
    return out.reshape(shape)


@functools.partial(jax.jit, static_argnames=("dt", "band", "block_rows",
                                             "loge0", "lnfac"))
@no_x64
def bott_dwsum_tpu(u, z, dt, loge0, lnfac, band=32, block_rows=256):
    """Per-row water-mass change of the banded Bott advection (no deposit).

    Args as bott_advect_tpu plus the geometric mass grid parameters
    (e[k] = exp(loge0 + k*lnfac)).  Returns [...] row sums (leading shape
    of z without the bin axis): sum_k (psi - z)[k] * e[k].
    """
    shape = z.shape
    nkt = shape[-1]
    J = min(band, nkt)
    u = jnp.broadcast_to(u, shape)
    m = 1
    for s in shape[:-1]:
        m *= s
    u2 = u.reshape(m, nkt)
    z2 = z.reshape(m, nkt)
    tm = min(block_rows, m)
    pad = (-m) % tm
    if pad:
        u2 = jnp.concatenate([u2, jnp.zeros((pad, nkt), u.dtype)], axis=0)
        z2 = jnp.concatenate([z2, jnp.zeros((pad, nkt), z.dtype)], axis=0)
    mp = m + pad
    nkp = -(-nkt // 128) * 128
    cpad = nkp - nkt
    if cpad:
        u2 = jnp.pad(u2, ((0, 0), (0, cpad)))
        z2 = jnp.pad(z2, ((0, 0), (0, cpad)))
    rev_mat = jnp.zeros((nkp, nkp), z.dtype)
    rev_mat = rev_mat.at[:nkt, :nkt].set(jnp.eye(nkt, dtype=z.dtype)[:, ::-1])

    kernel = functools.partial(_dwsum_kernel, dt=float(dt), J=J, nkt=nkt,
                               loge0=float(loge0), lnfac=float(lnfac))
    out = pl.pallas_call(
        kernel,
        grid=(mp // tm,),
        in_specs=[
            pl.BlockSpec((tm, nkp), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, nkp), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nkp, nkp), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, 1), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, 1), z.dtype),
    )(u2, z2, rev_mat)
    return out[:m, 0].reshape(shape[:-1])
