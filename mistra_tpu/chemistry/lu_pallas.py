"""Batched no-pivot dense inverse via LU, as Pallas TPU kernels.

The block-arrow chemistry solver (block_solver.py) factorizes many small
dense diagonal blocks (one 80-100 species block per aqueous bin / gas
core per cell).  The reference factorizes the same stage matrix with
KPP's pivot-free Doolittle elimination (``KppDecomp_t``
/root/reference/src/tot.f:39468, loop form gas.f:6142-6177); on TPU the
per-cell matrices are far too small for the MXU individually and XLA's
batched ``lu`` (partial pivoting, row exchanges) is HBM-bound, so these
kernels keep a tile of cells resident in VMEM with the **cell axis in
the vector lanes**: every elimination step is a [m, m, 128]-shaped VPU
fma over 128 cells at once, and the sequential k-loop runs entirely in
VMEM.

Rather than returning triangular factors (whose solves would serialize),
the kernels produce the explicit inverse: call 1 runs the forward
elimination in place, call 2 builds inv(L) by replaying the multipliers
against I and back-substitutes U X = inv(L), so X = inv(A).  Every
downstream stage solve then becomes a batched matmul/matvec (MXU),
mirroring how the reference's unrolled ``KppSolve`` removes all solver
control flow.

Backend constraints honored (probed on this TPU runtime):
* dynamic indexing only on the sublane (second-minor) dim; row-k
  accesses on the leading dim go through chunked masked reductions with
  ``pl.when`` guards so only the chunk holding row k is read;
* two separate pipelined pallas_calls keep the automatically
  double-buffered working set inside the VMEM budget (a fused single
  call would need ~17 MB, and manual HBM DMA faults through this
  runtime's tunnel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_ROW_CHUNK = 32
# working set slightly exceeds the default 16 MB scoped-vmem limit at
# m ~ 100 (physical VMEM is larger)
_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=28 * 1024 * 1024)


def _chunks(m):
    return [(c, min(c + _ROW_CHUNK, m))
            for c in range(0, m, _ROW_CHUNK)]


def _extract_row(ref, row_ref, k, m):
    """row_ref[...] <- ref[0, k, :, :], reading only the row chunk that
    contains k (leading-dim dynamic indexing is unavailable)."""
    for r0, r1 in _chunks(m):
        rio = jax.lax.broadcasted_iota(jnp.int32, (r1 - r0, 1, 1), 0) + r0

        @pl.when((r0 <= k) & (k < r1))
        def _():
            row_ref[...] = jnp.sum(
                jnp.where(rio == k, ref[0, r0:r1], 0.0), axis=0)


def _lu_kernel(a_ref, lu_ref, row_ref, *, m: int):
    """Forward elimination in place: A -> packed LU (L multipliers below
    the diagonal, U on/above; unit diagonal of L implied).

    Tile layout [1, m(rows, leading), m(cols, sublane), LANES(cells)].
    """
    lu_ref[...] = a_ref[...]
    riota = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)

    def step(k, _):
        # column k (sublane-dynamic) and row k (chunked masked reduce)
        colk = lu_ref[0, :, pl.ds(k, 1), :][:, 0, :]     # [m, LANES]
        piv = jnp.sum(jnp.where(riota == k, colk, 0.0), axis=0)
        _extract_row(lu_ref, row_ref, k, m)
        urow = row_ref[...]                               # [m(c), LANES]
        lvec = jnp.where(riota > k, colk / piv[None, :], 0.0)
        # store multipliers into column k
        lu_ref[0, :, pl.ds(k, 1), :] = jnp.where(
            riota > k, lvec, colk)[:, None, :]
        urow_m = jnp.where(riota > k, urow, 0.0)          # cols > k
        # rank-1 trailing update, chunked over rows so chunks entirely
        # above the pivot are skipped
        for r0, r1 in _chunks(m):
            @pl.when(r1 - 1 > k)
            def _():
                lu_ref[0, r0:r1] = (
                    lu_ref[0, r0:r1]
                    - lvec[r0:r1][:, None, :] * urow_m[None, :, :])
        return 0

    jax.lax.fori_loop(0, m, step, 0)


def _inv_kernel(lu_ref, xt_ref, row_ref, acc_ref, *, m: int):
    """Explicit inverse from the packed LU, stored TRANSPOSED:
    xt[c, r] = inv(A)[r, c].

    Phase 1 replays the multipliers against I (xt accumulates inv(L)
    transposed: xt[c, k] = invL[k, c]); phase 2 back-substitutes
    U X = inv(L) in place, descending.
    """
    dtype = lu_ref.dtype
    riota = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    eye = (jax.lax.broadcasted_iota(jnp.int32, (m, m, 1), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (m, m, 1), 1)
           ).astype(dtype)
    xt_ref[...] = jnp.broadcast_to(eye, (1, m, m, LANES))

    def fwd(k, _):
        # multipliers l (rows > k of LU column k); invL row k (= xt
        # column k) is final at step k
        lcol = lu_ref[0, :, pl.ds(k, 1), :][:, 0, :]      # [m, LANES]
        lvec = jnp.where(riota > k, lcol, 0.0)
        xcol = xt_ref[0, :, pl.ds(k, 1), :][:, 0, :]      # [m(c), LANES]
        # xt[c, r] -= invL[k, c] * l[r]; invL row k is nonzero only for
        # c <= k, so chunks beyond the pivot column are skipped
        for r0, r1 in _chunks(m):
            @pl.when(r0 <= k)
            def _():
                xt_ref[0, r0:r1] = (
                    xt_ref[0, r0:r1]
                    - xcol[r0:r1][:, None, :] * lvec[None, :, :])
        return 0

    jax.lax.fori_loop(0, m, fwd, 0)

    def back(j, _):
        k = m - 1 - j
        _extract_row(lu_ref, row_ref, k, m)
        urow = row_ref[...]                               # [m(j), LANES]
        ukk = jnp.sum(jnp.where(riota == k, urow, 0.0), axis=0)
        urow_m = jnp.where(riota > k, urow, 0.0)
        # acc[c] = sum_{j>k} U[k, j] * X[j, c] with X[j, .] = xt[., j];
        # columns j > k of xt hold final inverse rows, j <= k still hold
        # the inv(L) right-hand side; sublane chunks entirely at or
        # below the pivot column are skipped
        acc_ref[...] = jnp.zeros((m, LANES), dtype)
        for j0, j1 in _chunks(m):
            @pl.when(j1 - 1 > k)
            def _():
                acc_ref[...] = acc_ref[...] + jnp.sum(
                    urow_m[j0:j1][None, :, :] * xt_ref[0][:, j0:j1, :],
                    axis=1)
        rhs = xt_ref[0, :, pl.ds(k, 1), :][:, 0, :]       # invL[k, c]
        xt_ref[0, :, pl.ds(k, 1), :] = (
            (rhs - acc_ref[...]) / ukk[None, :])[:, None, :]
        return 0

    jax.lax.fori_loop(0, m, back, 0)


from .._x64 import no_x64


@no_x64
@functools.partial(jax.jit, static_argnames=("interpret",))
def inv_lanes(a_tiles: jax.Array, interpret: bool = False):
    """inv(A) for a batch of dense matrices, tiled cells-minor.

    Args:
      a_tiles: [T, m, m, LANES] f32 (T tiles of 128 cells), layout
        [tile, row, col, cell].
    Returns:
      [T, m, m, LANES] with layout [tile, col, row, cell] — the
      TRANSPOSED inverse (callers undo this in their batch-major
      transpose).
    """
    t, m, m2, lanes = a_tiles.shape
    assert m == m2 and lanes == LANES, a_tiles.shape
    spec = pl.BlockSpec((1, m, m, LANES), lambda i: (i, 0, 0, 0))
    shape = jax.ShapeDtypeStruct(a_tiles.shape, a_tiles.dtype)
    row_scratch = pltpu.VMEM((m, LANES), a_tiles.dtype)
    lu = pl.pallas_call(
        functools.partial(_lu_kernel, m=m),
        grid=(t,), in_specs=[spec], out_specs=spec, out_shape=shape,
        scratch_shapes=[row_scratch],
        compiler_params=_COMPILER_PARAMS, interpret=interpret,
    )(a_tiles)
    xt = pl.pallas_call(
        functools.partial(_inv_kernel, m=m),
        grid=(t,), in_specs=[spec], out_specs=spec, out_shape=shape,
        scratch_shapes=[row_scratch, row_scratch],
        compiler_params=_COMPILER_PARAMS, interpret=interpret,
    )(lu)
    return xt


def batched_inv_nopivot(a_bm: jax.Array, use_pallas: bool | None = None,
                        interpret: bool = False) -> jax.Array:
    """Batch-major wrapper: [N, m, m] -> inv(A) [N, m, m].

    On TPU (f32) the Pallas kernels run cells-minor with layout
    transposes on either side; elsewhere (or for f64 parity tests)
    jnp.linalg.inv (pivoted, numerically at least as good) provides the
    fallback.
    """
    if use_pallas is None:
        use_pallas = (a_bm.dtype == jnp.float32 and
                      jax.default_backend() == "tpu")
    if not use_pallas:
        if (a_bm.dtype == jnp.float64 and
                jax.default_backend() == "tpu"):
            # TPU has no f64 LU custom call; a partially pivoted
            # Gauss-Jordan scan provides LAPACK-grade accuracy (the
            # no-pivot recursive block inverse loses ~6 digits and
            # roughly doubles the stiff step count)
            return _inv_gj_pivot(a_bm)
        return jnp.linalg.inv(a_bm)
    n, m, _ = a_bm.shape
    pad = (-n) % LANES
    if pad:
        eye = jnp.broadcast_to(jnp.eye(m, dtype=a_bm.dtype),
                               (pad, m, m))
        a_bm = jnp.concatenate([a_bm, eye], axis=0)
    nt = a_bm.shape[0] // LANES
    a4 = a_bm.reshape(nt, LANES, m, m)
    a_tiles = jnp.transpose(a4, (0, 2, 3, 1))
    xt = inv_lanes(a_tiles, interpret=interpret)
    # xt layout [tile, col, row, cell] -> batch-major [N, row, col]
    inv_bm = jnp.transpose(xt, (0, 3, 2, 1)).reshape(nt * LANES, m, m)
    return inv_bm[:n]


# --------------------------------------------------------------------------
# f64 path: recursive block inverse out of pure matmuls (XLA)
# --------------------------------------------------------------------------

def _inv_gj_scan(a):
    """No-pivot Gauss-Jordan inverse via lax.scan; [N, m, m], any dtype.
    Used at the recursion leaves (m <= 16)."""
    n, m, _ = a.shape

    def step(a, k):
        piv = jnp.take_along_axis(
            jnp.take_along_axis(a, jnp.full((n, 1, m), k), axis=1),
            jnp.full((n, 1, 1), k), axis=2)[:, 0, 0]       # [N]
        rowk = jax.lax.dynamic_slice_in_dim(a, k, 1, axis=1)[:, 0, :]
        colk = jax.lax.dynamic_slice_in_dim(a, k, 1, axis=2)[:, :, 0]
        rowk = rowk / piv[:, None]
        i = jnp.arange(m)
        not_k = (i != k)
        f = jnp.where(not_k, colk, 0.0)
        a = a - f[:, :, None] * rowk[:, None, :]
        # write row k (normalized), column k (-f/piv), diag (1/piv)
        newcol = jnp.where(not_k, -f / piv[:, None], 1.0 / piv[:, None])
        a = jnp.where((i[None, :, None] == k),
                      jnp.where(i[None, None, :] == k,
                                (1.0 / piv)[:, None, None],
                                rowk[:, None, :]), a)
        a = jnp.where((i[None, None, :] == k) & (i[None, :, None] != k),
                      newcol[:, :, None] * jnp.ones_like(a), a)
        return a, None

    a, _ = jax.lax.scan(step, a, jnp.arange(m))
    return a


def _inv_block_recursive(a, leaf: int = 16):
    """inv(A) for [N, m, m] batches via recursive 2x2 block elimination:

        inv([[A11, A12], [A21, A22]]) built from inv(A11) and the
        inverse of the Schur complement S = A22 - A21 inv(A11) A12.

    Everything except the tiny leaves is batched matmuls, so this runs
    at full speed for dtypes whose LU/triangular-solve custom calls are
    unavailable on TPU (float64) — the multiphase chemistry's stage
    solves need f64 because the aqueous stiffness ratio (~1e10) exceeds
    float32's conditioning budget (see block_solver.prepare).
    No pivoting: same stability class as the reference's KppDecomp,
    protected by the same row equilibration.
    """
    m = a.shape[-1]
    if m <= leaf:
        return _inv_gj_scan(a)
    k = (m // 2 + 7) // 8 * 8 if m > 2 * 8 else m // 2
    k = min(k, m - 1)
    a11, a12 = a[:, :k, :k], a[:, :k, k:]
    a21, a22 = a[:, k:, :k], a[:, k:, k:]
    prec = jax.lax.Precision.HIGHEST
    i11 = _inv_block_recursive(a11, leaf)
    w = jnp.einsum("bij,bjk->bik", a21, i11, precision=prec)
    s = a22 - jnp.einsum("bij,bjk->bik", w, a12, precision=prec)
    i22 = _inv_block_recursive(s, leaf)
    v = jnp.einsum("bij,bjk->bik", i11, a12, precision=prec)
    b21 = -jnp.einsum("bij,bjk->bik", i22, w, precision=prec)
    b12 = -jnp.einsum("bij,bjk->bik", v, i22, precision=prec)
    b11 = i11 - jnp.einsum("bij,bjk->bik", v, b21, precision=prec)
    top = jnp.concatenate([b11, b12], axis=2)
    bot = jnp.concatenate([b21, i22], axis=2)
    return jnp.concatenate([top, bot], axis=1)


def _inv_gj_pivot(a):
    """Partially pivoted Gauss-Jordan inverse via lax.scan; [N, m, m],
    any dtype, pure XLA (no LU custom call).

    Row pivoting restores LAPACK-grade accuracy for the f64 multiphase
    stage matrices — the no-pivot recursive block inverse loses ~6
    digits through its nested Schur complements, which roughly doubles
    the stiff integrator's step count (and the longer programs then
    trip the runtime watchdog).
    """
    n, m, _ = a.shape
    dtype = a.dtype
    eye = jnp.broadcast_to(jnp.eye(m, dtype=dtype), (n, m, m))
    aug = jnp.concatenate([a, eye], axis=2)          # [N, m, 2m]
    used0 = jnp.zeros((n, m), bool)

    def step(carry, k):
        aug, used = carry
        col = jax.lax.dynamic_slice_in_dim(aug, k, 1, axis=2)[:, :, 0]
        cand = jnp.where(used, -1.0, jnp.abs(col))
        p = jnp.argmax(cand, axis=1)                 # [N]
        oh = jax.nn.one_hot(p, m, dtype=dtype)       # [N, m]
        piv = jnp.sum(col * oh, axis=1)              # [N]
        rowp = jnp.einsum("nm,nmj->nj", oh, aug)     # [N, 2m]
        rowp = rowp / piv[:, None]
        f = col - piv[:, None] * oh                  # zero at pivot row
        aug = aug - f[:, :, None] * rowp[:, None, :]
        # write the normalized pivot row back
        aug = jnp.where(oh[:, :, None] > 0, rowp[:, None, :], aug)
        used = used | (oh > 0)
        return (aug, used), oh

    (aug, _), ohs = jax.lax.scan(step, (aug, used0), jnp.arange(m))
    # ohs: [m, N, m] with ohs[k, b, p_k] = 1; inv(A)[k, :] = right[p_k, :]
    right = aug[:, :, m:]
    perm = jnp.transpose(ohs, (1, 0, 2))             # [N, m(k), m(p)]
    return jnp.einsum("nkp,npj->nkj", perm, right)
