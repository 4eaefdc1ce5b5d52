"""Batched no-pivot dense inverse via LU, as a Pallas TPU kernel.

The block-arrow chemistry solver (block_solver.py) factorizes many small
dense diagonal blocks (one 80-100 species block per aqueous bin / gas
core per cell).  The reference factorizes the same stage matrix with
KPP's pivot-free Doolittle elimination (``KppDecomp_t``
/root/reference/src/tot.f:39468, loop form gas.f:6142-6177); on TPU the
per-cell matrices are far too small for the MXU individually and XLA's
batched ``lu`` (partial pivoting, row exchanges) is HBM-bound, so this
kernel keeps a tile of cells resident in VMEM with the **cell axis in
the vector lanes**: every elimination step is a [m, m, 128]-shaped VPU
fma over 128 cells at once, and the sequential k-loop runs entirely in
VMEM.

Rather than returning triangular factors (whose solves would serialize),
the kernel produces the explicit inverse: the forward elimination
accumulates inv(L) (the row operations applied to I), then an in-place
back-substitution solves U X = inv(L) so X = inv(A).  Every downstream
stage solve then becomes a batched matmul/matvec (MXU), mirroring how
the reference's unrolled ``KppSolve`` removes all solver control flow.

Implementation notes:
* Layout [T, m, m, LANES] — matrix dims mid, cells minor; every
  elimination access (row k, column k) indexes the *leading/untiled*
  dims only: the column is read from a transposed copy of the working
  matrix that the kernel co-updates, because dynamic sublane/lane
  indexing is fragile on this backend.
* Tiles are DMA'd manually (refs live in ANY/HBM): the automatically
  pipelined form double-buffers every operand and blows the ~16 MB
  VMEM budget at m ~ 100.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_ROW_CHUNK = 16


def _inv_kernel(a_hbm, at_hbm, inv_hbm, lu, lut, x, sem, *, m: int):
    """One tile of 128 cells: inv(A) via no-pivot LU, all in VMEM."""
    i = pl.program_id(0)
    dtype = lu.dtype
    nch = -(-m // _ROW_CHUNK)

    cp_a = pltpu.make_async_copy(a_hbm.at[i], lu, sem)
    cp_a.start()
    cp_at = pltpu.make_async_copy(at_hbm.at[i], lut, sem)
    cp_a.wait()
    cp_at.start()

    # x starts as I and accumulates inv(L) during the forward sweep
    eye = (jax.lax.broadcasted_iota(jnp.int32, (m, m, 1), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (m, m, 1), 1)
           ).astype(dtype)
    x[...] = jnp.broadcast_to(eye, (m, m, LANES))
    cp_at.wait()

    riota = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)

    def chunked_rank1(ref, lvec, row, k):
        """ref[r, :, :] -= lvec[r] * row for rows r > k, chunk-skipped."""
        for c in range(nch):
            r0 = c * _ROW_CHUNK
            r1 = min(r0 + _ROW_CHUNK, m)

            @pl.when(r1 - 1 > k)
            def _():
                lch = lvec[r0:r1]                  # [sz, LANES]
                ref[pl.ds(r0, r1 - r0)] = (
                    ref[pl.ds(r0, r1 - r0)]
                    - lch[:, None, :] * row[None, :, :])

    def elim_step(k, _):
        urow = lu[pl.ds(k, 1)][0]                  # [m, LANES] row k
        colk = lut[pl.ds(k, 1)][0]                 # [m, LANES] column k
        mask_k = (riota == k).astype(dtype)
        pivdiag = jnp.sum(mask_k * colk, axis=0)   # [LANES] A[k,k]
        rcp = 1.0 / pivdiag
        below = riota > k                          # [m, 1]
        lvec = jnp.where(below, colk * rcp[None, :], 0.0)
        urow_m = jnp.where(below, urow, 0.0)       # zero cols <= k
        xrow = x[pl.ds(k, 1)][0]                   # [m, LANES]

        # trailing update of LU (rows), its transpose (columns), and
        # the inv(L) accumulator — all leading-dim indexed
        chunked_rank1(lu, lvec, urow_m, k)
        chunked_rank1(lut, urow_m, lvec, k)
        chunked_rank1(x, lvec, xrow, k)
        return 0

    jax.lax.fori_loop(0, m, elim_step, 0)

    # ---- back-substitution U X = inv(L), in place and descending: at
    # step k rows > k of x are final inv(A) rows and the masked row of
    # U only meets those; rows < k still hold their inv(L) rhs values
    def back_step(j, _):
        k = m - 1 - j
        urow = lu[pl.ds(k, 1)][0]                  # [m, LANES]
        mask_k = (riota == k).astype(dtype)
        ukk = jnp.sum(mask_k * urow, axis=0)
        rcp = 1.0 / ukk
        urow_m = jnp.where(riota > k, urow, 0.0)
        acc = jnp.sum(urow_m[:, None, :] * x[...], axis=0)
        rhs = x[pl.ds(k, 1)][0]                    # [m, LANES]
        x[pl.ds(k, 1)] = ((rhs - acc) * rcp[None, :])[None]
        return 0

    jax.lax.fori_loop(0, m, back_step, 0)

    cp_out = pltpu.make_async_copy(x, inv_hbm.at[i], sem)
    cp_out.start()
    cp_out.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def inv_lanes(a_tiles: jax.Array, at_tiles: jax.Array,
              interpret: bool = False):
    """inv(A) for a batch of dense matrices, tiled cells-minor.

    Args:
      a_tiles: [T, m, m, LANES] f32 (T tiles of 128 cells).
      at_tiles: same data with the matrix dims transposed.
    Returns:
      [T, m, m, LANES]: explicit inverses from the no-pivot LU.
    """
    t, m, m2, lanes = a_tiles.shape
    assert m == m2 and lanes == LANES, a_tiles.shape
    return pl.pallas_call(
        functools.partial(_inv_kernel, m=m),
        grid=(t,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        out_shape=jax.ShapeDtypeStruct(a_tiles.shape, a_tiles.dtype),
        scratch_shapes=[
            pltpu.VMEM((m, m, LANES), a_tiles.dtype),
            pltpu.VMEM((m, m, LANES), a_tiles.dtype),
            pltpu.VMEM((m, m, LANES), a_tiles.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(a_tiles, at_tiles)


def batched_inv_nopivot(a_bm: jax.Array, use_pallas: bool | None = None,
                        interpret: bool = False) -> jax.Array:
    """Batch-major wrapper: [N, m, m] -> inv(A) [N, m, m].

    On TPU (f32) the Pallas kernel runs cells-minor with layout
    transposes on either side; elsewhere (or for f64 parity tests)
    jnp.linalg.inv (pivoted, numerically at least as good) provides the
    fallback.
    """
    if use_pallas is None:
        use_pallas = (a_bm.dtype == jnp.float32 and
                      jax.default_backend() == "tpu")
    if not use_pallas:
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
    at_tiles = jnp.transpose(a4, (0, 3, 2, 1))
    inv = inv_lanes(a_tiles, at_tiles, interpret=interpret)
    inv_bm = jnp.transpose(inv, (0, 3, 1, 2)).reshape(nt * LANES, m, m)
    return inv_bm[:n]
