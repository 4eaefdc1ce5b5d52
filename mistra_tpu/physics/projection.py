"""Projection of the 2-D particle spectrum onto the 1-D output radius grid
(reference ``oneD_dist_jjb``, str.f90:7571-7639)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def oneD_dist(ff, micro_grid, nf):
    """Sum each level's (nkt, nka) bins into the 1-D rpw radius classes.

    Returns part1D [nka-1, nf] for levels 1..nf (0-based), matching the
    reference's output block.
    """
    rq = np.asarray(micro_grid.rq)            # [nkt, nka]
    rpw = np.asarray(micro_grid.rpw)          # [nka]
    nka = rpw.shape[0]
    # target class per 2-D bin: smallest ij with rq <= rpw[ij+1]
    idx = np.searchsorted(rpw[1:], rq, side="left")
    idx = np.clip(idx, 0, nka - 2)
    onehot = jnp.asarray(
        (idx[:, :, None] == np.arange(nka - 1)[None, None, :])
        .astype(np.float64), ff.dtype)        # [nkt, nka, nka-1]
    levels = ff[:, :, 1:nf]                   # [nkt, nka, nf-1]
    part = jnp.einsum("tkz,tkc->cz", levels, onehot)
    # pad to [nka-1, nf] with the level-0 column zero (reference k=2..nf)
    return jnp.concatenate(
        [jnp.zeros((nka - 1, 1), ff.dtype), part], axis=1)
