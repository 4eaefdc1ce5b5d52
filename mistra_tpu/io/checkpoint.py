"""Checkpoint / restart of the full model state.

Replaces the reference's unformatted Fortran restart records (``outm``/
``outc`` writing rstm.dat/rstc.dat, outp.f90:55-313; read back by
``startm``/``startc``, str.f90:1914-2163) with an orbax checkpoint of the
whole state pytree (met + microphysics + chemistry + clock in one tree),
preserving the reference's restart-equivalence property: running N steps
equals running N/2, checkpointing, restoring, and running N/2 more.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def save_checkpoint(path: str, state) -> str:
    """Write the state pytree to ``path`` (directory); returns the path."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, state, force=True)
    return path


def restore_checkpoint(path: str, template):
    """Restore a state saved with save_checkpoint.

    ``template`` provides the pytree structure and dtypes (e.g. a freshly
    built initial state from the same configuration).
    """
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path), item=template)
