"""Trace-scope x64 firewall for Pallas kernels.

Mosaic cannot lower 64-bit integers (the int64->int32 conversion helper
recurses, jax 0.9 mosaic/lowering.py:2291), and with jax_enable_x64 on,
Python-int loop bounds canonicalize to int64 inside kernel traces.  The
kernels are written for 32-bit types; tracing them inside an
enable_x64(False) scope keeps every canonicalization 32-bit while the
surrounding program (e.g. the f64 multiphase stiff solves) stays x64.
"""

from __future__ import annotations

import functools

from jax._src import config as _jax_config


def no_x64(fn):
    """Decorator: trace/execute ``fn`` with x64 canonicalization off."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with _jax_config.enable_x64(False):
            return fn(*args, **kwargs)

    return wrapper
