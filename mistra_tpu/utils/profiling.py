"""Tracing / profiling subsystem (SURVEY.md §5.1).

The reference has no built-in profiling beyond a per-minute progress line
(str.f90:516-531) and compiler-flag builds; the TPU framework makes
observability first-class:

- ``trace(logdir)``: capture a ``jax.profiler`` device trace of any code
  block (viewable in TensorBoard / Perfetto).
- ``annotate(name)``: named scope that shows up in traces, so each physics
  operator (difm, kon, sedp, nstrahl, kpp) is attributable on the timeline.
- ``Roofline``: analytic per-kernel FLOP/byte cost model from the grid
  dimensions, used with measured wall time to report achieved fraction of
  the chip's peak compute / HBM bandwidth.
- ``benchmark(fn, args)``: block-until-ready timing harness with compile
  time split out.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field

import jax

# Peak numbers for the roofline denominators [per chip].  These are
# conservative public figures for a v5e-class chip; override via
# Roofline(peak_flops=..., peak_bw=...) for other hardware.
PEAK_FLOPS_F32 = 197e12 / 2  # bf16 peak / 2 ~ f32 MXU peak
PEAK_HBM_BW = 819e9          # bytes/s


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace of the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope visible in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


def benchmark(fn, *args, iters: int = 10, warmup: int = 1):
    """Time a jitted callable: returns (seconds/iter, compile_seconds).

    The first call (compile + run) is measured separately; steady-state
    timing blocks on the final result only, letting XLA pipeline steps.
    """
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    for _ in range(max(0, warmup - 1)):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, compile_s


@dataclass
class KernelCost:
    """Analytic cost of one kernel invocation."""
    name: str
    flops: float
    bytes: float

    def intensity(self) -> float:
        return self.flops / max(self.bytes, 1.0)


@dataclass
class Roofline:
    """Roofline bookkeeping: register analytic kernel costs, then report
    achieved compute / bandwidth fractions from measured wall time."""
    peak_flops: float = PEAK_FLOPS_F32
    peak_bw: float = PEAK_HBM_BW
    kernels: dict = field(default_factory=dict)

    def add(self, cost: KernelCost):
        self.kernels[cost.name] = cost

    def report(self, name: str, wall_s: float, batch: int = 1) -> dict:
        c = self.kernels[name]
        flops = c.flops * batch
        byts = c.bytes * batch
        bound = "compute" if c.intensity() > self.peak_flops / self.peak_bw \
            else "memory"
        return {
            "kernel": name,
            "wall_s": wall_s,
            "achieved_tflops": flops / wall_s / 1e12,
            "pct_peak_flops": 100.0 * flops / wall_s / self.peak_flops,
            "achieved_gbps": byts / wall_s / 1e9,
            "pct_peak_bw": 100.0 * byts / wall_s / self.peak_bw,
            "arithmetic_intensity": c.intensity(),
            "bound": bound,
        }


def model_costs(cfg, dtype_bytes: int = 4) -> Roofline:
    """Analytic per-minute-step costs for the main physics operators,
    derived from the survey's cost-model facts (SURVEY.md §6): chemistry
    Fun/Jac/LU sizes, radiation 121 (ig,ib) quadrature points x layers,
    growth iterations over the (nkt, nka) spectrum."""
    g = cfg.grid
    n, nf, nka, nkt = g.n, g.nf, g.nka, g.nkt
    r = Roofline()
    nsub = 6
    # difm/difc/difp: tridiagonal sweeps, ~10 flops/cell/sweep
    r.add(KernelCost("difm", 5 * 10 * n * nsub, 5 * 3 * n * dtype_bytes))
    r.add(KernelCost("difp", 10 * nka * nkt * n * nsub,
                     nka * nkt * n * dtype_bytes * 2))
    # kon/subkon: <=10 Newton iterations x spectrum x levels per substep
    r.add(KernelCost("kon", 10 * 40 * nka * nkt * nf * nsub,
                     nka * nkt * n * dtype_bytes * 4))
    # sedp: Courant-split advection over the spectrum
    r.add(KernelCost("sedp", 3 * 20 * nka * nkt * nf * nsub,
                     nka * nkt * n * dtype_bytes * 2))
    # radiation: 121 quadrature points x 18 bands worth of layer recursions
    nrlay = n + 10
    r.add(KernelCost("nstrahl", 121 * nrlay * 60.0,
                     121 * nrlay * dtype_bytes * 6))
    return r


def print_report(rows):
    for row in rows:
        print(json.dumps(row))
