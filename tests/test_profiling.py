"""Profiling subsystem (utils/profiling.py; SURVEY.md §5.1)."""

import jax
import jax.numpy as jnp

from mistra_tpu.utils.profiling import (KernelCost, Roofline, annotate,
                                        benchmark, model_costs, trace)


def test_benchmark_and_annotate():
    @jax.jit
    def f(x):
        with annotate("double"):
            return x * 2.0

    x = jnp.ones((64, 64))
    per_iter, compile_s = benchmark(f, x, iters=3)
    assert per_iter > 0.0 and compile_s >= per_iter


def test_roofline_report():
    r = Roofline(peak_flops=1e12, peak_bw=1e11)
    r.add(KernelCost("k", flops=1e9, bytes=1e6))
    rep = r.report("k", wall_s=1e-2, batch=10)
    assert abs(rep["achieved_tflops"] - 1.0) < 1e-9
    assert rep["bound"] == "compute"          # intensity 1000 > 10
    assert abs(rep["pct_peak_flops"] - 100.0) < 1e-6


def test_model_costs_registry():
    from mistra_tpu.config import GridParams, MistraConfig
    cfg = MistraConfig(grid=GridParams(nf=12, n_extra=6, nka=16, nkt=16,
                                       nb=8))
    r = model_costs(cfg)
    for k in ("difm", "difp", "kon", "sedp", "nstrahl"):
        assert k in r.kernels
        assert r.kernels[k].flops > 0


def test_trace_context(tmp_path):
    with trace(str(tmp_path)):
        jnp.sum(jnp.ones((8, 8))).block_until_ready()
    # a trace directory must have been produced
    assert any(tmp_path.iterdir())
