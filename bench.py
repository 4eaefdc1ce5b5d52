"""Benchmark: ensemble column-model throughput on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: column model steps per second (one step = one outer minute of the
operator-splitting schedule = 6 fast substeps + MY2.5 closure + surface),
for a batched ensemble of independent columns on a single chip.

Baseline: the serial Fortran reference advances exactly one column; no
published numbers exist (BASELINE.md), so vs_baseline is measured against
a single-column, unbatched run of this framework on the host CPU — the
honest stand-in for the reference's serial-one-column execution model
until a Fortran build is available.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def _build(dtype: str):
    from mistra_tpu.config import MistraConfig
    from mistra_tpu.model import Model
    cfg = MistraConfig(chem=False, mic=False, dtype=dtype, tw=288.15,
                       zinv=800.0, dtinv=7.0, ug=8.5, vg=0.0,
                       nw_prof_opt=1, wmax=-0.005, z0=0.0001, alat=55.0)
    return Model(cfg)


def _time_steps(step_fn, state, n_steps: int) -> float:
    state = step_fn(state)  # compile + warm
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state = step_fn(state)
    jax.block_until_ready(state)
    return (time.perf_counter() - t0) / n_steps


def main():
    batch = 512
    n_steps = 20

    model = _build("float32")
    state = model.init_state()
    ensemble = jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape),
                            state)
    step = jax.jit(jax.vmap(model.minute_step))
    dt_ens = _time_steps(step, ensemble, n_steps)
    col_steps_per_s = batch / dt_ens

    # serial single-column CPU baseline (reference-style execution model)
    cpu = jax.devices("cpu")[0]
    state_cpu = jax.device_put(state, cpu)
    step1 = jax.jit(model.minute_step, device=cpu)
    dt_one = _time_steps(step1, state_cpu, max(3, n_steps // 4))
    baseline_steps_per_s = 1.0 / dt_one

    print(json.dumps({
        "metric": "column_model_steps_per_s",
        "value": round(col_steps_per_s, 2),
        "unit": "column-steps/s",
        "vs_baseline": round(col_steps_per_s / baseline_steps_per_s, 2),
    }))


if __name__ == "__main__":
    main()
