"""Per-component timing of the minute step on the current accelerator.

Usage: python benchmarks/profile_step.py [batch] [reps]
Times each physics component of the substep separately (compiled + warm),
then the whole substep and minute step, so hotspots are attributable.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(name, fn, state, reps):
    out = fn(state)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(state)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt * 1000.0:10.2f} ms")
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from mistra_tpu.config import MistraConfig
    from mistra_tpu.model import Model
    cfg = MistraConfig(chem=False, mic=True, dtype="float32", tw=288.15,
                       zinv=800.0, dtinv=7.0, ug=8.5, vg=0.0,
                       nw_prof_opt=1, wmax=-0.005, z0=0.0001, alat=55.0)
    model = Model(cfg)

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        state = model.init_state()
        ens = jax.tree.map(
            lambda x: jnp.asarray(jnp.broadcast_to(x, (batch,) + x.shape)),
            state)
    dev = jax.devices()[0]
    ens = jax.device_put(ens, dev)
    jax.block_until_ready(ens)
    print(f"device={dev}, batch={batch}, reps={reps}")

    from mistra_tpu.physics import diffusion, microphysics
    from mistra_tpu.physics import growth, sedimentation

    atm = model.atm
    a0m = model.consts["a0m"]
    b0m = jnp.asarray(model.consts["b0m"])

    def f_difm(s):
        met, turb, kinv = diffusion.difm(s.met, s.turb, s.surf, s.micro,
                                         atm, 10.0, cfg.ug, cfg.vg)
        return met.t, turb.tke

    def f_difp(s):
        return diffusion.difp(s.micro, s.met, s.turb, atm, 10.0).ff

    def f_kon(s):
        return growth.kon(model, s, 10.0).micro.ff

    def f_sedp(s):
        return sedimentation.sedp(model, s, 10.0).micro.ff

    def f_equil(s):
        met, mic = microphysics.equil(s.met, s.micro, model.grids.micro,
                                      a0m, b0m, ncase=2, nf=cfg.grid.nf)
        return met.t, mic.ff

    def f_partdep(s):
        vd, xra = sedimentation.partdep(model, s)
        return vd, xra

    def f_rad(s):
        return model._radiation(s, init=False).rad.dtrad

    def f_substep(s):
        return model.substep(s, 10.0)

    def f_minute(s):
        return model.minute_step(s)

    parts = [("difm", f_difm), ("difp", f_difp), ("kon", f_kon),
             ("sedp", f_sedp), ("equil", f_equil), ("partdep", f_partdep),
             ("radiation", f_rad), ("substep(all)", f_substep)]
    total = 0.0
    for name, f in parts:
        fn = jax.jit(jax.vmap(f))
        try:
            dt = timeit(name, fn, ens, reps)
        except Exception as exc:
            print(f"{name:28s} FAILED: {exc!r}")
            continue
        if name not in ("substep(all)",):
            total += dt
    print(f"{'sum(parts)':28s} {total * 1000.0:10.2f} ms")
    fn = jax.jit(jax.vmap(f_minute))
    timeit("minute_step", fn, ens, reps)


if __name__ == "__main__":
    main()
