"""Benchmark: ensemble column-model throughput on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: full-physics column model steps per second — one step = one outer
minute of the operator-splitting schedule (6 × 10-s substeps: implicit
diffusion + MY2.5 closure, Köhler/condensation growth over the 70×70 bin
spectrum with Bott advection, sedimentation, surface energy balance) plus
the 18-band PIFM2 radiative transfer call.  This is the reference's
headline BTZ96 radiation-fog configuration (namelist.BTZ96: chem=F,
mic=T; the canonical 72-h validation case), for a batched ensemble of
independent columns on one chip.

Baseline: the serial Fortran reference advances exactly one column per
process and publishes no numbers (BASELINE.md), and no Fortran compiler
exists in this image — so vs_baseline is measured against a
single-column, unbatched run of this same framework on the host CPU, the
honest stand-in for the reference's serial one-column execution model.

Execution model: the one-time init sequence runs on the host CPU and the
state is device_put onto the accelerator (init is eager; on the tunneled
TPU each eager op costs an RPC round trip), then the whole minute step
runs as one compiled XLA program per call.  Each measurement runs in its
own subprocess with validation canaries (clock advanced exactly, fields
finite) and is retried, because the shared tunneled TPU worker can crash
or hang transiently.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

CACHE_DIR = "/tmp/jax_cache_tpu"


def _build(dtype: str, mic: bool):
    from mistra_tpu.config import MistraConfig
    from mistra_tpu.model import Model
    cfg = MistraConfig(chem=False, mic=mic, dtype=dtype, tw=288.15,
                       zinv=800.0, dtinv=7.0, ug=8.5, vg=0.0,
                       nw_prof_opt=1, wmax=-0.005, z0=0.0001, alat=55.0)
    return Model(cfg)


def _child(mic: bool, batch: int, n_steps: int, mode: str = "fused"):
    """Measure in-process and print one JSON result line."""
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if os.environ.get("MISTRA_FORCE_CPU"):
        # the axon TPU plugin overrides JAX_PLATFORMS; the config update
        # is the reliable way to keep the fallback child off the device
        jax.config.update("jax_platforms", "cpu")

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        model = _build("float32", mic)
        state = model.init_state()
        ensemble = jax.tree.map(
            lambda x: jnp.asarray(jnp.broadcast_to(x, (batch,) + x.shape)),
            state)

    dev = jax.devices()[0]
    ensemble = jax.device_put(ensemble, dev)
    jax.block_until_ready(ensemble)
    if mode == "split":
        step = model.jit_minute_step_split(vmapped=True)
    else:
        step = jax.jit(jax.vmap(model.minute_step), donate_argnums=(0,))

    t_in = float(ensemble.tim.time[0])
    out = step(ensemble)              # compile + warm
    float(jnp.sum(out.met.t))         # full host sync: block_until_ready
    #                                   returns early for pallas custom
    #                                   calls on the tunneled TPU runtime
    t0 = time.perf_counter()
    for _ in range(n_steps):
        out = step(out)
    float(jnp.sum(out.met.t))
    dt_ens = (time.perf_counter() - t0) / n_steps

    # validation canaries: the program really ran and stayed finite
    ok = bool(jnp.all(jnp.isfinite(out.met.t)))
    if mic:
        ok = ok and bool(jnp.all(jnp.isfinite(out.micro.ff)))
    t_out = float(out.tim.time[0])
    expect = t_in + 60.0 * (n_steps + 1)   # 6 x 10-s substeps per minute
    if not ok or abs(t_out - expect) > 1.0:
        print(json.dumps({"error": f"validation failed: finite={ok} "
                          f"time={t_out} expect={expect}"}))
        return

    # serial single-column CPU baseline (reference-style execution model)
    with jax.default_device(cpu):
        state_cpu = jax.device_put(state, cpu)
        cpu_step = jax.jit(model.minute_step)
        s = cpu_step(state_cpu)       # compile + warm
        jax.block_until_ready(s)
        t0 = time.perf_counter()
        for _ in range(2):
            s = cpu_step(s)
        jax.block_until_ready(s)
        dt_one = (time.perf_counter() - t0) / 2

    print(json.dumps({"col": batch / dt_ens, "base": 1.0 / dt_one,
                      "ms_per_step": dt_ens * 1000.0}))


def _run_child(mic: bool, batch: int, n_steps: int, timeout: int,
               mode: str = "fused"):
    cmd = [sys.executable, os.path.abspath(__file__), "--child",
           str(int(mic)), str(batch), str(n_steps), mode]
    out = subprocess.run(cmd, capture_output=True, text=True,
                         timeout=timeout,
                         cwd=os.path.dirname(os.path.abspath(__file__)))
    lines = out.stdout.strip().splitlines()
    if not lines:
        tail = out.stderr.strip().splitlines()[-3:]
        raise RuntimeError(f"child produced no output (rc={out.returncode}; "
                           f"stderr tail: {tail})")
    r = json.loads(lines[-1])
    if "error" in r:
        raise RuntimeError(r["error"])
    return r


def _wait_device_healthy(max_wait_s: int = 240) -> bool:
    """The shared tunneled TPU worker can be down for minutes after a fault
    from any tenant; poll a trivial program until it responds (bounded)."""
    probe = ("import jax, jax.numpy as jnp; x = jnp.ones((8, 128)); "
             "print(float((x @ x.T).sum()))")
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        try:
            out = subprocess.run([sys.executable, "-c", probe],
                                 capture_output=True, text=True, timeout=90)
            if out.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        time.sleep(30)
    return False


# Global wall-clock budget.  The driver runs bench.py under its own
# timeout; blowing that records NO result at all (round-3 failure mode:
# retries + 30-min health waits ran past the budget -> rc=124).  Every
# attempt is gated on the remaining budget and the last-resort fallback
# (CPU dry run) always fits.
BENCH_BUDGET_S = float(os.environ.get("MISTRA_BENCH_BUDGET", "1800"))


def main():
    if len(sys.argv) > 4 and sys.argv[1] == "--child":
        mode = sys.argv[5] if len(sys.argv) > 5 else "fused"
        _child(mic=bool(int(sys.argv[2])), batch=int(sys.argv[3]),
               n_steps=int(sys.argv[4]), mode=mode)
        return

    t_start = time.time()

    def remaining():
        return BENCH_BUDGET_S - (time.time() - t_start)

    attempts = [  # (metric, mic, batch, n_steps, mode, est_s)
        ("btz96_column_steps_per_s", True, 128, 10, "fused", 600),
        ("btz96_column_steps_per_s", True, 64, 10, "split", 600),
        ("btz96_column_steps_per_s", True, 16, 5, "split", 420),
        ("dry_column_steps_per_s", False, 512, 20, "fused", 420),
        ("dry_column_steps_per_s", False, 128, 10, "fused", 300),
    ]
    last_exc = None
    first = True
    physics = None
    for metric, mic, batch, n_steps, mode, est in attempts:
        if remaining() < est + 90:   # leave room for the CPU fallback
            print(f"bench: skipping ({metric}, batch={batch}, {mode}): "
                  f"{remaining():.0f}s left < {est}s", file=sys.stderr)
            continue
        if not first and not _wait_device_healthy(
                max_wait_s=min(240, max(0, remaining() - est - 90))):
            print("bench: device unresponsive; trying anyway",
                  file=sys.stderr)
        first = False
        try:
            timeout = int(min(est + 300, max(120, remaining() - 90)))
            r = _run_child(mic, batch, n_steps, timeout=timeout, mode=mode)
            physics = {
                "metric": metric,
                "value": round(r["col"], 2),
                "unit": "column-minutes/s",
                "vs_baseline": round(r["col"] / r["base"], 2),
            }
            print(json.dumps(physics))
            break
        except Exception as exc:  # retry with the next configuration
            last_exc = exc
            print(f"bench attempt ({metric}, batch={batch}, {mode}) failed: "
                  f"{exc!r}; retrying", file=sys.stderr)

    if physics is not None:
        # the BASELINE.json driving metric: multiphase-chemistry
        # cell-substeps/s/chip on the 421-species tot mechanism
        # (benchmarks/bench_chem.py, block-arrow solver).  Printed LAST
        # so the driver's parsed record is the chemistry number; the
        # physics result rides along as extra keys.
        chem_est = 540
        if remaining() > chem_est:
            try:
                cmd = [sys.executable,
                       os.path.join(os.path.dirname(
                           os.path.abspath(__file__)),
                           "benchmarks", "bench_chem.py"),
                       "--mech", "tot", "--cells", "2048",
                       "--dtype", "float32", "--reps", "3"]
                out = subprocess.run(
                    cmd, capture_output=True, text=True,
                    timeout=int(max(120, remaining() - 30)),
                    cwd=os.path.dirname(os.path.abspath(__file__)))
                line = out.stdout.strip().splitlines()[-1]
                chem = json.loads(line)
                chem["btz96_column_steps_per_s"] = physics["value"]
                chem["btz96_vs_baseline"] = physics["vs_baseline"]
                chem["vs_baseline"] = physics["vs_baseline"]
                # serial native (C++ -O3, one core) LU baseline — the
                # reference's execution model on this host anchors
                # vs_baseline for the chemistry metric
                try:
                    nat = subprocess.run(
                        [sys.executable, os.path.join(
                            os.path.dirname(os.path.abspath(__file__)),
                            "benchmarks", "bench_chem_native.py"),
                         "--mech", "tot", "--cells", "200"],
                        capture_output=True, text=True, timeout=240)
                    natr = json.loads(
                        nat.stdout.strip().splitlines()[-1])
                    chem["native_serial_cell_steps_per_s"] = \
                        natr["value"]
                    if chem.get("cell_ros_steps_per_s"):
                        chem["vs_baseline"] = round(
                            chem["cell_ros_steps_per_s"]
                            / natr["value"], 2)
                except Exception as nexc:
                    print(f"bench: native baseline failed ({nexc!r})",
                          file=sys.stderr)
                # production-size multiphase (150x70x70, nkc=4, f64
                # stiff solves): the configuration the reference spends
                # its life in
                if remaining() > 600:
                    try:
                        sm = subprocess.run(
                            [sys.executable, os.path.join(
                                os.path.dirname(
                                    os.path.abspath(__file__)),
                                "benchmarks", "smoke_tot_full.py"),
                             "--minutes", "1"],
                            capture_output=True, text=True,
                            timeout=int(max(180, remaining() - 30)))
                        smr = json.loads(
                            sm.stdout.strip().splitlines()[-1])
                        chem["tot_full_s_per_model_minute"] = \
                            smr["value"]
                        chem["tot_full_ok"] = smr["ok"]
                        chem["tot_full_nonconv"] = smr["nonconv"]
                    except Exception as sexc:
                        print(f"bench: full-grid smoke failed "
                              f"({sexc!r})", file=sys.stderr)
                print(json.dumps(chem))
            except Exception as exc:
                print(f"bench: chemistry stage failed ({exc!r}); the "
                      f"physics line above stands", file=sys.stderr)
        else:
            print(f"bench: skipping chemistry stage: {remaining():.0f}s "
                  f"left < {chem_est}s", file=sys.stderr)
        return

    # last resort: measure the dry column on the host CPU so the round
    # still records a real number even with the TPU worker down
    print(f"bench: falling back to CPU dry run ({last_exc!r})",
          file=sys.stderr)
    env = dict(os.environ, JAX_PLATFORMS="cpu", MISTRA_FORCE_CPU="1")
    cmd = [sys.executable, os.path.abspath(__file__), "--child",
           "0", "32", "3", "fused"]
    out = subprocess.run(cmd, capture_output=True, text=True,
                         timeout=max(120, min(900, remaining() - 10)),
                         env=env,
                         cwd=os.path.dirname(os.path.abspath(__file__)))
    lines = out.stdout.strip().splitlines()
    r = json.loads(lines[-1]) if lines else {}
    if "col" in r:
        print(json.dumps({
            "metric": "dry_column_steps_per_s_cpu_fallback",
            "value": round(r["col"], 2),
            "unit": "column-minutes/s",
            "vs_baseline": round(r["col"] / r["base"], 2),
        }))
        return
    raise SystemExit(f"all bench attempts failed: {last_exc!r}")


if __name__ == "__main__":
    main()
