import os

# Test on a virtual 8-device CPU mesh in float64 (parity-grade precision).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin overrides the JAX_PLATFORMS env var; this config
# update is the reliable way to keep tests off the (shared) TPU chip.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compilation cache: recompiles across test runs are the
# dominant cost on this 2-CPU machine.  MISTRA_TEST_NO_CACHE=1 disables
# it (the deserializer has segfaulted on very large chemistry
# executables; see test_boxmodel history).
if not os.environ.get("MISTRA_TEST_NO_CACHE"):
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
