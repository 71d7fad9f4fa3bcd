"""Test harness configuration.

Tests run on CPU with 8 virtual devices (to exercise the multi-chip sharding
path without TPU hardware) and with x64 available so JAX numerics can be
compared against the float64 oracle at tight tolerances.  The TPU f32 path
is additionally covered by explicit f32 tolerance tests.

NB: the session environment pins JAX_PLATFORMS=axon (tunneled TPU) and a
pytest plugin imports jax before this file runs, so the platform must be
overridden through jax.config (still possible before backend init), not via
os.environ alone.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the interpret-mode fused-kernel
# equivalence tests each compile a very large unrolled XLA graph
# (~60-120 s); the disk cache halves repeat-run cost (kernel edits still
# recompile — cache keys include the traced program).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
