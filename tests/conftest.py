"""Test configuration: CPU backend with 8 virtual devices (for sharding
tests) and float64 enabled (the 1e-10 parity target vs the deal.II reference
requires double precision, SURVEY.md §7)."""

import os

# force-override: the environment presets JAX_PLATFORMS=axon (tunneled TPU);
# tests must run on the virtual-device CPU backend in float64
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# programmatic override too, in case jax was imported (but not initialized)
# by a pytest plugin before this conftest ran
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent XLA compile cache: the suite is compile-dominated on CPU (one
# fat SLOD kernel per distinct config); repeat runs skip all of it
_cache = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache_cpu")
try:
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass
