"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (SURVEY.md §4: "jax CPU backend as the
fake device for CI; multi-host logic testable on CPU via local mesh").

Note: the environment preloads jax at interpreter startup (sitecustomize) with
JAX_PLATFORMS=axon, so plain env-var edits are too late — use config.update,
which works because the backend initializes lazily.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent XLA compilation cache: the suite's dominant cost is scene-step
# compiles (47 min cold); repeat runs hit the cache
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("THORMANG_COMPILE_CACHE", "/tmp/thormang_xla_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
