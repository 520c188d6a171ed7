"""Test configuration: run everything on a virtual 8-device CPU mesh so the
full pipeline, including multi-chip sharding, is testable without TPU
hardware (and without contending for the real chip).

NB: this image pre-imports jax at interpreter startup (axon sitecustomize),
so JAX_PLATFORMS in os.environ is already bound — the platform must be
forced via jax.config. XLA_FLAGS is still read lazily at CPU-client
creation, so the virtual device count env var works as long as it is set
before the first jax.devices() call."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NO persistent compilation cache for the suite by default: XLA:CPU's
# executable deserialization segfaults non-deterministically when the
# suite reloads the big solver/shard_map programs mid-run (crash inside
# compilation_cache.get_executable_and_time; reproducible at suite scale,
# not in isolation — see tools/cache_reload_repro.py). Cached AOT machine
# code is also host-ISA-specific, so entries written on a wider-ISA
# machine can SIGILL here. Cold CPU compiles cost ~30-40 min for the full
# suite; opt back in for local iteration at your own risk with
# ACMMP_TEST_CACHE=1.
if os.environ.get("ACMMP_TEST_CACHE"):
    _cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _reset_jax_between_modules():
    """XLA:CPU's compiler segfaults after ~50 tests of accumulated live
    executables (crash inside backend_compile_and_load while compiling yet
    another big solver program — deterministic at suite scale, never in
    isolation). Dropping every compiled program between modules keeps the
    per-process executable population small. Compile time is unaffected in
    practice: the suite runs cache-less anyway (see above)."""
    yield
    import jax as _jax

    _jax.clear_caches()
