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

# persistent compilation cache: the solver program is large and CPU-XLA
# compiles are the dominant test cost; repeat runs hit the cache
_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
