"""Test configuration: run everything on a virtual 8-device CPU mesh so the
full pipeline, including multi-chip sharding, is testable without TPU
hardware. Must run before jax is imported anywhere."""

import os

# force CPU even when the environment pins another platform (e.g. a TPU
# tunnel via JAX_PLATFORMS=axon): tests must not contend for the device.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
