"""Multi-process (multi-host) array plumbing.

The reference is single-GPU, single-process (``cudaSetDevice(0)``,
src/acmmp_definitions.cpp:253). On a TPU pod slice JAX runs one process
per host, and a ``jax.Array`` sharded over the pod is only PARTIALLY
addressable from each process: a naive ``jax.device_put(x, sharding)``
(which requires every device addressable) and ``np.asarray(y)`` (which
requires full addressability) both raise. These helpers are the only two
host<->device crossings the pipeline needs, and both reduce to the naive
form in single-process runs (zero overhead there).

Host contract: every process can read every view's checkpoint files (the
dense folder lives on a shared filesystem — the same contract the
reference's Python harness assumes for its resume logic). Host-side file
WRITES are gated to process 0 (`is_primary`), with `barrier()` at stage
boundaries so later stages on other processes see completed files.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that performs host-side file writes."""
    return jax.process_index() == 0


def barrier(name: str) -> None:
    """Block until every process reaches this point (no-op when
    single-process). Used at stage boundaries where later stages read
    files written (by process 0) during the stage."""
    if is_multiprocess():
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def host_to_global(mesh: Mesh, spec: P, value) -> jax.Array:
    """Build a (possibly multi-process) globally-sharded array from
    host-resident data. Every process passes the FULL array (see the host
    contract above); each contributes only its addressable shards, so no
    cross-process data movement happens here."""
    sharding = NamedSharding(mesh, spec)
    if isinstance(value, jax.Array) and getattr(value, "sharding",
                                                None) == sharding:
        return value
    if sharding.is_fully_addressable:
        return jax.device_put(value, sharding)
    value = np.asarray(value)
    return jax.make_array_from_callback(value.shape, sharding,
                                        lambda idx: value[idx])


def keys_to_global(mesh: Mesh, spec: P, keys: jax.Array) -> jax.Array:
    """`host_to_global` for typed PRNG key arrays (extended dtypes can't
    round-trip through numpy): ship the uint32 key data, re-wrap on
    device with the sharding preserved."""
    data = host_to_global(mesh, P(*spec, None),
                          np.asarray(jax.random.key_data(keys)))
    impl = jax.random.key_impl(keys)
    return jax.jit(lambda d: jax.random.wrap_key_data(d, impl=impl),
                   out_shardings=NamedSharding(mesh, spec))(data)


def global_to_host(x):
    """Fetch a (possibly only partially-addressable) array to every host
    as numpy. Multi-process: one process_allgather over the companion DCN
    mesh; single-process: a plain transfer."""
    if not isinstance(x, jax.Array) or x.is_fully_addressable:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
