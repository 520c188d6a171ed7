"""Version-stable `shard_map` import.

jax 0.8 moved `shard_map` from `jax.experimental.shard_map` to
`jax.shard_map` and renamed ``check_rep`` to ``check_vma`` (the VMA
checker is the replication checker's successor). Every module in this
package imports `shard_map` from here so the package runs warning-free on
jax >= 0.8 and unchanged on older releases.
"""

from __future__ import annotations

import jax

if hasattr(jax, "shard_map"):

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=True):
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=check_rep)

else:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map  # noqa: F401
