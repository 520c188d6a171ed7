"""View-parallel execution over a TPU device mesh.

The reference is single-GPU (`cudaSetDevice(0)`, src/acmmp_definitions.cpp:253)
and loops reference views sequentially (src/main_ACMMP.cpp:112-137). The
parallel axes that exist in the problem (SURVEY.md §2.3) are made first-class
here the TPU way:

  * **view parallelism** (the data-parallel analog): each reference view's
    PatchMatch solve is independent within a stage → shard the view batch
    over a 1-D mesh axis ``"view"`` with `shard_map`, `lax.map` over the
    local shard;
  * **cross-view gather for geometric consistency** (the one cross-chip data
    dependency, src/ACMMP.cpp:608-635): every chip needs the *current* depth
    maps of its problems' source views → one `lax.all_gather` of the depth
    maps over ICI at the stage barrier, then a local integer gather picks
    each problem's sources.

Everything here is shape-static and jit-compiled once per (shape, mode).
Tile sharding (halo exchange inside a single huge view) lives in
parallel/tiles.py.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from acmmp_tpu.parallel.shmap import shard_map

from acmmp_tpu.config import PatchMatchParams
from acmmp_tpu.engine.patchmatch import (
    Mode, SolverInputs, SolverOutputs, run_patchmatch,
)

VIEW_AXIS = "view"


def maybe_init_distributed() -> bool:
    """Initialize jax.distributed for multi-host pods when the standard
    coordinator env vars are present (JAX_COORDINATOR_ADDRESS or the cloud
    TPU metadata JAX auto-detects). Safe to call repeatedly. Returns True
    when running multi-process."""
    import os

    if jax.process_count() > 1:
        return True
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
            "COORDINATOR_ADDRESS"):
        try:
            jax.distributed.initialize()
        except RuntimeError:
            pass  # already initialized
    return jax.process_count() > 1


def make_view_mesh(n_devices: Optional[int] = None,
                   devices=None) -> Mesh:
    """A 1-D mesh over the view axis. With `n_devices=None` uses every
    visible device (chips × hosts; `jax.distributed` must be initialized by
    the caller on multi-host)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (VIEW_AXIS,))


def stack_solver_inputs(inputs: Sequence[SolverInputs]) -> SolverInputs:
    """Stack per-view SolverInputs (identical static shapes) into one batched
    SolverInputs with a leading view axis [N, ...]."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *inputs)


def pad_to_multiple(batch: SolverInputs, keys: jax.Array, m: int):
    """Pad the leading view axis to a multiple of `m` (mesh size) by
    repeating the last problem; returns (batch, keys, valid [Np] bool)."""
    n = keys.shape[0]
    np_ = ((n + m - 1) // m) * m
    pad = np_ - n
    valid = jnp.arange(np_) < n
    if pad == 0:
        return batch, keys, valid
    batch = jax.tree.map(
        lambda x: jnp.concatenate(
            [x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])]), batch)
    keys = jnp.concatenate([keys, jnp.broadcast_to(keys[-1:], (pad,) + keys.shape[1:])])
    return batch, keys, valid


def _specs_like(tree):
    return jax.tree.map(lambda _: P(VIEW_AXIS), tree)


@partial(jax.jit, static_argnames=("params", "mode", "mesh"))
def _sharded_solve_impl(batch: SolverInputs, keys: jax.Array,
                        params: PatchMatchParams, mode: Mode,
                        mesh: Mesh) -> SolverOutputs:
    def local(b, k):
        # sequential over the chip-local problems (lax.map, not vmap: the
        # Pallas NCC kernel has no batching rule, and per-chip sequential
        # solves are the right memory/throughput model for MVS anyway)
        return jax.lax.map(
            lambda bk: run_patchmatch(bk[0], bk[1], params, mode), (b, k))

    return shard_map(
        local, mesh=mesh,
        in_specs=(_specs_like(batch), P(VIEW_AXIS)),
        out_specs=_specs_like(
            SolverOutputs(depth=0, normal_world=0, cost=0, pre_costs=0)),
        check_rep=False,
    )(batch, keys)


def view_sharded_solve(mesh: Mesh, batch: SolverInputs, keys: jax.Array,
                       params: PatchMatchParams, mode: Mode) -> SolverOutputs:
    """Photometric (or hierarchy/seeded) pass for a batch of reference views,
    sharded over the mesh's view axis. `batch` leading dim must be a multiple
    of the mesh size (use pad_to_multiple)."""
    assert batch.ref_img.ndim == 3, "batch must have a leading view axis"
    return _sharded_solve_impl(batch, keys, params, mode, mesh)


@partial(jax.jit, static_argnames=("params", "mode", "mesh"))
def _sharded_geom_impl(batch: SolverInputs, depth_maps: jax.Array,
                       src_idx: jax.Array, keys: jax.Array,
                       params: PatchMatchParams, mode: Mode,
                       mesh: Mesh) -> SolverOutputs:
    def local(b, dm, si, k):
        # the one cross-chip dependency: every chip needs the current depth
        # maps of its problems' source views → all-gather over ICI
        full = jax.lax.all_gather(dm, VIEW_AXIS, axis=0, tiled=True)  # [N,Hs,Ws]

        def one(x):
            inp, idx, kk = x
            inp = inp._replace(src_depths=full[idx])   # [V, Hs, Ws]
            return run_patchmatch(inp, kk, params, mode)

        return jax.lax.map(one, (b, si, k))

    return shard_map(
        local, mesh=mesh,
        in_specs=(_specs_like(batch), P(VIEW_AXIS), P(VIEW_AXIS), P(VIEW_AXIS)),
        out_specs=_specs_like(
            SolverOutputs(depth=0, normal_world=0, cost=0, pre_costs=0)),
        check_rep=False,
    )(batch, depth_maps, src_idx, keys)


def view_sharded_geometric_solve(
    mesh: Mesh,
    batch: SolverInputs,          # [N, ...] WITHOUT src_depths set
    depth_maps: jax.Array,        # [N, Hs, Ws] current per-view depth maps
    src_idx: jax.Array,           # [N, V] int32 indices into the view batch
    keys: jax.Array,              # [N] PRNG keys
    params: PatchMatchParams,
    mode: Mode,
) -> SolverOutputs:
    """Geometric-consistency pass: all-gathers the current depth maps over
    the view axis, gathers each problem's source depths locally, then runs
    the sharded solve. Implements the stage-barrier collective of
    SURVEY.md §2.3 (reference reloads them from disk, src/ACMMP.cpp:608-635)."""
    assert mode.geom_consistency
    assert batch.src_depths is None, "src_depths is built from depth_maps"
    return _sharded_geom_impl(batch, depth_maps, src_idx, keys, params, mode,
                              mesh)


def shard_batch(mesh: Mesh, batch, spec=None):
    """Device-put a host batch with leading-axis view sharding."""
    sharding = NamedSharding(mesh, P(VIEW_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


@partial(jax.jit, static_argnames=("mesh",))
def _gather_src_depths_impl(depth_maps, src_idx, mesh):
    def local(dm, si):
        full = jax.lax.all_gather(dm, VIEW_AXIS, axis=0, tiled=True)
        return full[si]                     # [B_local, V, Hs, Ws]

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(VIEW_AXIS), P(VIEW_AXIS)),
        out_specs=P(VIEW_AXIS),
        check_rep=False,
    )(depth_maps, src_idx)


def gather_src_depths(mesh: Mesh, depth_maps: jax.Array,
                      src_idx: jax.Array) -> jax.Array:
    """The geometric pass's stage-barrier collective in the production
    pipeline: every chip holds its own views' current depth maps
    (`depth_maps` [N, Hs, Ws], view-sharded); one `lax.all_gather` over ICI
    replaces the reference's per-problem disk reloads of neighbor depths
    (src/ACMMP.cpp:608-635), then a local integer gather picks each
    problem's source maps (`src_idx` [B, V] indices into the view axis).
    Returns [B, V, Hs, Ws], view-sharded. Both leading dims must be
    multiples of the mesh size."""
    n = mesh.devices.size
    assert depth_maps.shape[0] % n == 0, (depth_maps.shape, n)
    assert src_idx.shape[0] % n == 0, (src_idx.shape, n)
    return _gather_src_depths_impl(depth_maps, src_idx, mesh)
