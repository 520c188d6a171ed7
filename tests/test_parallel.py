"""View-parallel sharding tests on the virtual 8-device CPU mesh.

Checks (a) the sharded photometric pass matches the unsharded solve
bitwise, and (b) the geometric pass's all-gather + local index gather
builds the same src_depths a single-chip run would."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acmmp_tpu.config import PatchMatchParams
from acmmp_tpu.engine.inputs import build_solver_inputs
from acmmp_tpu.engine.patchmatch import Mode, run_patchmatch
from acmmp_tpu.parallel import (
    make_view_mesh, pad_to_multiple, stack_solver_inputs,
    view_sharded_geometric_solve, view_sharded_solve,
)

from .util import textured_plane_scene

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multi-device (virtual) platform")


PARAMS = PatchMatchParams(max_iterations=1)


def _make_batch(n_views=3, width=64, height=32):
    images, cams, plane_z = textured_plane_scene(
        n_views=n_views, width=width, height=height)
    problems, src_idx = [], []
    for i in range(n_views):
        srcs = [j for j in range(n_views) if j != i]
        problems.append(build_solver_inputs(
            images[i], [images[j] for j in srcs], cams[i],
            [cams[j] for j in srcs], PARAMS))
        src_idx.append(srcs)
    batch = stack_solver_inputs(problems)
    keys = jax.random.split(jax.random.key(7), n_views)
    return batch, keys, np.asarray(src_idx, np.int32), problems, plane_z


def test_sharded_solve_matches_single_device():
    n_dev = len(jax.devices())
    batch, keys, _, problems, _ = _make_batch()
    pbatch, pkeys, valid = pad_to_multiple(batch, keys, n_dev)
    mesh = make_view_mesh()
    out = view_sharded_solve(mesh, pbatch, pkeys, PARAMS, Mode())

    # reference: the identical vmapped program on one device. Sharding must
    # not change the algorithm; a handful of pixels may flip their discrete
    # argmin choices because XLA fuses differently at local batch 1 vs 8,
    # so assert near-equality rather than bitwise identity.
    ref = jax.jit(jax.vmap(
        lambda i, k: run_patchmatch(i, k, PARAMS, Mode())))(pbatch, pkeys)
    a, b = np.asarray(out.depth), np.asarray(ref.depth)
    mismatch = np.abs(a - b) > 1e-3 * np.abs(b)
    assert mismatch.mean() < 0.02, f"{mismatch.mean():.4f} of pixels differ"
    n = len(problems)
    assert bool(np.all(np.asarray(valid[:n])))
    assert not np.any(np.asarray(valid[n:]))


def test_sharded_geometric_matches_single_device():
    n_dev = len(jax.devices())
    mesh = make_view_mesh()
    batch, keys, src_idx, problems, _ = _make_batch()
    n = keys.shape[0]

    pbatch, pkeys, _ = pad_to_multiple(batch, keys, n_dev)
    out = view_sharded_solve(mesh, pbatch, pkeys, PARAMS, Mode())

    Hs, Ws = pbatch.src_imgs.shape[-2:]
    depth_maps = out.depth[:, :Hs, :Ws]
    geom_batch = pbatch._replace(
        init_depth=out.depth, init_normal_world=out.normal_world,
        init_cost=out.cost)
    pad = pkeys.shape[0] - n
    psrc = np.concatenate(
        [src_idx, np.broadcast_to(src_idx[-1:], (pad,) + src_idx.shape[1:])])
    keys2 = jax.vmap(lambda k: jax.random.fold_in(k, 1))(pkeys)
    out2 = view_sharded_geometric_solve(
        mesh, geom_batch, depth_maps, jnp.asarray(psrc), keys2, PARAMS,
        Mode(geom_consistency=True))

    # unsharded reference: same vmapped program with the gather done in numpy
    gb = geom_batch._replace(src_depths=jnp.asarray(
        np.asarray(depth_maps)[psrc]))
    ref = jax.jit(jax.vmap(
        lambda i, k: run_patchmatch(i, k, PARAMS,
                                    Mode(geom_consistency=True))))(gb, keys2)
    a, b = np.asarray(out2.depth), np.asarray(ref.depth)
    mismatch = np.abs(a - b) > 1e-3 * np.abs(b)
    assert mismatch.mean() < 0.02, f"{mismatch.mean():.4f} of pixels differ"
    assert np.isfinite(a).all()
