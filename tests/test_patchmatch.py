"""End-to-end solver tests: PatchMatch must recover a known synthetic plane."""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from acmmp_tpu.config import PatchMatchParams
from acmmp_tpu.engine.inputs import build_solver_inputs
from acmmp_tpu.engine.patchmatch import Mode, run_patchmatch
from tests.util import textured_plane_scene

# small patch keeps CPU trace/compile times reasonable (36 -> 16 taps)
PARAMS = PatchMatchParams(patch_size=7)


def _solve(images, cams, mode=Mode(), seed=0, **kw):
    inp = build_solver_inputs(images[0], images[1:], cams[0], cams[1:], PARAMS,
                              pad_h=1, pad_w=1, **kw)
    fn = jax.jit(functools.partial(run_patchmatch, params=PARAMS, mode=mode))
    out = fn(inp, jax.random.key(seed))
    return jax.tree.map(np.asarray, out), inp


def test_photometric_recovers_plane():
    images, cams, plane_z = textured_plane_scene(n_views=4, width=64, height=48)
    out, _ = _solve(images, cams)
    interior = np.s_[10:38, 12:52]
    err = np.abs(out.depth[interior] - plane_z)
    assert np.median(err) < 0.15, np.median(err)
    assert (err < 0.5).mean() > 0.85, (err < 0.5).mean()
    # normals should be close to the true plane normal (0,0,-1) in world
    n = out.normal_world[interior]
    cos = -n[..., 2]  # dot with (0,0,-1)
    assert np.median(cos) > 0.95
    # costs of converged interior pixels should be low
    assert np.median(out.cost[interior]) < 0.2


def test_reproducible():
    images, cams, _ = textured_plane_scene(n_views=3)
    out1, _ = _solve(images, cams, seed=7)
    out2, _ = _solve(images, cams, seed=7)
    np.testing.assert_array_equal(out1.depth, out2.depth)
    out3, _ = _solve(images, cams, seed=8)
    assert np.any(out1.depth != out3.depth)


def test_geometric_pass_refines():
    images, cams, plane_z = textured_plane_scene(n_views=4, width=64, height=48)
    out0, _ = _solve(images, cams)
    # build per-view photometric depths to feed the geometric pass
    depths, normals, costs = {}, {}, {}
    for i in range(len(images)):
        order = [i] + [j for j in range(len(images)) if j != i]
        o, _ = _solve([images[j] for j in order], [cams[j] for j in order], seed=i)
        depths[i], normals[i], costs[i] = o.depth, o.normal_world, o.cost
    # geometric pass for view 0
    out_g, _ = _solve(
        images, cams, mode=Mode(geom_consistency=True),
        src_depths=[depths[j] for j in range(1, len(images))],
        init_depth=depths[0], init_normal_world=normals[0], init_cost=costs[0],
    )
    interior = np.s_[10:38, 12:52]
    err_g = np.abs(out_g.depth[interior] - plane_z)
    err_0 = np.abs(out0.depth[interior] - plane_z)
    assert np.median(err_g) <= np.median(err_0) * 1.5
    assert np.median(err_g) < 0.15
    assert (err_g < 0.5).mean() > 0.85
