"""End-to-end solver tests: PatchMatch must recover a known synthetic plane."""

import functools

import numpy as np
import pytest
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


@pytest.mark.fast  # the fast subset's one tiny end-to-end solver path
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


def test_carried_pv_consistent_hierarchy_planar():
    """The carried per-view NCC cache (state.ncc_pv) must stay bitwise
    consistent with the stored plane field through hierarchy+planar_prior
    sweeps — including pixels where propagation adopted a candidate but
    the hierarchy acceptance gate rejected it (the gate fallback must
    restore the PRE-sweep plane AND its pv, ACMMP.cu:1163-1169)."""
    from acmmp_tpu.engine.patchmatch import init_state, sweep_once
    from acmmp_tpu.engine.priors import build_planar_prior
    from acmmp_tpu.ops import ncc as ncc_ops

    images, cams, _ = textured_plane_scene(n_views=3, width=64, height=48)
    out, inp = _solve(images, cams)
    h, w = images[0].shape
    dmin = float(cams[0].depth_min * PARAMS.depth_min_relax)
    dmax = float(cams[0].depth_max * PARAMS.depth_max_relax)
    prior_planes, prior_mask = build_planar_prior(
        cams[0], out.depth[:h, :w], out.cost[:h, :w], dmin, dmax, w, h)
    assert prior_planes is not None, "fixture must produce support points"

    # gate pre-costs that both pass (left half: slack) and fail (right
    # half: already at the converged cost, margin pushes the gate shut)
    pre = out.cost.copy()
    pre[:, : w // 2] += 1.0

    inp2 = build_solver_inputs(
        images[0], images[1:], cams[0], cams[1:], PARAMS, pad_h=1, pad_w=1,
        init_depth=out.depth, init_normal_world=out.normal_world,
        init_cost=out.cost, prior_planes=prior_planes, prior_mask=prior_mask,
        pre_costs=pre)
    mode2 = Mode(hierarchy=True, planar_prior=True)
    key = jax.random.key(11)
    state = init_state(inp2, key, PARAMS, mode2)
    for s in range(4):
        state = sweep_once(state, inp2, s, jax.random.fold_in(key, s),
                           PARAMS, mode2)

    vg = ncc_ops.make_view_geometry(inp2.ref_cam, inp2.src_cams)
    recomputed = ncc_ops.multiview_zncc(
        inp2.ref_img, inp2.src_imgs, vg, state.planes[None], PARAMS,
        n_views=jnp.sum(inp2.view_mask))[0]
    got = np.asarray(state.ncc_pv)
    want = np.asarray(recomputed)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
