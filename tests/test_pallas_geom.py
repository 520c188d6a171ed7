"""Pallas geometric-consistency kernel vs the jnp oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from acmmp_tpu.config import PatchMatchParams
from acmmp_tpu.core import geometry as geo
from acmmp_tpu.engine.inputs import build_solver_inputs
from acmmp_tpu.ops.geom import geom_consistency_cost
from acmmp_tpu.ops.pallas_geom import geom_consistency_cost_pallas

from .util import textured_plane_scene

PARAMS = PatchMatchParams(ncc_backend="jnp")


def test_matches_oracle():
    # non-round focal length / plane depth: the default rig maps pixels to
    # near-integer source coords everywhere, so 1-ulp fp differences between
    # the kernel's fused projection chain and the oracle's staged one flip
    # the truncated sampling row globally; generic geometry avoids the tie
    images, cams, plane_z = textured_plane_scene(
        n_views=3, width=128, height=32, f=151.73, plane_z=5.1703)
    inputs = build_solver_inputs(images[0], images[1:], cams[0], cams[1:],
                                 PARAMS)
    H, W = inputs.ref_img.shape
    x, y = geo.pixel_grid(H, W)

    # src depth maps: the true plane depth per source view (+ some zeros to
    # exercise the invalid-depth path)
    Hs, Ws = inputs.src_imgs.shape[1:]
    xs, ys = geo.pixel_grid(Hs, Ws)
    # smooth depth maps (a gentle gradient): fp-identical sampling rows in
    # both implementations except at truncation knife-edges, which a smooth
    # field doesn't amplify
    gy = jnp.linspace(0.0, 0.3, Hs)[:, None]
    src_depths = jnp.stack([jnp.full((Hs, Ws), plane_z) + gy,
                            jnp.full((Hs, Ws), plane_z) - gy])

    # hypotheses: slightly off-plane depths so projections land at generic
    # fractional coords (the exact plane projects every pixel to integer
    # coords in this synthetic rig — a truncation knife-edge everywhere)
    n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), x.shape + (3,))
    n_cam = geo.normal_world_to_cam(inputs.ref_cam, n)
    p1 = geo.plane_from_depth_normal(inputs.ref_cam, x, y,
                                     jnp.full(x.shape, plane_z * 1.031), n_cam)
    p2 = geo.plane_from_depth_normal(inputs.ref_cam, x, y,
                                     jnp.full(x.shape, plane_z * 0.967), n_cam)
    planes = jnp.stack([p1, p2])

    oracle = geom_consistency_cost(inputs.ref_cam, inputs.src_cams,
                                   src_depths, planes, x, y, PARAMS)
    with pltpu.force_tpu_interpret_mode():
        got = geom_consistency_cost_pallas(inputs.ref_cam, inputs.src_cams,
                                           src_depths, planes, PARAMS)
    a, b = np.asarray(got), np.asarray(oracle)
    bad = np.abs(a - b) > 1e-3 + 1e-3 * np.abs(b)
    assert bad.mean() < 2e-3, (
        f"{bad.mean():.5f} differ, max |d|={np.abs(a - b).max()}")


def test_invalid_depth_band():
    """Zeroed depth rows must map to geom_cost_max in both paths; the
    1-px truncation knife-edge at the band boundary may disagree."""
    images, cams, plane_z = textured_plane_scene(
        n_views=3, width=128, height=32)
    inputs = build_solver_inputs(images[0], images[1:], cams[0], cams[1:],
                                 PARAMS)
    H, W = inputs.ref_img.shape
    x, y = geo.pixel_grid(H, W)
    Hs, Ws = inputs.src_imgs.shape[1:]
    src_depths = jnp.stack(
        [jnp.full((Hs, Ws), plane_z).at[:4].set(0.0)] * 2)
    n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), x.shape + (3,))
    n_cam = geo.normal_world_to_cam(inputs.ref_cam, n)
    planes = geo.plane_from_depth_normal(
        inputs.ref_cam, x, y, jnp.full(x.shape, plane_z * 1.031), n_cam)[None]

    oracle = geom_consistency_cost(inputs.ref_cam, inputs.src_cams,
                                   src_depths, planes, x, y, PARAMS)
    with pltpu.force_tpu_interpret_mode():
        got = geom_consistency_cost_pallas(inputs.ref_cam, inputs.src_cams,
                                           src_depths, planes, PARAMS)
    a, b = np.asarray(got), np.asarray(oracle)
    bad = np.abs(a - b) > 1e-3 + 1e-3 * np.abs(b)
    assert bad.mean() < 0.05, f"{bad.mean():.5f} differ"
    # away from the knife-edge rows both agree exactly on validity
    assert np.array_equal(a[:, 10:, :, :] >= PARAMS.geom_cost_max,
                          b[:, 10:, :, :] >= PARAMS.geom_cost_max)


def test_packed_matches_full():
    """Parity row-packed geom cost must equal packed rows of the full one."""
    from acmmp_tpu.ops import parity

    images, cams, plane_z = textured_plane_scene(
        n_views=3, width=128, height=32, f=151.73, plane_z=5.1703)
    inputs = build_solver_inputs(images[0], images[1:], cams[0], cams[1:],
                                 PARAMS)
    H, W = inputs.ref_img.shape
    x, y = geo.pixel_grid(H, W)
    Hs, Ws = inputs.src_imgs.shape[1:]
    gy = jnp.linspace(0.0, 0.3, Hs)[:, None]
    src_depths = jnp.stack([jnp.full((Hs, Ws), plane_z) + gy,
                            jnp.full((Hs, Ws), plane_z) - gy])
    n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), x.shape + (3,))
    n_cam = geo.normal_world_to_cam(inputs.ref_cam, n)
    planes = geo.plane_from_depth_normal(
        inputs.ref_cam, x, y, jnp.full(x.shape, plane_z * 1.031), n_cam)[None]

    full = geom_consistency_cost(inputs.ref_cam, inputs.src_cams,
                                 src_depths, planes, x, y, PARAMS)
    for par in (0, 1):
        parity_mask = ((x.astype(jnp.int32) + y.astype(jnp.int32)) % 2) == par
        off0 = parity.row_pack_offset(parity_mask)
        planes_p = parity.pack_rows_c(planes, off0)
        want = parity.pack_rows_c(full, off0)

        # oracle path with packed grids
        got_o = geom_consistency_cost(
            inputs.ref_cam, inputs.src_cams, src_depths, planes_p,
            parity.pack_rows(x, off0), parity.pack_rows(y, off0), PARAMS)
        np.testing.assert_allclose(np.asarray(got_o), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)

        # pallas kernel with row_pack_off
        with pltpu.force_tpu_interpret_mode():
            got_k = geom_consistency_cost_pallas(
                inputs.ref_cam, inputs.src_cams, src_depths, planes_p,
                PARAMS, row_pack_off=off0)
        a, b = np.asarray(got_k), np.asarray(want)
        bad = np.abs(a - b) > 1e-3 + 1e-3 * np.abs(b)
        assert bad.mean() < 2e-3, (
            f"parity {par}: {bad.mean():.5f} differ; "
            f"max |d|={np.abs(a - b).max()}")
