"""Bilateral ZNCC cost op against a scalar numpy oracle and photometric
ground truth on the synthetic plane scene."""

import math

import numpy as np
import jax.numpy as jnp

from acmmp_tpu.config import PatchMatchParams
from acmmp_tpu.core import geometry as geo
from acmmp_tpu.engine.inputs import build_solver_inputs
from acmmp_tpu.ops import ncc as ncc_ops
from tests.util import textured_plane_scene

PARAMS = PatchMatchParams()


def _oracle_bilateral_ncc(ref, src, H, px, py, params, src_w, src_h):
    """Direct scalar transliteration of ComputeBilateralNCC semantics."""
    def bilinear(img, x, y, w, h):
        x = min(max(x, 0.0), w - 1.0)
        y = min(max(y, 0.0), h - 1.0)
        x0, y0 = int(np.floor(x)), int(np.floor(y))
        x1, y1 = min(x0 + 1, w - 1), min(y0 + 1, h - 1)
        fx, fy = x - x0, y - y0
        return (img[y0, x0] * (1 - fx) * (1 - fy) + img[y0, x1] * fx * (1 - fy)
                + img[y1, x0] * (1 - fx) * fy + img[y1, x1] * fx * fy)

    def warp(x, y):
        v = H @ np.array([x, y, 1.0])
        return v[0] / v[2], v[1] / v[2]

    cx, cy = warp(px, py)
    if not (0 <= cx < src_w and 0 <= cy < src_h):
        return params.cost_max
    center = ref[py, px]
    sums = np.zeros(6)
    r = params.patch_radius
    for di in range(-r, r + 1, params.radius_increment):
        for dj in range(-r, r + 1, params.radius_increment):
            rx = min(max(px + di, 0), ref.shape[1] - 1)
            ry = min(max(py + dj, 0), ref.shape[0] - 1)
            rp = ref[ry, rx]
            sx, sy = warp(px + di, py + dj)
            sp = bilinear(src, sx, sy, src_w, src_h)
            sd = math.sqrt(di * di + dj * dj)
            w = math.exp(-sd / (2 * params.sigma_spatial ** 2)
                         - abs(rp - center) / (2 * params.sigma_color ** 2))
            sums += np.array([w * rp, w * rp * rp, w * sp, w * sp * sp,
                              w * rp * sp, w])
    s = sums / sums[5]
    var_r = s[1] - s[0] ** 2
    var_s = s[3] - s[2] ** 2
    if var_r < params.min_var or var_s < params.min_var:
        return params.cost_max
    covar = s[4] - s[0] * s[2]
    return max(0.0, min(params.cost_max, 1.0 - covar / math.sqrt(var_r * var_s)))


def test_zncc_matches_scalar_oracle():
    images, cams, plane_z = textured_plane_scene(n_views=2)
    ref_c, src_c = cams[0].to_jax(), cams[1].to_jax()
    inp = build_solver_inputs(images[0], images[1:], cams[0], cams[1:], PARAMS,
                              pad_h=1, pad_w=1)
    x, y = geo.pixel_grid(*inp.ref_img.shape)
    n = jnp.asarray([0.05, -0.1, -1.0])
    n = n / jnp.linalg.norm(n)
    d0 = 5.3
    planes = geo.plane_from_depth_normal(ref_c, x, y, jnp.float32(d0),
                                         jnp.broadcast_to(n, x.shape + (3,)))
    vg = ncc_ops.make_view_geometry(ref_c, inp.src_cams)
    costs = np.asarray(ncc_ops.multiview_zncc_jit(inp.ref_img, inp.src_imgs, vg,
                                              planes, PARAMS))
    # scalar oracle at a few interior pixels, on the same 8-bit-quantized
    # pixels build_solver_inputs hands the engine (reference u8 contract)
    ref_q = np.rint(np.clip(images[0], 0.0, 255.0))
    src_q = np.rint(np.clip(images[1], 0.0, 255.0))
    for (px, py) in [(20, 15), (32, 24), (44, 30)]:
        plane = np.asarray(planes[py, px])
        A, B, KrT = geo.homography_coeffs(ref_c, src_c)
        H = np.asarray(geo.plane_homography(A, B, KrT, jnp.asarray(plane)))
        oracle = _oracle_bilateral_ncc(
            ref_q, src_q, H, px, py, PARAMS,
            int(cams[1].width), int(cams[1].height))
        assert abs(costs[py, px, 0] - oracle) < 2e-3, (px, py)


def test_true_plane_has_low_cost():
    images, cams, plane_z = textured_plane_scene(n_views=3)
    ref_c = cams[0].to_jax()
    inp = build_solver_inputs(images[0], images[1:], cams[0], cams[1:], PARAMS,
                              pad_h=1, pad_w=1)
    H, W = inp.ref_img.shape
    x, y = geo.pixel_grid(H, W)
    n_true = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (H, W, 3))
    vg = ncc_ops.make_view_geometry(ref_c, inp.src_cams)

    true_planes = geo.plane_from_depth_normal(ref_c, x, y, jnp.float32(plane_z), n_true)
    wrong_planes = geo.plane_from_depth_normal(ref_c, x, y, jnp.float32(plane_z * 1.4), n_true)
    c_true = np.asarray(ncc_ops.multiview_zncc_jit(inp.ref_img, inp.src_imgs, vg,
                                               true_planes, PARAMS))
    c_wrong = np.asarray(ncc_ops.multiview_zncc_jit(inp.ref_img, inp.src_imgs, vg,
                                                wrong_planes, PARAMS))
    interior = np.s_[12:36, 16:48, :]
    assert np.median(c_true[interior]) < 0.05
    assert np.median(c_wrong[interior]) > 5 * np.median(c_true[interior])


def test_initial_cost_and_views_topk():
    # hand-crafted per-view costs: top_k=4 averaging with a padded view
    costs = jnp.asarray(np.array([[[0.1, 0.5, 0.3, 1.9, 0.0]]], np.float32))
    view_mask = jnp.asarray([True, True, True, True, False])
    cost, selected = ncc_ops.initial_cost_and_views(costs, view_mask, PARAMS)
    np.testing.assert_allclose(float(cost[0, 0]), (0.1 + 0.5 + 0.3 + 1.9) / 4,
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(selected[0, 0]),
                                  [True, True, True, True, False])
    # a cost at cost_max is not a valid view
    costs2 = jnp.asarray(np.array([[[0.1, 2.0, 2.0, 2.0, 2.0]]], np.float32))
    cost2, selected2 = ncc_ops.initial_cost_and_views(
        costs2, jnp.ones(5, bool), PARAMS)
    np.testing.assert_allclose(float(cost2[0, 0]), 0.1, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(selected2[0, 0]),
                                  [True, False, False, False, False])
