"""Pallas warped-ZNCC kernel vs the jnp oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from acmmp_tpu.config import PatchMatchParams
from acmmp_tpu.core import geometry as geo
from acmmp_tpu.engine.inputs import build_solver_inputs
from acmmp_tpu.ops import ncc as ncc_ops
from acmmp_tpu.ops import sampling as samp_ops
from acmmp_tpu.ops.pallas_ncc import multiview_zncc_pallas

from .util import textured_plane_scene

PARAMS = PatchMatchParams()


def _setup(width=128, height=32, n_views=3):
    images, cams, plane_z = textured_plane_scene(
        n_views=n_views, width=width, height=height)
    inputs = build_solver_inputs(images[0], images[1:], cams[0], cams[1:],
                                 PARAMS)
    vg = ncc_ops.make_view_geometry(inputs.ref_cam, inputs.src_cams)
    H, W = inputs.ref_img.shape
    x, y = geo.pixel_grid(H, W)
    return inputs, vg, x, y, plane_z


def _compare(planes, inputs, vg, atol=2e-3, force_bf16=False):
    # in the large-image layout the kernel stores source pixels as bf16;
    # give the oracle the same quantized pixels so the comparison isolates
    # the kernel logic
    src_o = inputs.src_imgs
    if force_bf16:
        src_o = src_o.astype(jnp.bfloat16).astype(jnp.float32)
    oracle = ncc_ops.multiview_zncc(
        inputs.ref_img, src_o, vg, planes, PARAMS)
    with pltpu.force_tpu_interpret_mode():
        got = multiview_zncc_pallas(
            inputs.ref_img, inputs.src_imgs, vg, planes, PARAMS,
            force_bf16=force_bf16)
    a, b = np.asarray(got), np.asarray(oracle)
    assert a.shape == b.shape
    bad = np.abs(a - b) > atol + 1e-3 * np.abs(b)
    assert bad.mean() < 1e-3, (
        f"{bad.mean():.5f} of costs differ; max |d|={np.abs(a - b).max()}")


def test_matches_oracle_smooth_plane():
    inputs, vg, x, y, plane_z = _setup()
    # the true plane: coherent warp fields (the common case)
    n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]),
                         x.shape + (3,))
    n_cam = geo.normal_world_to_cam(inputs.ref_cam, n)
    depth = jnp.full(x.shape, plane_z)
    planes = geo.plane_from_depth_normal(inputs.ref_cam, x, y, depth, n_cam)
    _compare(planes[None], inputs, vg)


def test_matches_oracle_random_planes():
    inputs, vg, x, y, _ = _setup()
    # per-pixel random hypotheses: worst-case scattered warp fields
    k1, k2 = jax.random.split(jax.random.key(3))
    p1 = samp_ops.random_plane(k1, inputs.ref_cam, x, y,
                               inputs.depth_min, inputs.depth_max)
    p2 = samp_ops.random_plane(k2, inputs.ref_cam, x, y,
                               inputs.depth_min, inputs.depth_max)
    _compare(jnp.stack([p1, p2]), inputs, vg)


def test_matches_oracle_bf16_layout():
    """The large-image layout (bf16, one view resident) must match the
    oracle on bf16-quantized pixels."""
    inputs, vg, x, y, plane_z = _setup()
    n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), x.shape + (3,))
    n_cam = geo.normal_world_to_cam(inputs.ref_cam, n)
    planes = geo.plane_from_depth_normal(
        inputs.ref_cam, x, y, jnp.full(x.shape, plane_z), n_cam)
    _compare(planes[None], inputs, vg, force_bf16=True)


def test_one_view_resident_layout(monkeypatch):
    """The one-source-view-at-a-time VMEM layout (large scenes) must match
    the all-resident layout bit-for-bit — forced by shrinking the
    residency budget."""
    from acmmp_tpu.ops import pallas_ncc

    inputs, vg, x, y, plane_z = _setup()
    n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), x.shape + (3,))
    n_cam = geo.normal_world_to_cam(inputs.ref_cam, n)
    planes = geo.plane_from_depth_normal(
        inputs.ref_cam, x, y, jnp.full(x.shape, plane_z), n_cam)[None]
    with pltpu.force_tpu_interpret_mode():
        all_res = multiview_zncc_pallas(
            inputs.ref_img, inputs.src_imgs, vg, planes, PARAMS)
        monkeypatch.setattr(pallas_ncc, "VMEM_RESIDENT_BYTES", 1)
        one_view = multiview_zncc_pallas(
            inputs.ref_img, inputs.src_imgs, vg, planes, PARAMS)
    np.testing.assert_array_equal(np.asarray(all_res), np.asarray(one_view))


def test_single_phase_fallback_matches_two_phase(monkeypatch):
    """Oversized sources drop the two-phase row layout (VMEM gate); the
    single-phase path must produce identical costs — forced by zeroing the
    two-phase budget."""
    from acmmp_tpu.ops import pallas_ncc

    inputs, vg, x, y, _ = _setup()
    k1, k2 = jax.random.split(jax.random.key(11))
    planes = jnp.stack([
        samp_ops.random_plane(k1, inputs.ref_cam, x, y,
                              inputs.depth_min, inputs.depth_max),
        samp_ops.random_plane(k2, inputs.ref_cam, x, y,
                              inputs.depth_min, inputs.depth_max)])
    with pltpu.force_tpu_interpret_mode():
        two = multiview_zncc_pallas(
            inputs.ref_img, inputs.src_imgs, vg, planes, PARAMS)
        monkeypatch.setattr(pallas_ncc, "TWO_PHASE_MAX_BYTES", 0)
        one = multiview_zncc_pallas(
            inputs.ref_img, inputs.src_imgs, vg, planes, PARAMS)
    np.testing.assert_array_equal(np.asarray(two), np.asarray(one))


def test_k_shared_matches_per_k():
    """The K-batched tile-visit variant (k_shared: union scan window,
    shared gathered chunks) must be bitwise-equal to the per-k grid for
    any stack — coherent, random, packed, and with padded view slots."""
    from acmmp_tpu.ops import parity

    inputs, vg, x, y, plane_z = _setup(height=32)
    n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), x.shape + (3,))
    n_cam = geo.normal_world_to_cam(inputs.ref_cam, n)
    p_true = geo.plane_from_depth_normal(
        inputs.ref_cam, x, y, jnp.full(x.shape, plane_z), n_cam)
    p_rand = samp_ops.random_plane(jax.random.key(7), inputs.ref_cam, x, y,
                                   inputs.depth_min, inputs.depth_max)
    planes = jnp.stack([p_true, p_rand, p_true])
    pm = ((x.astype(jnp.int32) + y.astype(jnp.int32)) % 2) == 0
    off0 = parity.row_pack_offset(pm)
    planes_pk = parity.pack_rows_c(planes, off0)

    with pltpu.force_tpu_interpret_mode():
        cases = [
            (dict(), dict()),
            (dict(row_pack_off=off0), dict(row_pack_off=off0)),
            (dict(n_views=jnp.int32(1)), dict(n_views=jnp.int32(1))),
        ]
        for kw_base, kw_ks in cases:
            p = planes_pk if "row_pack_off" in kw_base else planes
            base = multiview_zncc_pallas(
                inputs.ref_img, inputs.src_imgs, vg, p, PARAMS, **kw_base)
            ksh = multiview_zncc_pallas(
                inputs.ref_img, inputs.src_imgs, vg, p, PARAMS,
                k_shared=True, **kw_ks)
            np.testing.assert_array_equal(np.asarray(base), np.asarray(ksh))


def test_k_groups_match_single_group():
    """Scan-group sub-stacking (k_groups) only changes visit scheduling:
    any partition must be bitwise-equal to the single-group k_shared scan
    and to the per-k grid — on coherent, random, packed, and
    padded-view-slot stacks."""
    from acmmp_tpu.ops import parity

    inputs, vg, x, y, plane_z = _setup(height=32)
    n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), x.shape + (3,))
    n_cam = geo.normal_world_to_cam(inputs.ref_cam, n)
    p_true = geo.plane_from_depth_normal(
        inputs.ref_cam, x, y, jnp.full(x.shape, plane_z), n_cam)
    ks_ = jax.random.split(jax.random.key(11), 3)
    rand = [samp_ops.random_plane(k, inputs.ref_cam, x, y,
                                  inputs.depth_min, inputs.depth_max)
            for k in ks_]
    planes = jnp.stack([p_true, rand[0], p_true, rand[1]])
    pm = ((x.astype(jnp.int32) + y.astype(jnp.int32)) % 2) == 0
    off0 = parity.row_pack_offset(pm)
    planes_pk = parity.pack_rows_c(planes, off0)

    # interpret mode is slow: the packed case carries the grouping
    # variants (the production layout), the full-grid case pins one
    # permuted partition; single-group == k_shared and the per-k grid are
    # already pinned by test_k_shared_matches_per_k
    with pltpu.force_tpu_interpret_mode():
        base = multiview_zncc_pallas(
            inputs.ref_img, inputs.src_imgs, vg, planes_pk, PARAMS,
            row_pack_off=off0)
        for groups in [((0, 2), (1, 3)), ((0,), (1,), (2,), (3,))]:
            g = multiview_zncc_pallas(
                inputs.ref_img, inputs.src_imgs, vg, planes_pk, PARAMS,
                k_shared=True, k_groups=groups, row_pack_off=off0)
            np.testing.assert_array_equal(np.asarray(base), np.asarray(g))
        base_f = multiview_zncc_pallas(
            inputs.ref_img, inputs.src_imgs, vg, planes, PARAMS)
        g = multiview_zncc_pallas(
            inputs.ref_img, inputs.src_imgs, vg, planes, PARAMS,
            k_shared=True, k_groups=((3, 1), (0, 2)))
        np.testing.assert_array_equal(np.asarray(base_f), np.asarray(g))


def test_resolve_prop_grouping_auto():
    """"auto" substacks pick "four" at/above the DTU source size and the
    round-4 single-union scan below it; concrete names pass through."""
    from acmmp_tpu.ops import ncc as ncc_ops

    small = (4, 960, 1280)   # [V, Hs, Ws] below the threshold
    big = (8, 1184, 1664)    # padded DTU operating point
    assert ncc_ops.resolve_prop_grouping("auto", small) is None
    assert (ncc_ops.resolve_prop_grouping("auto", big)
            == ncc_ops.PROP_GROUPINGS["four"])
    assert ncc_ops.resolve_prop_grouping("none", big) is None
    assert (ncc_ops.resolve_prop_grouping("nearfar", small)
            == ncc_ops.PROP_GROUPINGS["nearfar"])


def test_packed_matches_full():
    """Parity row-packed evaluation (kernel + oracle) must equal the packed
    rows of the full-grid result."""
    from acmmp_tpu.ops import parity

    inputs, vg, x, y, _ = _setup(height=32)
    k1, k2 = jax.random.split(jax.random.key(5))
    p1 = samp_ops.random_plane(k1, inputs.ref_cam, x, y,
                               inputs.depth_min, inputs.depth_max)
    p2 = samp_ops.random_plane(k2, inputs.ref_cam, x, y,
                               inputs.depth_min, inputs.depth_max)
    planes = jnp.stack([p1, p2])
    for par in (0, 1):
        parity_mask = ((x.astype(jnp.int32) + y.astype(jnp.int32)) % 2) == par
        off0 = parity.row_pack_offset(parity_mask)
        planes_p = parity.pack_rows_c(planes, off0)

        # oracle packed == pack(oracle full)
        full = ncc_ops.multiview_zncc(inputs.ref_img, inputs.src_imgs, vg,
                                      planes, PARAMS)
        want = parity.pack_rows_c(full, off0)
        got_oracle = ncc_ops.multiview_zncc_packed(
            inputs.ref_img, inputs.src_imgs, vg, planes_p, PARAMS, off0)
        np.testing.assert_allclose(np.asarray(got_oracle), np.asarray(want),
                                   atol=1e-5, rtol=1e-4)

        # pallas packed == pack(oracle full)
        with pltpu.force_tpu_interpret_mode():
            got_k = multiview_zncc_pallas(
                inputs.ref_img, inputs.src_imgs, vg, planes_p, PARAMS,
                row_pack_off=off0)
        a, b = np.asarray(got_k), np.asarray(want)
        bad = np.abs(a - b) > 2e-3 + 1e-3 * np.abs(b)
        assert bad.mean() < 1e-3, (
            f"parity {par}: {bad.mean():.5f} differ; "
            f"max |d|={np.abs(a - b).max()}")
