"""Geometry invariants against tiny numpy oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from acmmp_tpu.core import geometry as geo
from tests.util import look_at_camera, textured_plane_scene

pytestmark = pytest.mark.fast


@pytest.fixture
def cam():
    return look_at_camera([0.3, -0.2, 0.1], [0.0, 0.0, 5.0]).to_jax()


def test_project_backproject_roundtrip(cam):
    x, y, d = 10.0, 20.0, 4.0
    Xw = geo.world_point(cam, x, y, d)
    uv, depth = geo.project(cam, Xw)
    np.testing.assert_allclose(np.asarray(uv), [x, y], atol=1e-3)
    np.testing.assert_allclose(float(depth), d, atol=1e-4)


def test_camera_center_projects_to_zero_depth(cam):
    C = geo.camera_center(cam)
    x_cam = jnp.einsum("ij,j->i", cam.R, C) + cam.t
    np.testing.assert_allclose(np.asarray(x_cam), 0.0, atol=1e-5)


def test_depth_from_plane_consistency(cam):
    # plane through the point at (x0, y0, d0) with some camera-frame normal
    x0, y0, d0 = 17.0, 9.0, 3.7
    n = jnp.asarray([0.2, -0.1, -0.97])
    n = n / jnp.linalg.norm(n)
    plane = geo.plane_from_depth_normal(cam, x0, y0, d0, n)
    d = geo.depth_from_plane(cam, plane, x0, y0)
    np.testing.assert_allclose(float(d), d0, rtol=1e-4)
    # any other pixel's plane depth backprojects onto the plane
    x1, y1 = 30.0, 5.0
    d1 = geo.depth_from_plane(cam, plane, x1, y1)
    X1 = geo.backproject(cam, x1, y1, d1)
    residual = jnp.sum(plane[:3] * X1) + plane[3]
    assert abs(float(residual)) < 1e-3


def test_homography_matches_projection():
    # two views of a world plane: warping a ref pixel through the
    # plane-induced homography must equal reprojecting the 3D point.
    ref = look_at_camera([0.0, 0.0, 0.0], [0.0, 0.0, 5.0]).to_jax()
    src = look_at_camera([0.8, 0.1, 0.2], [0.1, 0.0, 5.0]).to_jax()
    x0, y0, d0 = 22.0, 14.0, 5.0
    n = jnp.asarray([0.1, 0.2, -0.96])
    n = n / jnp.linalg.norm(n)
    plane = geo.plane_from_depth_normal(ref, x0, y0, d0, n)

    A, B, KrT = geo.homography_coeffs(ref, src)
    H = geo.plane_homography(A, B, KrT, plane)

    for (x, y) in [(x0, y0), (25.0, 10.0), (12.0, 30.0)]:
        d = geo.depth_from_plane(ref, plane, x, y)
        Xw = geo.world_point(ref, x, y, d)
        uv, _ = geo.project(src, Xw)
        hx, hy = geo.apply_homography(H, x, y)
        np.testing.assert_allclose([float(hx), float(hy)], np.asarray(uv), atol=2e-2)


def test_normal_frame_roundtrip(cam):
    n = jnp.asarray([0.3, 0.4, -0.86])
    n_world = geo.normal_cam_to_world(cam, n)
    n_back = geo.normal_world_to_cam(cam, n_world)
    np.testing.assert_allclose(np.asarray(n_back), np.asarray(n), atol=1e-5)


def test_face_camera(cam):
    n = jnp.asarray([0.0, 0.0, 1.0])  # facing away (+z ~ view direction)
    flipped = geo.face_camera(cam, 32.0, 24.0, 2.0, n)
    vd = geo.view_direction(cam, 32.0, 24.0, 2.0)
    assert float(jnp.sum(flipped * vd)) < 0.0


def test_bilinear_sample_matches_numpy():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, size=(9, 11)).astype(np.float32)
    xs = jnp.asarray([0.0, 3.25, 9.9, 10.0, -1.0])
    ys = jnp.asarray([0.0, 2.5, 7.7, 8.0, 100.0])
    out = geo.bilinear_sample(jnp.asarray(img), xs, ys)
    # oracle
    def oracle(x, y):
        x = min(max(x, 0.0), 10.0)
        y = min(max(y, 0.0), 8.0)
        x0, y0 = int(np.floor(x)), int(np.floor(y))
        x1, y1 = min(x0 + 1, 10), min(y0 + 1, 8)
        fx, fy = x - x0, y - y0
        return (img[y0, x0] * (1 - fx) * (1 - fy) + img[y0, x1] * fx * (1 - fy)
                + img[y1, x0] * (1 - fx) * fy + img[y1, x1] * fx * fy)
    expected = [oracle(float(x), float(y)) for x, y in zip(xs, ys)]
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_synthetic_scene_is_multiview_consistent():
    # sanity for the shared fixture: points on the plane must look (nearly)
    # the same from all views — photometric consistency underpins every
    # solver test. Bilinear resampling of a wavy texture carries a few grey
    # levels of error, so assert statistically over an interior pixel grid.
    images, cams, plane_z = textured_plane_scene(n_views=3)
    ref = cams[0].to_jax()
    xs, ys = np.meshgrid(np.arange(12, 52, 4, dtype=np.float32),
                         np.arange(10, 38, 4, dtype=np.float32))
    xs, ys = jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel())
    d = plane_z  # ref camera at z=0 looking down +z
    Xw = geo.world_point(ref, xs, ys, d)
    ref_vals = np.asarray(geo.bilinear_sample(jnp.asarray(images[0]), xs, ys))
    for img, cam in zip(images[1:], cams[1:]):
        uv, depth = geo.project(cam.to_jax(), Xw)
        u, v = np.asarray(uv[..., 0]), np.asarray(uv[..., 1])
        inb = (u >= 1) & (u <= img.shape[1] - 2) & (v >= 1) & (v <= img.shape[0] - 2)
        vals = np.asarray(geo.bilinear_sample(jnp.asarray(img), uv[..., 0], uv[..., 1]))
        err = np.abs(vals - ref_vals)[inb]
        assert inb.sum() > 20
        assert np.median(err) < 3.0
        assert np.percentile(err, 90) < 10.0
