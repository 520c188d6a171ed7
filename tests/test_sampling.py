"""Tile-windowed random depth sampling (`ops/sampling.py random_depth`).

The opt-in `tile_window=f` deviation draws each (8, 128) grid tile's
random depths inside a per-tile random subrange of fraction f
(docs/PERF.md "tile-subrange random depth sampling"; reference draws the
full range per pixel, GenerateRandomPlaneHypothesis ACMMP.cu:235-241).
These tests pin the three properties the deviation is built on:
  * f = 0 is bitwise the reference-semantics draw,
  * every value stays in [depth_min, depth_max] and each (8, 128) tile's
    spread is bounded by f * range (what collapses the Pallas scan
    windows),
  * across fresh keys (fresh sweeps) the per-pixel draws still cover the
    whole range with the documented trapezoidal marginal (mean at the
    range center).
"""

import jax
import jax.numpy as jnp
import numpy as np

from acmmp_tpu.ops import sampling as samp_ops

DMIN, DMAX = 2.0, 10.0


def test_tile_window_zero_is_reference():
    key = jax.random.key(3)
    shape = (24, 260)
    got = samp_ops.random_depth(key, DMIN, DMAX, shape, tile_window=0.0)
    u = jax.random.uniform(key, shape, dtype=jnp.float32)
    want = u * (DMAX - DMIN) + DMIN
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_tile_window_bounds_and_tile_spread():
    f = 0.125
    # deliberately NOT multiples of (8, 128): 3 row-tiles, 3 col-tiles
    # with ragged edges, as packed grids in the engine routinely are.
    shape = (20, 300)
    rng = (DMAX - DMIN)
    for s in range(6):
        d = np.asarray(samp_ops.random_depth(
            jax.random.key(s), DMIN, DMAX, shape, tile_window=f))
        assert d.min() >= DMIN and d.max() <= DMAX
        for i0 in range(0, shape[0], 8):
            for j0 in range(0, shape[1], 128):
                tile = d[i0:i0 + 8, j0:j0 + 128]
                assert tile.max() - tile.min() <= f * rng + 1e-5


def test_tile_window_marginal_covers_range():
    f = 0.125
    shape = (8, 128)
    draws = np.stack([
        np.asarray(samp_ops.random_depth(
            jax.random.key(s), DMIN, DMAX, shape, tile_window=f))
        for s in range(256)
    ])  # (keys, 8, 128): each pixel sees 256 independent sweeps' draws
    per_pixel_min = draws.min(axis=0)
    per_pixel_max = draws.max(axis=0)
    rng = DMAX - DMIN
    # fresh windows each key reach (nearly) both ends for every pixel ...
    assert per_pixel_min.max() < DMIN + 0.15 * rng
    assert per_pixel_max.min() > DMAX - 0.15 * rng
    # ... and the trapezoidal marginal is centered on the range middle.
    assert abs(draws.mean() - (DMIN + DMAX) / 2.0) < 0.05 * rng


def _plane_cam(width=128, height=16):
    from acmmp_tpu.utils.synth import textured_plane_scene
    _, cams, _ = textured_plane_scene(n_views=2, width=width, height=height)
    return cams[0].to_jax()


def test_min_cos_zero_is_reference_stream():
    # min_cos=0 must take the reference-law code path BITWISE (same
    # Marsaglia draw + face_camera flip as before the cap existed).
    from acmmp_tpu.core import geometry as geo
    cam = _plane_cam()
    x, y = geo.pixel_grid(16, 128)
    key = jax.random.key(5)
    a = samp_ops.random_unit_normal(key, cam, x, y, 5.0)
    b = samp_ops.random_unit_normal(key, cam, x, y, 5.0, min_cos=0.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_min_cos_cap_bounds_obliquity():
    from acmmp_tpu.core import geometry as geo
    cam = _plane_cam()
    x, y = geo.pixel_grid(16, 128)
    c = 0.3
    dots = []
    for s in range(8):
        n = samp_ops.random_unit_normal(jax.random.key(s), cam, x, y, 5.0,
                                        min_cos=c)
        n = np.asarray(n)
        # unit normals ...
        np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0,
                                   atol=1e-5)
        vd = np.asarray(geo.view_direction(cam, x, y, 5.0))
        dots.append(-(n * vd).sum(-1))      # = dot(n, -view_dir)
    d = np.stack(dots)
    # ... everywhere inside the cap ...
    assert d.min() >= c - 1e-5
    # ... and actually spread over it (not collapsed to fronto-parallel)
    assert d.min() < c + 0.1 and d.max() > 0.97


def test_tile_window_flows_through_random_plane():
    # random_plane(tile_window=f) must put the windowed depths into the
    # planes it builds: recover per-pixel depth from the plane and check
    # the same tile-spread bound as the raw draw.
    from acmmp_tpu.core import geometry as geo
    from acmmp_tpu.utils.synth import textured_plane_scene

    _, cams, _ = textured_plane_scene(n_views=2, width=128, height=16)
    cam = cams[0].to_jax()
    x, y = geo.pixel_grid(16, 128)
    f = 0.25
    planes = samp_ops.random_plane(jax.random.key(7), cam, x, y,
                                   DMIN, DMAX, tile_window=f)
    depth = np.asarray(geo.depth_from_plane(cam, planes, x, y))
    rng = DMAX - DMIN
    assert depth.min() >= DMIN - 1e-3 and depth.max() <= DMAX + 1e-3
    for i0 in range(0, 16, 8):
        tile = depth[i0:i0 + 8, :]
        assert tile.max() - tile.min() <= f * rng + 1e-3
