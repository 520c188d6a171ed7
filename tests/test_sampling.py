"""Per-pixel counter-based sampling (`ops/sampling.py`, `ops/pixel_rng.py`).

Random draws are pure functions of (key, GLOBAL pixel coordinate, salt):
the same pixel draws the same value in any execution layout (full grid,
parity-packed half grid, tile shard with an origin offset) — the property
the tile-sharded solver's seam-exactness rests on (parallel/tiles.py).

The opt-in `tile_window=f` deviation draws each (16, 128) GLOBAL pixel
tile's random depths inside a per-tile random subrange of fraction f
(docs/PERF.md "tile-subrange random depth sampling"; reference draws the
full range per pixel, GenerateRandomPlaneHypothesis ACMMP.cu:235-241).
These tests pin:
  * layout invariance: a shifted/cropped grid reproduces the full grid's
    values at the same global coordinates,
  * every value stays in [depth_min, depth_max] and each (16, 128) global
    tile's spread is bounded by f * range (what collapses the Pallas scan
    windows),
  * across fresh keys (fresh sweeps) the per-pixel draws still cover the
    whole range with the documented trapezoidal marginal (mean at the
    range center).
"""

import jax
import jax.numpy as jnp
import numpy as np

from acmmp_tpu.core import geometry as geo
from acmmp_tpu.ops import pixel_rng as prng
from acmmp_tpu.ops import sampling as samp_ops

import pytest

pytestmark = pytest.mark.fast

DMIN, DMAX = 2.0, 10.0


def _grids(h, w, y0=0, x0=0):
    x, y = geo.pixel_grid(h, w)
    return x + x0, y + y0


def test_layout_invariance():
    """A tile shard's draws at global rows [r0, r0+rows) equal the full
    grid's draws there — for the depth draw, the window assignment, and
    the sphere normal. (This is why parallel/tiles.py needs no per-shard
    key folding.)"""
    key = jax.random.key(3)
    H, W = 64, 256
    x, y = _grids(H, W)
    full = np.asarray(samp_ops.random_depth(key, DMIN, DMAX, y, x,
                                            tile_window=0.25))
    xs, ys = _grids(16, W, y0=24)          # shard: rows 24..39
    shard = np.asarray(samp_ops.random_depth(key, DMIN, DMAX, ys, xs,
                                             tile_window=0.25))
    np.testing.assert_array_equal(shard, full[24:40])

    nf = np.asarray(prng.sphere_direction(key, y, x, 9))
    ns = np.asarray(prng.sphere_direction(key, ys, xs, 9))
    np.testing.assert_array_equal(ns, nf[24:40])


def test_tile_window_zero_is_uniform_law():
    key = jax.random.key(3)
    x, y = _grids(24, 260)
    got = np.asarray(samp_ops.random_depth(key, DMIN, DMAX, y, x,
                                           tile_window=0.0))
    assert got.min() >= DMIN and got.max() <= DMAX
    # distinct values almost everywhere (no tile structure at f=0)
    assert np.unique(got).size > got.size * 0.99
    assert abs(got.mean() - (DMIN + DMAX) / 2) < 0.1 * (DMAX - DMIN)


def test_tile_window_bounds_and_tile_spread():
    f = 0.125
    # deliberately NOT multiples of (16, 128): ragged edge tiles, and an
    # origin offset that is NOT a window-tile multiple (a mid-tile shard)
    shape = (36, 300)
    rng = (DMAX - DMIN)
    for s in range(6):
        x, y = _grids(*shape, y0=8)
        d = np.asarray(samp_ops.random_depth(
            jax.random.key(s), DMIN, DMAX, y, x, tile_window=f))
        assert d.min() >= DMIN and d.max() <= DMAX
        # global window tiles: rows [0,16), [16,32), ... -> local slices
        for g0 in range(0, 8 + shape[0], 16):
            lo, hi = max(g0 - 8, 0), min(g0 + 16 - 8, shape[0])
            if lo >= hi:
                continue
            for j0 in range(0, shape[1], 128):
                tile = d[lo:hi, j0:j0 + 128]
                assert tile.max() - tile.min() <= f * rng + 1e-5


def test_tile_window_marginal_covers_range():
    f = 0.125
    x, y = _grids(16, 128)
    draws = np.stack([
        np.asarray(samp_ops.random_depth(
            jax.random.key(s), DMIN, DMAX, y, x, tile_window=f))
        for s in range(256)
    ])  # (keys, 16, 128): each pixel sees 256 independent sweeps' draws
    per_pixel_min = draws.min(axis=0)
    per_pixel_max = draws.max(axis=0)
    rng = DMAX - DMIN
    # fresh windows each key reach (nearly) both ends for every pixel ...
    assert per_pixel_min.max() < DMIN + 0.15 * rng
    assert per_pixel_max.min() > DMAX - 0.15 * rng
    # ... and the trapezoidal marginal is centered on the range middle.
    assert abs(draws.mean() - (DMIN + DMAX) / 2.0) < 0.05 * rng


def test_uniform_statistics():
    """The hash generator's uniforms: mean/variance/correlation sanity."""
    key = jax.random.key(11)
    x, y = _grids(128, 256)
    u = np.asarray(prng.uniform(key, y, x, 0))
    assert abs(u.mean() - 0.5) < 0.01
    assert abs(u.var() - 1.0 / 12.0) < 0.005
    # neighbor correlation (row and column direction) ~ 0
    for a, b in ((u[:, :-1], u[:, 1:]), (u[:-1], u[1:])):
        c = np.corrcoef(a.ravel(), b.ravel())[0, 1]
        assert abs(c) < 0.02, c
    # independent salts decorrelate
    u2 = np.asarray(prng.uniform(key, y, x, 1))
    assert abs(np.corrcoef(u.ravel(), u2.ravel())[0, 1]) < 0.02
    # and different keys decorrelate
    u3 = np.asarray(prng.uniform(jax.random.key(12), y, x, 0))
    assert abs(np.corrcoef(u.ravel(), u3.ravel())[0, 1]) < 0.02


def _plane_cam(width=128, height=16):
    from acmmp_tpu.utils.synth import textured_plane_scene
    _, cams, _ = textured_plane_scene(n_views=2, width=width, height=height)
    return cams[0].to_jax()


def test_min_cos_zero_is_reference_stream():
    # min_cos=0 must take the reference-law code path BITWISE (same
    # uniform-sphere draw + face_camera flip as without the cap).
    cam = _plane_cam()
    x, y = geo.pixel_grid(16, 128)
    key = jax.random.key(5)
    a = samp_ops.random_unit_normal(key, cam, x, y, 5.0)
    b = samp_ops.random_unit_normal(key, cam, x, y, 5.0, min_cos=0.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sphere_direction_uniform():
    """Uniform-on-sphere law: each component's mean ~ 0, z ~ U(-1, 1)."""
    key = jax.random.key(2)
    x, y = _grids(128, 256)
    n = np.asarray(prng.sphere_direction(key, y, x, 0))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)
    assert np.abs(n.mean(axis=(0, 1))).max() < 0.01
    z = n[..., 2]
    assert abs(z.var() - 1.0 / 3.0) < 0.01        # Var U(-1,1) = 1/3


def test_min_cos_cap_bounds_obliquity():
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
    # the whole 16-row grid is ONE global window tile
    assert depth.max() - depth.min() <= f * rng + 1e-3


def test_rand_window_gate_small_grids():
    """The windowed-depth default auto-disables below
    rand_window_min_tiles window tiles (tiny grids lack exploration
    diversity — the 96x64 relief fixture regressed with it on), and the
    gate resolves identically at every solver entry from the FULL image
    shape."""
    from acmmp_tpu.config import PatchMatchParams
    from acmmp_tpu.engine.patchmatch import effective_params

    p = PatchMatchParams()
    assert p.rand_depth_tile_window > 0, "defaults ship the window"
    assert effective_params(p, 64, 96).rand_depth_tile_window == 0.0
    assert effective_params(p, 48, 64).rand_depth_tile_window == 0.0
    assert (effective_params(p, 240, 320).rand_depth_tile_window
            == p.rand_depth_tile_window)
    assert (effective_params(p, 1184, 1600).rand_depth_tile_window
            == p.rand_depth_tile_window)
    p0 = PatchMatchParams(rand_depth_tile_window=0.0)
    assert effective_params(p0, 2048, 2048) is p0


def test_legacy_raw_uint32_keys_accepted():
    """The sampling entry points are public package API: a caller passing a
    legacy raw-uint32 PRNGKey array must draw exactly what the typed-key
    caller draws (jax.random.key_data would reject the raw array)."""
    x, y = _grids(16, 128)
    typed = jax.random.key(42)
    legacy = jax.random.PRNGKey(42)
    np.testing.assert_array_equal(
        np.asarray(prng.uniform(typed, y, x, 5)),
        np.asarray(prng.uniform(legacy, y, x, 5)))
    np.testing.assert_array_equal(
        np.asarray(samp_ops.random_depth(typed, DMIN, DMAX, y, x,
                                         tile_window=0.25)),
        np.asarray(samp_ops.random_depth(legacy, DMIN, DMAX, y, x,
                                         tile_window=0.25)))
