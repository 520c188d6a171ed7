"""Tile-sharded (halo-exchange) PatchMatch on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acmmp_tpu.config import PatchMatchParams
from acmmp_tpu.engine.inputs import build_solver_inputs
from acmmp_tpu.engine.patchmatch import Mode, run_patchmatch
from acmmp_tpu.parallel.tiles import make_tile_mesh, tile_sharded_patchmatch

from .util import textured_plane_scene

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multi-device platform")

PARAMS = PatchMatchParams(patch_size=7, max_iterations=1)


def test_tile_sharded_recovers_plane():
    n_dev = len(jax.devices())
    # H divisible by 8 * n_dev, and >= 24 rows (the halo) per shard
    H = max(24 * n_dev, 8 * n_dev * 2)
    H = ((H + 8 * n_dev - 1) // (8 * n_dev)) * (8 * n_dev)
    images, cams, plane_z = textured_plane_scene(
        n_views=4, width=128, height=H)
    inputs = build_solver_inputs(images[0], images[1:], cams[0], cams[1:],
                                 PARAMS, pad_h=8, pad_w=128)
    mesh = make_tile_mesh()
    out = tile_sharded_patchmatch(mesh, inputs, jax.random.key(0), PARAMS,
                                  Mode())
    depth = np.asarray(out.depth)[:H, :128]

    # the un-sharded solve as the quality yardstick
    ref = jax.jit(run_patchmatch, static_argnames=("params", "mode"))(
        inputs, jax.random.key(0), params=PARAMS, mode=Mode())
    ref_depth = np.asarray(ref.depth)[:H, :128]

    interior = np.s_[6:H - 6, 12:116]
    err = np.abs(depth[interior] - plane_z)
    ref_err = np.abs(ref_depth[interior] - plane_z)
    assert np.median(err) < 0.15, np.median(err)
    assert np.median(err) < max(2.0 * np.median(ref_err), 0.1)
    assert (err < 0.5).mean() > 0.8, (err < 0.5).mean()
    # shard boundaries must not show seams: rows around each boundary stay
    # as accurate as the interior at large (init taps are halo-extended, so
    # the seam rows see the same data an unsharded solve would)
    rows = H // n_dev
    for b in range(1, n_dev):
        band = np.abs(depth[b * rows - 3:b * rows + 3, 12:116] - plane_z)
        # 2x the interior median (the shards fold their index into the RNG
        # stream, so seam pixels sample different candidates than an
        # unsharded run; with halo-extended init taps the remaining gap is
        # convergence noise, not missing data — was 0.3 flat pre-fix)
        assert np.median(band) < max(2.0 * np.median(err), 0.1), (
            b, np.median(band), np.median(err))
