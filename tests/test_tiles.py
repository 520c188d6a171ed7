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


@pytest.mark.slow
def test_pipeline_dispatches_tile_sharding(tmp_path, monkeypatch):
    """Production wiring (VERDICT r2 item 4): run_pipeline(mesh=...) with a
    view above cfg.tile_pixels dispatches EVERY solve (photometric,
    planar-prior second solve, geometric) through
    tile_sharded_patchmatch, and the fused cloud matches the untiled
    pipeline's quality."""
    import os

    from acmmp_tpu.config import FusionParams, PipelineConfig
    from acmmp_tpu.io.ply import read_ply
    from acmmp_tpu.parallel import make_view_mesh, tiles
    from acmmp_tpu.pipeline.scheduler import run_pipeline

    from .test_pipeline import write_dense_folder

    images, cams, plane_z = textured_plane_scene(n_views=4, width=64,
                                                 height=48)
    dense = write_dense_folder(tmp_path, images, cams)
    cfg = PipelineConfig(
        patchmatch=PatchMatchParams(patch_size=7),
        fusion=FusionParams(num_consistent_thresh=2),
        pad_h=1, pad_w=1, geom_iterations=1,
        tile_pixels=1000,            # 64*48 = 3072 > 1000 -> tiled
    )
    # 2-device tile shards: 48 rows -> pad 16 -> 24 rows/shard (= HALO)
    mesh = make_view_mesh(n_devices=2)

    calls = []
    real = tiles.tile_sharded_patchmatch

    def counting(mesh_, inputs, key, params, mode):
        calls.append((inputs.ref_img.shape, mode))
        return real(mesh_, inputs, key, params, mode)

    monkeypatch.setattr(tiles, "tile_sharded_patchmatch", counting)
    ply = run_pipeline(dense, cfg, mesh=mesh)

    # photometric + prior second solves + 1 geometric pass, 4 views each
    modes = [m for _, m in calls]
    assert sum(1 for m in modes if m.planar_prior) >= 1
    assert sum(1 for m in modes if m.geom_consistency) == 4
    assert len(calls) >= 9, len(calls)
    for shape, _ in calls:
        assert shape[0] % 16 == 0, shape   # padded for the 2-device shards

    assert os.path.exists(ply)
    pts, _, _ = read_ply(ply)
    assert len(pts) > 0, "fusion must accept at least the seed points"

    # the untiled pipeline on the same scene as the quality yardstick —
    # compare the per-view geometric depth maps (fusion with ONE geometric
    # iteration accepts too few points on this tiny scene to compare
    # clouds; the depth maps are the solver evidence)
    from acmmp_tpu.io import read_dmb

    cfg_u = PipelineConfig(
        patchmatch=PatchMatchParams(patch_size=7),
        fusion=FusionParams(num_consistent_thresh=2),
        pad_h=1, pad_w=1, geom_iterations=1, tile_pixels=0,
        output_dir="ACMMP_U", fusion_dir="ACMMP_U",
    )
    run_pipeline(dense, cfg_u)
    for v in range(4):
        d_t = read_dmb(os.path.join(
            dense, "ACMMP", f"2333_{v:08d}", "depths_geom.dmb"))
        d_u = read_dmb(os.path.join(
            dense, "ACMMP_U", f"2333_{v:08d}", "depths_geom.dmb"))
        # per-pixel counter-based RNG (ops/pixel_rng.py) + edge-replicated
        # ref halos make the tile-sharded solve reproduce the untiled
        # pipeline's depth maps EXACTLY — every pass, every view
        np.testing.assert_array_equal(d_t, d_u, err_msg=f"view {v}")


def _scene_and_inputs(n_dev, **input_kw):
    H = max(24 * n_dev, 8 * n_dev * 2)
    H = ((H + 8 * n_dev - 1) // (8 * n_dev)) * (8 * n_dev)
    images, cams, plane_z = textured_plane_scene(
        n_views=4, width=128, height=H)
    inputs = build_solver_inputs(images[0], images[1:], cams[0], cams[1:],
                                 PARAMS, pad_h=8, pad_w=128, **input_kw)
    return H, images, cams, plane_z, inputs


def test_tile_sharded_seeded_and_prior_modes():
    """The tile-sharded solve covers the mode-specific row inputs: seeded
    planes keep their (exact) depth through the sweeps, and the
    planar-prior restricted scoring accepts the prior on poor-fit pixels.
    Quality yardstick: the unsharded solve in the same mode."""
    import jax.numpy as jnp

    from acmmp_tpu.core import geometry as geo

    n_dev = len(jax.devices())
    H, images, cams, plane_z, base_inputs = _scene_and_inputs(n_dev)
    mesh = make_tile_mesh()
    Hp, Wp = base_inputs.ref_img.shape
    x, y = geo.pixel_grid(Hp, Wp)
    cam = base_inputs.ref_cam

    # --- seeded: plane hypotheses seeded at the true plane ---
    depth_true = jnp.full((Hp, Wp), plane_z, jnp.float32)
    n_cam = geo.normal_world_to_cam(
        cam, jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (Hp, Wp, 3)))
    seed_planes = geo.plane_from_depth_normal(cam, x, y, depth_true, n_cam)
    inputs = base_inputs._replace(seed_planes=seed_planes)
    out = tile_sharded_patchmatch(mesh, inputs, jax.random.key(0), PARAMS,
                                  Mode(seeded=True))
    err = np.abs(np.asarray(out.depth)[4:H - 4, 8:120] - plane_z)
    assert np.median(err) < 0.05, np.median(err)

    # --- planar-prior second solve: prior planes at the true plane, poor
    # init (wrong constant depth, high cost -> the prior branch fires) ---
    bad_depth = np.full((H, 128), plane_z * 1.5, np.float32)
    bad_normal = np.tile(np.asarray([0.0, 0.0, -1.0], np.float32),
                         (H, 128, 1))
    high_cost = np.full((H, 128), 1.5, np.float32)
    inputs_p = build_solver_inputs(
        images[0], images[1:], cams[0], cams[1:], PARAMS,
        pad_h=8, pad_w=128, init_depth=bad_depth,
        init_normal_world=bad_normal, init_cost=high_cost)
    inputs_p = inputs_p._replace(
        prior_planes=seed_planes, prior_mask=jnp.ones((Hp, Wp), bool))
    outp = tile_sharded_patchmatch(mesh, inputs_p, jax.random.key(1), PARAMS,
                                   Mode(planar_prior=True))
    errp = np.abs(np.asarray(outp.depth)[4:H - 4, 8:120] - plane_z)
    # the prior pulls the bad init back to the true plane
    assert np.median(errp) < 0.15, np.median(errp)


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

    # per-pixel counter-based RNG keyed on GLOBAL coordinates
    # (ops/pixel_rng.py: halo rows draw their owner's values, no per-shard
    # key folding) + edge-replicated ref-image halos (the untiled solver's
    # edge-clamped taps, DEVIATIONS.md #12) make the tile-sharded solve
    # BITWISE equal to the unsharded one — no seam tolerance at all.
    # (Replaces the r3 "2x seam ratio" pin; measured mismatch fraction 0.)
    np.testing.assert_array_equal(depth, ref_depth)
    np.testing.assert_array_equal(np.asarray(out.cost), np.asarray(ref.cost))

    interior = np.s_[6:H - 6, 12:116]
    err = np.abs(depth[interior] - plane_z)
    assert np.median(err) < 0.15, np.median(err)
    assert (err < 0.5).mean() > 0.8, (err < 0.5).mean()


def test_tile_sharded_bitwise_with_windowed_draw():
    """Bitwise tiled==untiled WITH the windowed-depth deviation ACTIVE:
    the per-(16,128) window tiles are keyed on GLOBAL coordinates
    (ops/sampling.py), so a shard whose origin is not a window-tile
    multiple must still agree with the untiled draw — and the
    effective_params gate must resolve identically from the full shape
    in both paths. W=256 pushes the grid to >= rand_window_min_tiles so
    the gate keeps the window ON (the other tests here fall below it)."""
    from acmmp_tpu.engine.patchmatch import effective_params

    n_dev = len(jax.devices())
    H = max(24 * n_dev, 8 * n_dev * 2)
    H = ((H + 8 * n_dev - 1) // (8 * n_dev)) * (8 * n_dev)
    params = PatchMatchParams(patch_size=7, max_iterations=1,
                              rand_depth_tile_window=0.125,
                              rand_window_min_tiles=12)
    assert effective_params(params, H, 256).rand_depth_tile_window > 0, \
        "fixture must keep the window active"
    images, cams, plane_z = textured_plane_scene(
        n_views=3, width=256, height=H)
    inputs = build_solver_inputs(images[0], images[1:], cams[0], cams[1:],
                                 params, pad_h=8, pad_w=128)
    mesh = make_tile_mesh()
    out = tile_sharded_patchmatch(mesh, inputs, jax.random.key(2), params,
                                  Mode())
    ref = jax.jit(run_patchmatch, static_argnames=("params", "mode"))(
        inputs, jax.random.key(2), params=params, mode=Mode())
    np.testing.assert_array_equal(np.asarray(out.depth),
                                  np.asarray(ref.depth))
    np.testing.assert_array_equal(np.asarray(out.cost),
                                  np.asarray(ref.cost))
