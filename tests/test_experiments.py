"""Experiment-harness components: camera selection, prior bootstrapping,
fixtures, visualization (all CPU, no reconstruction)."""

import os

import numpy as np
import pytest

from acmmp_tpu.eval.dtu import METRIC_NAMES
from acmmp_tpu.eval.stats import MetricTable
from acmmp_tpu.experiments.fixtures import (
    clean_outputs, rewrite_depth_ranges, write_random_priors,
    write_synthetic_dense_folder,
)
from acmmp_tpu.experiments.prior_sampler import (
    normals_from_depth, render_depth_from_points, write_priors_from_points,
)
from acmmp_tpu.experiments.select_cams import (
    ReconParams, calc_pairs, setup_from_source,
)
from acmmp_tpu.io.dense_folder import read_cam_txt, read_pair_txt
from acmmp_tpu.io.priors import load_seed_planes, priors_available

from .util import look_at_camera, textured_plane_scene


def test_calc_pairs_angle_window():
    # four cameras: 0/1 nearly parallel, 2 at ~30deg, 3 at ~90deg
    v = np.array([
        [0.0, 0.0, 1.0],
        [0.02, 0.0, 1.0],
        [0.5, 0.0, 0.87],
        [1.0, 0.0, 0.0],
    ])
    pairs = calc_pairs(v.copy(), ReconParams(minangle=3, maxangle=45),
                       np.random.default_rng(0))
    assert 2 in pairs[0] and 3 not in pairs[0] and 1 not in pairs[0]
    assert 0 in pairs[2] and 1 in pairs[2]


def test_setup_from_source_and_fixture(tmp_path):
    src = write_synthetic_dense_folder(str(tmp_path / "src"), n_views=5)
    dst = setup_from_source([0, 2, 4], src, str(tmp_path / "dst"),
                            ReconParams(minangle=0.01, maxangle=120))
    problems = read_pair_txt(os.path.join(dst, "pair.txt"))
    assert len(problems) == 3
    assert os.path.exists(os.path.join(dst, "cams", "00000002_cam.txt"))
    assert os.path.exists(os.path.join(dst, "images", "00000002.jpg"))
    # every problem's sources are in-range renumbered ids
    for p in problems:
        assert all(0 <= s < 3 for s in p.src_image_ids)


def test_prior_sampler_roundtrip(tmp_path):
    # plane point cloud at z=5 -> rendered prior depth should be ~5 in view
    cam = look_at_camera((0.0, 0.0, 0.0), (0.0, 0.0, 1.0), width=64,
                         height=48, depth_min=2.0, depth_max=10.0)
    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(-2, 2, 20000), rng.uniform(-2, 2, 20000),
                    np.full(20000, 5.0)], axis=1)
    depth = render_depth_from_points(pts, cam, 64, 48, 2.0, 10.0)
    valid = depth > 0
    assert valid.mean() > 0.9
    assert abs(np.median(depth[valid]) - 5.0) < 0.05
    n = normals_from_depth(depth, cam)
    # fronto-parallel plane: camera-frame normal ~ (0,0,-1)
    assert np.median(-n[valid][:, 2]) > 0.9

    dense = str(tmp_path / "scene")
    os.makedirs(os.path.join(dense, "images"))
    write_priors_from_points(dense, pts, [cam])
    planes = load_seed_planes(dense, 0, cam, 48, 64)
    assert planes is not None
    # decoded seed planes reproduce the depth: -w/ n.z ~= 5 at the center ray
    w = planes[24, 32, 3]
    nz = planes[24, 32, 2]
    assert abs(-w / nz - 5.0) < 0.1


def test_fixture_utilities(tmp_path):
    dense = write_synthetic_dense_folder(str(tmp_path / "d"), n_views=3)
    n = write_random_priors(dense)
    assert n == 3 and priors_available(dense, 3)
    rewrite_depth_ranges(dense, 1.5, 9.0)
    cam = read_cam_txt(os.path.join(dense, "cams", "00000000_cam.txt"))
    assert abs(cam.depth_min - 1.5) < 1e-6 and abs(cam.depth_max - 9.0) < 1e-6
    os.makedirs(os.path.join(dense, "ACMMP"))
    open(os.path.join(dense, "model.ply"), "w").close()
    clean_outputs(dense)
    assert not os.path.exists(os.path.join(dense, "ACMMP"))
    assert not os.path.exists(os.path.join(dense, "model.ply"))
    assert os.path.exists(os.path.join(dense, "pair.txt"))
    assert priors_available(dense, 3)


def test_visualize_headless(tmp_path):
    table = MetricTable()
    rng = np.random.default_rng(0)
    for method in ("no_prior", "boost_1"):
        for scan in ("scan1", "scan6"):
            for ncam in (2, 5):
                table.add(method, scan, ncam,
                          {k: float(rng.uniform(0, 1)) for k in METRIC_NAMES})
    from acmmp_tpu.experiments.visualize import (
        plot_depth_map, plot_metric_vs_cams, plot_point_counts,
    )

    p1 = plot_metric_vs_cams(table, "acc_median", str(tmp_path / "m.png"))
    p2 = plot_point_counts(
        {"no_prior": {2: 100.0, 5: 200.0}, "boost_1": {2: 150.0, 5: 220.0}},
        str(tmp_path / "c.png"), baseline_method="no_prior")
    p3 = plot_depth_map(rng.uniform(1, 5, (32, 48)), str(tmp_path / "d.png"),
                        cost=rng.uniform(0, 2, (32, 48)))
    for p in (p1, p2, p3):
        assert os.path.getsize(p) > 1000


@pytest.mark.slow
def test_analyze_scene_five_method_grid(tmp_path):
    """The full reference method grid (dtu_statistics.py:14) from one
    analyze_scene call: no_prior, x2, boost_1, boost_single, full_prior —
    each producing its named PLY, scoreable into one MetricTable."""
    import numpy as np

    from acmmp_tpu.config import (
        FusionParams, PatchMatchParams, PipelineConfig,
    )
    from acmmp_tpu.eval.dtu import dtu_metrics
    from acmmp_tpu.eval.stats import MetricTable
    from acmmp_tpu.experiments.dtu_analysis import analyze_scene
    from acmmp_tpu.io import read_ply
    from acmmp_tpu.utils.synth import textured_plane_scene
    from tests.test_pipeline import write_dense_folder

    images, cams, plane_z = textured_plane_scene(n_views=4, width=64,
                                                 height=48)
    dense = write_dense_folder(tmp_path, images, cams)
    cfg = PipelineConfig(
        patchmatch=PatchMatchParams(patch_size=7),
        fusion=FusionParams(num_consistent_thresh=2),
        pad_h=1, pad_w=1,
    )
    # synthetic "GT": a dense grid on the true plane
    xs, ys = np.meshgrid(np.linspace(-1.5, 1.5, 60),
                         np.linspace(-1.1, 1.1, 45))
    gt = np.stack([xs.ravel(), ys.ravel(),
                   np.full(xs.size, plane_z)], axis=1)
    plys = analyze_scene(dense, cfg, gt_points=gt)
    expected = {"no_prior", "x2", "boost_1", "boost_single", "full_prior"}
    assert expected.issubset(plys.keys()), sorted(plys)
    table = MetricTable()
    for method, ply in plys.items():
        pts, _, _ = read_ply(ply)
        assert len(pts) > 0, method
        table.add(method, "synth", 3, dtu_metrics(pts, gt, dst=0.0))
    assert set(table.methods()) == expected


def test_render_cloud_screenshot(tmp_path):
    """Software point-cloud screenshot (visualise_results equivalent)."""
    import numpy as np

    from acmmp_tpu.experiments.visualize import render_cloud_screenshot
    from acmmp_tpu.io import write_ply

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(2000, 3)).astype(np.float32)
    nrm = np.tile(np.array([[0, 0, -1]], np.float32), (2000, 1))
    col = rng.integers(0, 255, (2000, 3)).astype(np.uint8)
    ply = str(tmp_path / "cloud.ply")
    write_ply(ply, pts, nrm, col)
    out = render_cloud_screenshot(ply, str(tmp_path / "shot.png"),
                                  width=320, height=240)
    from PIL import Image as PILImage

    img = np.asarray(PILImage.open(out).convert("RGB"))
    assert img.shape == (240, 320, 3)
    assert (img != 255).any(), "screenshot is blank"
