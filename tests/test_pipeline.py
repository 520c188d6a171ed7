"""End-to-end: synthetic dense folder -> multi-scale pipeline -> fused PLY."""

import os

import numpy as np
import pytest
from PIL import Image as PILImage

from acmmp_tpu.config import FusionParams, PatchMatchParams, PipelineConfig
from acmmp_tpu.io import read_ply
from acmmp_tpu.io.dense_folder import NumpyCamera, write_cam_txt, write_pair_txt
from acmmp_tpu.pipeline.scheduler import run_pipeline
from tests.util import textured_plane_scene


def write_dense_folder(tmp_path, images, cams, scores=None):
    dense = str(tmp_path / "scene")
    os.makedirs(os.path.join(dense, "images"), exist_ok=True)
    os.makedirs(os.path.join(dense, "cams"), exist_ok=True)
    n = len(images)
    pairs = []
    for i in range(n):
        PILImage.fromarray(np.clip(images[i], 0, 255).astype(np.uint8)).save(
            os.path.join(dense, "images", f"{i:08d}.jpg"), quality=98)
        write_cam_txt(os.path.join(dense, "cams", f"{i:08d}_cam.txt"), cams[i])
        pairs.append((i, [(j, 100.0) for j in range(n) if j != i]))
    write_pair_txt(os.path.join(dense, "pair.txt"), pairs)
    return dense


@pytest.mark.slow
def test_full_pipeline_synthetic(tmp_path):
    images, cams, plane_z = textured_plane_scene(n_views=4, width=64, height=48)
    dense = write_dense_folder(tmp_path, images, cams)
    cfg = PipelineConfig(
        patchmatch=PatchMatchParams(patch_size=7),
        fusion=FusionParams(num_consistent_thresh=2),
        pad_h=1, pad_w=1,
    )
    ply = run_pipeline(dense, cfg)
    assert os.path.exists(ply)
    pts, normals, colors = read_ply(ply)
    # greedy cross-view consumption dedupes aggressively on a tiny image;
    # the exact count is sensitive to the synthetic rig, quality is the
    # real assertion below
    assert len(pts) > 100, len(pts)
    err = np.abs(pts[:, 2] - plane_z)
    assert np.median(err) < 0.1, np.median(err)
    assert (err < 0.5).mean() > 0.9
    # checkpoint files exist in the reference layout
    assert os.path.exists(os.path.join(dense, "ACMMP", "2333_00000000",
                                       "depths_geom.dmb"))
    assert os.path.exists(os.path.join(dense, "ACMMP", "2333_00000000",
                                       "normals.dmb"))


@pytest.mark.slow
def test_full_pipeline_batched_mesh(tmp_path):
    """Batched executor with view sharding over the virtual mesh must match
    the sequential pipeline's quality."""
    import jax

    from acmmp_tpu.parallel import make_view_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device platform")
    images, cams, plane_z = textured_plane_scene(n_views=4, width=64,
                                                 height=48)
    dense = write_dense_folder(tmp_path, images, cams)
    cfg = PipelineConfig(
        patchmatch=PatchMatchParams(patch_size=7),
        fusion=FusionParams(num_consistent_thresh=2),
        pad_h=1, pad_w=1, view_batch=4,
    )
    ply = run_pipeline(dense, cfg, mesh=make_view_mesh())
    pts, normals, colors = read_ply(ply)
    # batched solves are statistically equivalent per view (verified stage
    # by stage) but use a different RNG stream; on a 64x48 scene the greedy
    # fusion consumption amplifies that into large point-count swings (the
    # rel-depth acceptance tolerance sits at the per-pixel error median
    # here, so acceptance flips chaotically with the stream), so assert
    # quality with only a loose count floor
    assert len(pts) > 10, len(pts)
    err = np.abs(pts[:, 2] - plane_z)
    assert np.median(err) < 0.1, np.median(err)
    assert (err < 0.5).mean() > 0.9
