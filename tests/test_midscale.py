"""Mid-scale end-to-end test (VERDICT r2 item 8): 320x240, 3 views, one
scale, reduced iterations — the one pipeline test where the production
padding defaults actually pad (240x320 -> 240x384 with pad_w=128), so the
padded-shape interactions (NCC taps into padded columns, view-mask
gating, output cropping) are covered end-to-end, not just by kernel unit
tests. Budget-aware: a single test, one compile set, slow-marked.
"""

import os
import struct

import numpy as np
import pytest

from acmmp_tpu.config import FusionParams, PatchMatchParams, PipelineConfig
from acmmp_tpu.io import read_dmb, read_ply
from acmmp_tpu.pipeline.scheduler import run_pipeline

from .test_pipeline import write_dense_folder
from .util import textured_plane_scene

W, H = 320, 240


@pytest.mark.slow
def test_midscale_pipeline_padded_shapes(tmp_path):
    images, cams, plane_z = textured_plane_scene(
        n_views=3, width=W, height=H, f=600.0)
    dense = write_dense_folder(tmp_path, images, cams)
    cfg = PipelineConfig(
        patchmatch=PatchMatchParams(max_iterations=1),
        fusion=FusionParams(num_consistent_thresh=1),
        # PRODUCTION padding defaults: W 320 -> 384 (64 padded columns),
        # H 240 stays (multiple of 8) — the point of this test
        pad_h=8, pad_w=128,
        geom_iterations=1, planar_prior=False,
    )
    ply = run_pipeline(dense, cfg)
    assert os.path.exists(ply)

    # ---- surface recovery on the fused cloud ----
    pts, normals, colors = read_ply(ply)
    # 3 views + greedy cross-view consumption dedupe aggressively;
    # quality (below) is the real assertion (measured ~840 points)
    assert len(pts) > 500, len(pts)
    err = np.abs(pts[:, 2] - plane_z)
    assert np.median(err) < 0.1, np.median(err)
    assert (err < 0.5).mean() > 0.9, (err < 0.5).mean()
    # normals face the cameras (world -z) on the fronto-parallel plane
    assert np.median(normals[:, 2]) < -0.8, np.median(normals[:, 2])

    # ---- byte-level .dmb layout at the TRUE image extent ----
    # the reference's container (readDepthDmb/writeDepthDmb,
    # src/ACMMP.cpp:264-380): int32 {type=1, h, w, nb} + float32 data.
    # Outputs must be cropped to the true 240x320 extent, never the
    # padded 240x384 solver shape.
    rdir = os.path.join(dense, "ACMMP", "2333_00000000")
    for name, nb in (("depths.dmb", 1), ("depths_geom.dmb", 1),
                     ("costs.dmb", 1), ("normals.dmb", 3)):
        path = os.path.join(rdir, name)
        with open(path, "rb") as f:
            raw = f.read()
        t, hh, ww, b = struct.unpack("<4i", raw[:16])
        assert (t, hh, ww, b) == (1, H, W, nb), (name, t, hh, ww, b)
        assert len(raw) == 16 + 4 * H * W * nb, (name, len(raw))
        data = np.frombuffer(raw[16:], "<f4")
        assert np.isfinite(data).all(), name

    # ---- per-view depth quality at the padded-solve resolution ----
    for v in range(3):
        d = read_dmb(os.path.join(
            dense, "ACMMP", f"2333_{v:08d}", "depths_geom.dmb"))
        assert d.shape == (H, W)
        interior = d[8:-8, 8:-8]
        assert np.median(np.abs(interior - plane_z)) < 0.1, v
