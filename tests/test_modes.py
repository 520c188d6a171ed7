"""Solver-mode coverage: seeded init end-to-end, the right_far quirk A/B,
and the multi-scale hierarchy path (JBU -> hierarchy init -> acceptance
gate) forced via a small size_bound."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acmmp_tpu.config import FusionParams, PatchMatchParams, PipelineConfig
from acmmp_tpu.core import geometry as geo
from acmmp_tpu.engine.inputs import build_solver_inputs
from acmmp_tpu.engine.patchmatch import Mode, run_patchmatch
from acmmp_tpu.io.dense_folder import NumpyCamera
from acmmp_tpu.io.ply import read_ply
from acmmp_tpu.io.priors import load_seed_planes, write_prior_pngs
from acmmp_tpu.pipeline.scheduler import run_pipeline

from .test_pipeline import write_dense_folder
from .util import textured_plane_scene

PARAMS = PatchMatchParams(patch_size=7, max_iterations=1)


def test_seeded_solve_from_written_priors(tmp_path):
    """Seeded mode (RandomInitialization's params.seeded branch,
    ACMMP.cu:634-639): priors written through the 16-bit PNG contract seed
    the solve; a solve seeded at the TRUE plane must recover it at least as
    well as (and converge tighter than) random init on one iteration."""
    images, cams, plane_z = textured_plane_scene(n_views=4, width=64,
                                                 height=48)
    dense = str(tmp_path)
    os.makedirs(os.path.join(dense, "images"), exist_ok=True)
    cam = cams[0]
    depth = np.full((48, 64), plane_z, np.float32)
    normal = np.zeros((48, 64, 3), np.float32)
    normal[..., 2] = -1.0   # facing the camera
    write_prior_pngs(dense, 0, depth, normal, cam.depth_min, cam.depth_max)
    seed_planes = load_seed_planes(dense, 0, cam, 48, 64)
    assert seed_planes is not None

    inputs = build_solver_inputs(
        images[0], images[1:], cams[0], cams[1:], PARAMS,
        seed_planes=seed_planes, pad_h=1, pad_w=1)
    out = jax.jit(run_patchmatch, static_argnames=("params", "mode"))(
        inputs, jax.random.key(0), params=PARAMS, mode=Mode(seeded=True))
    d = np.asarray(out.depth)[6:42, 8:56]
    err = np.abs(d - plane_z)
    assert np.median(err) < 0.05, np.median(err)

    out_r = jax.jit(run_patchmatch, static_argnames=("params", "mode"))(
        inputs, jax.random.key(0), params=PARAMS, mode=Mode())
    err_r = np.abs(np.asarray(out_r.depth)[6:42, 8:56] - plane_z)
    assert np.median(err) <= np.median(err_r) + 1e-6


def test_right_far_quirk_ab():
    """reproduce_right_far_quirk=True restores the reference's reversed
    comparison (max-cost member of the right-far strip, ACMMP.cu:879,
    DEVIATIONS.md #1); the two settings must both solve and must differ."""
    images, cams, plane_z = textured_plane_scene(n_views=4, width=64,
                                                 height=48)
    outs = {}
    for quirk in (False, True):
        params = dataclasses.replace(PARAMS,
                                     reproduce_right_far_quirk=quirk)
        inputs = build_solver_inputs(images[0], images[1:], cams[0],
                                     cams[1:], params, pad_h=1, pad_w=1)
        out = jax.jit(run_patchmatch, static_argnames=("params", "mode"))(
            inputs, jax.random.key(2), params=params, mode=Mode())
        outs[quirk] = np.asarray(out.depth)
        err = np.abs(outs[quirk][6:42, 8:56] - plane_z)
        # the quirk degrades one of 8 propagation directions; the solve
        # still works
        assert np.median(err) < 0.3, (quirk, np.median(err))
    assert not np.array_equal(outs[False], outs[True]), (
        "quirk flag did not change propagation behavior")


@pytest.mark.slow
def test_multiscale_hierarchy_pipeline(tmp_path):
    """size_bound=32 on a 64x48 scene forces two scales: the coarse pass,
    JBU depth upsampling, the hierarchy init (fused normal/cost upscale)
    and the hierarchy acceptance gate all run (ACMMP.cu:663-689, 1163-1172;
    scheduler JBU step, acmmp_definitions.cpp:405-440)."""
    images, cams, plane_z = textured_plane_scene(n_views=4, width=64,
                                                 height=48)
    dense = write_dense_folder(tmp_path, images, cams)
    cfg = PipelineConfig(
        patchmatch=PatchMatchParams(patch_size=7, size_bound=32),
        fusion=FusionParams(num_consistent_thresh=2),
        pad_h=1, pad_w=1,
    )
    ply = run_pipeline(dense, cfg)
    assert os.path.exists(ply)
    pts, _, _ = read_ply(ply)
    assert len(pts) > 50, len(pts)
    err = np.abs(pts[:, 2] - plane_z)
    assert np.median(err) < 0.1, np.median(err)
    # both scales left their checkpoint trail
    assert os.path.exists(os.path.join(dense, "ACMMP", "2333_00000000",
                                       "depths_geom.dmb"))
